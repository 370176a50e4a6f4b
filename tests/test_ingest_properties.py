"""Property-based tests (hypothesis) for the pure-Python ingest
semantics — SURVEY §5.2 item 3: sanitization idempotent, output charset
closed, collapse rule total. Pure functions, no Spark session."""

from __future__ import annotations

import re

from hypothesis import given
from hypothesis import strategies as st

from comperhensive_bigdata_analysis__spark.sources.ingest import (
    sanitize_name,
    table_name_for,
)


@given(st.text(max_size=80))
def test_sanitize_charset_and_idempotence(s):
    out = sanitize_name(s)
    assert re.fullmatch(r"[A-Za-z0-9_]*", out) is not None
    assert "__" not in out
    assert sanitize_name(out) == out  # idempotent (helper_utils.py:27-36)


@given(st.text(min_size=1, max_size=40))
def test_table_name_lowercase_and_stable(stem):
    name = table_name_for(f"/data/{stem}.csv")
    assert name == name.lower()
    assert re.fullmatch(r"[a-z0-9_]*", name) is not None
    # extension stripped regardless of stem content
    assert name == table_name_for(f"other/dir/{stem}.csv")


@given(
    st.lists(
        st.sampled_from(["a b", "a-b", "a_b", "A B", "a.b", "a  b"]),
        min_size=1,
        max_size=6,
    )
)
def test_sanitize_collisions_are_resolved_deterministically(cols):
    # sanitize_columns dedup logic mirrored: same inputs -> same outputs
    from comperhensive_bigdata_analysis__spark.sources.ingest import sanitize_name

    seen: dict[str, int] = {}
    out = []
    for c in cols:
        s = sanitize_name(c)
        if s in seen:
            seen[s] += 1
            s = f"{s}_{seen[s]}"
        seen.setdefault(s, 0)
        out.append(s)
    assert len(set(out)) == len(out)  # no residual collisions
