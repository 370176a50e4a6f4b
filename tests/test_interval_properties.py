"""Property-based invariants for interval coalescing: for any interval
set, the merged islands must (1) exactly equal a brute-force Python
merge, (2) be pairwise disjoint and non-touching per key, and (3) cover
the same point-set union. The oracle-checked merge_event_intervals plan
pins the SQL twin; this hunts ordering/adjacency edge cases (zero-length
intervals, exact-touch boundaries, duplicate starts)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from comperhensive_bigdata_analysis__spark.operators.relational import (
    coalesce_intervals,
)

interval = st.tuples(
    st.integers(min_value=1, max_value=3),    # key
    st.integers(min_value=0, max_value=40),   # start
    st.integers(min_value=0, max_value=10),   # length (0 = instant)
)


def _brute_merge(rows):
    by_key = {}
    for k, s, ln in rows:
        by_key.setdefault(k, []).append((s, s + ln))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        merged = [list(ivs[0])]
        for s, e in ivs[1:]:
            if s > merged[-1][1]:
                merged.append([s, e])
            else:
                merged[-1][1] = max(merged[-1][1], e)
        out[k] = [tuple(iv) for iv in merged]
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(interval, min_size=1, max_size=12))
def test_coalesce_intervals_matches_brute_force(spark, rows):
    df = spark.createDataFrame(
        [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(rows)],
        "k int, rid int, s bigint, e bigint",
    )
    got = {}
    for r in coalesce_intervals(df, "k", "s", "e", order_tiebreak="rid").collect():
        got.setdefault(r["k"], []).append((r["island"], r["s"], r["e"]))
    expected = _brute_merge(rows)
    assert set(got) == set(expected)
    for k, islands in got.items():
        islands.sort()
        assert [(s, e) for _, s, e in islands] == expected[k]
        # islands are 1-based, consecutive, in start order
        assert [i for i, _, _ in islands] == list(range(1, len(islands) + 1))
        # pairwise disjoint and non-touching
        for (_, _, e1), (_, s2, _) in zip(islands, islands[1:]):
            assert s2 > e1
