"""Property-based SCD2 invariants: whatever sequence of update batches
arrives, the history table must keep exactly one current row per key,
contiguous validity chains, and immutable closed rows. Spark jobs are
slow per-example, so examples are capped — the deterministic unit tests
in test_merge.py pin the semantics; this hunts ordering/null edge cases.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from comperhensive_bigdata_analysis__spark.operators.merge import scd2_apply

batch = st.dictionaries(
    keys=st.integers(min_value=1, max_value=4),
    values=st.integers(min_value=0, max_value=3),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=st.lists(batch, min_size=1, max_size=3))
def test_scd2_invariants_under_random_batches(spark, batches):
    history = spark.createDataFrame(
        [(1, 99, "t0", None, True)],
        "k int, v int, valid_from string, valid_to string, is_current boolean",
    )
    for i, b in enumerate(batches):
        updates = spark.createDataFrame([Row(k=k, v=v) for k, v in b.items()])
        history = scd2_apply(history, updates, ["k"], ["v"], f"t{i + 1}")
    rows = history.collect()

    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    seen_keys = {1} | {k for b in batches for k in b}
    assert set(by_key) == seen_keys

    for k, versions in by_key.items():
        current = [r for r in versions if r["is_current"]]
        assert len(current) == 1                      # exactly one open row
        assert current[0]["valid_to"] is None
        closed = sorted(
            (r for r in versions if not r["is_current"]), key=lambda r: r["valid_from"]
        )
        for r in closed:
            assert r["valid_to"] is not None          # closed rows are closed
        chain = closed + current
        for a, b2 in zip(chain, chain[1:]):
            assert a["valid_to"] == b2["valid_from"]  # contiguous validity
        # consecutive versions always differ (no spurious churn)
        for a, b2 in zip(chain, chain[1:]):
            assert a["v"] != b2["v"]
