"""Golden-query suite: every registered plan must hash-match its DuckDB
oracle at smoke scale (sf0.001) — the same gate the driver applies at
sf0.01 (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from comperhensive_bigdata_analysis__spark import plans

from .conftest import SF_SMOKE
from .oracle_harness import compare_plan, duck_con


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_plan_matches_oracle(spark, con, name):
    res = compare_plan(
        spark, con, SF_SMOKE, name, plans.QUERIES[name], plans.ORACLES.get(name)
    )
    assert res["status"] in ("OK", "rows-only"), res


#: Genuinely non-SQL-replayable plans (each must carry its own
#: tolerance test instead):
#: - approx_distinct_users: HyperLogLog++ sketch — engine-specific
#:   estimator, pinned to <=5% relative error in test_sketch_and_bucketing.
#: - approx_percentile_prices: GK/KLL sketch percentiles — pinned to the
#:   exact percentile plan within 1% in test_sketch_and_bucketing.
#: - hll_mergeable_distinct: DataSketches HLL union — engine-specific
#:   binary sketches; pinned to the exact two-stage distinct plan within
#:   5% in test_sketch_and_bucketing.
#: - approx_percentile_calibration: carries the GK sketch AND its exact
#:   leg in one row; rel-err pinned <= 1% in
#:   test_sketch_probe_invariants.
NO_ORACLE_ALLOWED = {
    "approx_distinct_users",
    "approx_percentile_prices",
    "hll_mergeable_distinct",
    "approx_percentile_calibration",
}


def test_every_plan_has_oracle():
    """Plans without oracles get a weaker check — keep the set empty
    unless genuinely non-SQL-expressible (document exceptions above)."""
    missing = set(plans.QUERIES) - set(plans.ORACLES) - NO_ORACLE_ALLOWED
    assert missing == set(), f"plans missing oracles: {missing}"


def test_rows_only_plans_carry_verified_tolerance():
    """VERDICT r5 ask #8: every rows-only plan must (a) register a
    tolerance contract (exact DuckDB SQL + envelope check) in
    plans.sketch.TOL_CHECKS and (b) carry `tol_ok: true` in the
    committed artifact — the sweep evaluated the sketch estimate
    against the EXACT cross-engine computation, so the weaker entries
    hold a checkable bound instead of nothing."""
    import json
    import pathlib

    from comperhensive_bigdata_analysis__spark.plans.sketch import TOL_CHECKS

    assert set(TOL_CHECKS) == NO_ORACLE_ALLOWED
    art = json.loads(
        (pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_FULL.json")
        .read_text()
    )
    for name, row in art.items():
        if row.get("mode") == "rows-only":
            assert name in NO_ORACLE_ALLOWED, name
            assert row.get("tol_ok") is True, (name, row)


def test_tolerance_contracts_hold_at_smoke_scale(spark, con):
    """Run the TOL_CHECKS contracts live at sf0.001 (the committed
    artifact pins sf0.01) so a sketch regression fails in pytest, not
    only at the next sweep."""
    from comperhensive_bigdata_analysis__spark.plans.sketch import TOL_CHECKS

    for name, (exact_sql, check) in TOL_CHECKS.items():
        rows = plans.QUERIES[name](spark, SF_SMOKE).collect()
        exact = con.execute(exact_sql).fetchall()
        assert check(rows, exact), name


def test_entry_contract(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() >= 0
    assert set(ent.oracle_sql()) <= set(ent.queries())


def test_driver_window_spans_families():
    """The driver hashes only the first 50 ``queries()`` entries, so the
    head of the dict must be a cross-family sample (VERDICT r3 ask #2):
    every name real, all 50 oracled (strong check, not rows-only), >= 8
    distinct plan families, and the historically-red plans present."""
    import __spark_entry__ as ent

    q = ent.queries()
    window = list(q)[:50]
    assert window == ent._DRIVER_WINDOW
    assert set(window) <= set(plans.QUERIES)
    assert set(window) <= set(plans.ORACLES), "window must be fully oracled"
    families = {q[n].__module__.rsplit(".", 1)[-1] for n in window}
    assert len(families) >= 8, families
    # r6 rotation contract (VERDICT r5 ask #1): a handful of stable
    # relational anchors, and >= 80% of slots must be first-exposure —
    # plans with no row in any committed CORRECTNESS_r0*.json artifact.
    assert "pricing_summary" in window
    assert "revenue_by_nation" in window
    import glob
    import json as _json
    import pathlib as _pl

    root = _pl.Path(__file__).resolve().parents[1]
    sampled: set[str] = set()
    for f in sorted(glob.glob(str(root / "CORRECTNESS_r0*.json"))):
        sampled |= set(_json.loads(_pl.Path(f).read_text()))
    fresh = [n for n in window if n not in sampled]
    # ratchet: as long as oracled never-driver-sampled plans exist, the
    # window must be packed with them (up to 40 of the 50 slots); once
    # the pool is exhausted the obligation naturally drops to zero.
    eligible = [n for n in plans.ORACLES if n not in sampled]
    need = min(40, len(eligible))
    assert len(fresh) >= need, (
        f"window must carry first-exposure plans while any remain: "
        f"got {len(fresh)}, need >= {need} (pool {len(eligible)})"
    )
    # oracle_sql() must present the same head order so driver-side
    # zip-style iteration stays aligned
    assert list(ent.oracle_sql())[: len(window)] == [
        n for n in window if n in plans.ORACLES
    ]


def test_driver_window_plans_green_in_artifact():
    """No known-red plan may sit in the driver window: every window
    plan must be OK (strong hash match) in the committed full-catalog
    artifact (ADVICE r4 — the previous check verified membership but
    not health, letting hash-red plans ride the window)."""
    import json
    import pathlib

    import __spark_entry__ as ent

    art = json.loads(
        (pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_FULL.json")
        .read_text()
    )

    def green(row):
        return bool(
            row
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            and row.get("err") is None
        )

    bad = {n: art.get(n) for n in ent._DRIVER_WINDOW if not green(art.get(n))}
    assert not bad, f"driver window contains non-green plans: {sorted(bad)}"
