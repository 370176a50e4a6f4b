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
    """The driver hashes only the first 50 ``queries()`` entries. Since
    round 7 the window is GENERATED from the committed driver artifacts
    (VERDICT r6 ask #2: the r6 hard-coded list went red the moment the
    driver wrote its artifact), so this test pins the generator's
    properties rather than a literal list — it stays green both with
    and without a freshly-written CORRECTNESS_r0N.json in the tree,
    because window and expectation recompute from the same disk state."""
    import pathlib as _pl

    import __spark_entry__ as ent

    q = ent.queries()
    window = list(q)[:50]
    assert window == ent._DRIVER_WINDOW == ent._compute_window()
    assert len(window) == 50
    assert len(set(window)) == 50, "window must not repeat plans"
    assert set(window) <= set(plans.QUERIES)
    # Since r9 the window may carry the documented rows-only sketch
    # plans (VERDICT r8 ask #1: they are eligible so the driver's
    # weaker rows-count check gives them external evidence too) — but
    # nothing else may ride without an oracle.
    assert set(window) - set(plans.ORACLES) <= NO_ORACLE_ALLOWED, (
        "only the documented rows-only plans may sit unoracled in the window"
    )
    families = {q[n].__module__.rsplit(".", 1)[-1] for n in window}
    assert len(families) >= 8, families
    # stable relational anchors always present
    for anchor in ent._ANCHORS:
        assert anchor in window, anchor
    # first-exposure ratchet, evaluated against the SAME artifact set
    # the generator read: every oracled plan with no driver row must be
    # in the window (up to the slots left after anchors). When the pool
    # exceeds the slots, the lexicographically-first ones are taken;
    # when it is empty, slots go to the stalest-evidence plans instead.
    root = _pl.Path(__file__).resolve().parents[1]
    last_seen = ent._artifact_rounds(root)
    pool = sorted(n for n in plans.QUERIES if n not in last_seen)
    expect_fresh = min(len(pool), 50 - len(ent._ANCHORS))
    fresh = [n for n in window if n not in last_seen]
    assert len(fresh) >= expect_fresh, (
        f"window must pack first-exposure plans: got {len(fresh)}, "
        f"need >= {expect_fresh} (pool {len(pool)})"
    )
    # oracle_sql() must present the same head order so driver-side
    # zip-style iteration stays aligned (rows-only window plans have no
    # oracle entry, so compare against the oracled slice of the window)
    window_oracled = [n for n in window if n in plans.ORACLES]
    assert list(ent.oracle_sql())[: len(window_oracled)] == window_oracled


def test_driver_window_rotation_survives_new_artifact(tmp_path):
    """Simulate the driver landing its round artifact: copy the repo's
    artifacts plus a synthetic CORRECTNESS_r99.json covering the whole
    current window, and check the generator (a) still yields a full
    50-slot oracled window and (b) rotates — the newly-covered plans
    lose their first-exposure status and the stalest plans cycle in.
    This is the regression test for the r6 failure mode."""
    import json
    import pathlib
    import shutil

    import __spark_entry__ as ent

    root = pathlib.Path(__file__).resolve().parents[1]
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        shutil.copy(f, tmp_path / f.name)
    fake = {n: {"hash_match": True} for n in ent._DRIVER_WINDOW}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fake))
    # a malformed (top-level list) artifact must be skipped, not crash
    # the entrypoint import (ADVICE r7)
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps([{"q": 1}]))

    last_seen = ent._artifact_rounds(tmp_path)
    assert set(ent._DRIVER_WINDOW) <= set(last_seen)
    # re-run the ACTUAL generator against the augmented artifact dir
    # (ADVICE r7: no re-inlined copy that can drift from the generator)
    window = ent._compute_window(root=tmp_path)
    assert len(window) == 50
    assert set(window) <= set(plans.QUERIES)
    # rotation happened: the synthetic artifact covered the whole old
    # window, so the fresh-first slots must now hold DIFFERENT plans
    # whenever any registered plan is still first-exposure.
    still_fresh = sorted(n for n in plans.QUERIES if n not in last_seen)
    if still_fresh:
        assert any(n in window for n in still_fresh)


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
        if not row or row.get("err") is not None:
            return False
        if row.get("mode") == "rows-only":
            # documented sketch plans: health = the verified tolerance
            # contract, not a hash (they are hash-unmatchable by nature)
            return bool(row.get("tol_ok"))
        return bool(
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )

    bad = {n: art.get(n) for n in ent._DRIVER_WINDOW if not green(art.get(n))}
    assert not bad, f"driver window contains non-green plans: {sorted(bad)}"
