"""The committed CORRECTNESS_FULL.json artifact can't go stale
(VERDICT r2 ask #1): it must cover exactly the current plan registry
and be all-green. Regenerate with::

    python tools/correctness_sweep.py            # or --chunk i --of 3
"""

from __future__ import annotations

import json
import os

from comperhensive_bigdata_analysis__spark import plans

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(_REPO, "CORRECTNESS_FULL.json")


def _rows() -> dict:
    assert os.path.exists(ARTIFACT), "run tools/correctness_sweep.py"
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_covers_every_registered_plan():
    rows = _rows()
    assert set(rows) == set(plans.QUERIES), (
        "artifact drifted from registry; rerun tools/correctness_sweep.py — "
        f"missing={sorted(set(plans.QUERIES) - set(rows))[:5]} "
        f"extra={sorted(set(rows) - set(plans.QUERIES))[:5]}"
    )


def test_artifact_is_all_green():
    bad = {
        n: r
        for n, r in _rows().items()
        if r.get("err")
        or r["rows_match"] is not True
        or r["schema_match"] is not True
        or (r["hash_match"] is not True and r.get("mode") != "rows-only")
    }
    assert not bad, sorted(bad)


def test_rows_only_set_matches_registry():
    rows = _rows()
    artifact_rows_only = {n for n, r in rows.items() if r.get("mode") == "rows-only"}
    registry_rows_only = set(plans.QUERIES) - set(plans.ORACLES)
    assert artifact_rows_only == registry_rows_only


def test_artifact_rows_not_stale():
    """Review r8: every artifact row carries an md5 of the plan's
    source + oracle SQL from when it was swept; a mismatch means the
    committed green row is PRE-CHANGE evidence. The pre-commit hook
    auto-resweeps up to 5 changed plans; this is the hard gate behind
    it (rows without a hash are legacy and exempt until next sweep)."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from correctness_sweep import plan_src_hash

    stale = [
        n
        for n, r in _rows().items()
        if n in plans.QUERIES
        and r.get("src_hash")
        and r["src_hash"] != plan_src_hash(n, plans)
    ]
    assert not stale, (
        f"stale artifact rows (plan changed since sweep): {stale} — "
        "run tools/correctness_sweep.py with these names"
    )


def test_src_hash_closure_is_transitive():
    """ADVICE r8: the one-level callee scan let a helper edit two calls
    down (exact_substr_scrub_census -> exact_substr_scrub ->
    exact_substr_span_table) ship pre-change artifact rows as green —
    the r9 live case. Pin the transitive walk on exactly that chain,
    plus a thin-wrapper plan whose body is one helper call."""
    import inspect
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from correctness_sweep import _callee_closure

    fn = plans.QUERIES["exact_substr_scrub_census"]
    names = {k for k, _ in _callee_closure(fn, inspect.getsource(fn))}
    assert any(k.endswith(".exact_substr_scrub") for k in names), names
    assert any(k.endswith(".exact_substr_span_table") for k in names), (
        "two-level helper missing from the closure"
    )
    wfn = plans.QUERIES["winnowing_fingerprint_pairs"]
    wnames = {k for k, _ in _callee_closure(wfn, inspect.getsource(wfn))}
    assert any(k.endswith(".winnowing_pairs_at") for k in wnames)
    assert any(k.endswith("._winnow_fingerprints") for k in wnames), (
        "helper below the thin wrapper missing from the closure"
    )
