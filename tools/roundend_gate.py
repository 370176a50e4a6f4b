"""Round-end robustness GATE (VERDICT r12 ask #5).

The r12 degenerate-input and adversarial-values audits started life as
one-off programs; this tool makes them a per-round gate: one command,
run once at the round's final HEAD, that re-executes both sweeps and
emits the exact tally lines BENCH_NOTES records.

What it runs:

1. ``tools/degenerate_audit.py`` — every registered plan against all
   five dirty-production corpus shapes (empty / all-NULL / single-row
   / duplicated-keys / half-NULL mixed), crash-only. Gate: zero
   crashes on every shape.
2. (r13) The full ORACLE-PARITY sweep over those same corpora —
   not just "doesn't crash" but "agrees with DuckDB on the values".
   Gate: empty/null/one/mixed fully green; on dup, every non-OK row
   is one of the pinned PK-uniqueness PRECONDITION rows below.
3. ``tools/torture_corpus.py`` then the full cross-engine oracle sweep
   (``tests/oracle_harness.py``) over the adversarial-values corpus.
   Gate: every non-OK row is one of the DOCUMENTED engine seams below
   — anything else is a NEW silent cross-engine divergence and fails
   the gate (root-cause it like the four the r12 audit found).

Exit 0 prints the three tally lines (paste them into the round's
BENCH_NOTES section verbatim); exit 1 lists what regressed.

Usage: python tools/roundend_gate.py   (~45-55 min: seven full-catalog
       sweeps — crash audit, five value sweeps, torture; env
       SPARK_GRAFT_SF_DIR for the degenerate base corpus, default
       sf0.001 — the torture corpus is always built from sf0.001 by
       its own tool)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The two documented engine seams (characterized in
#: tests/test_engine_seams.py; plans/__init__ docstring) as they
#: manifest on the torture corpus — the ONLY rows allowed to be non-OK
#: there. status is pinned too: a seam that changes its failure MODE
#: (FAIL <-> ERROR) is a behavior change worth a look, not a pass.
#:   - unicode case mapping (JVM full vs DuckDB simple: U+0130,
#:     word-final Σ) -> FAIL on plans that hash/compare lowered text;
#:   - decimal-exact value-domain bound (1e308/Inf overflows the
#:     DECIMAL(38,9) cast in BOTH engines) -> ERROR.
EXPECTED_TORTURE_SEAMS: dict[str, str] = {
    # r13 baseline (see BENCH_NOTES round 13). Seam 1 — Unicode case
    # mapping: plans that group/hash lowered text diverge on U+0130 /
    # word-final Σ (spot-verified: vocab_top_terms diffs on
    # 'i̇stanbul' vs 'istanbul'). FAIL status: both engines compute,
    # values differ on those tokens only.
    "bigram_top_terms": "FAIL",
    "bpe_fertility_census": "FAIL",
    "bpe_pair_counts": "FAIL",
    "doc_chunks": "FAIL",
    "dsir_importance_weights": "FAIL",
    "quality_logit_scores": "FAIL",
    "simhash_docs": "FAIL",
    "tfidf_top_terms": "FAIL",
    "vocab_top_terms": "FAIL",
    # Seam 2 — decimal-exact value-domain bound: 1e308/±Inf inputs
    # overflow the DECIMAL(38-ish) exactness casts; BOTH engines raise
    # (Spark NUMERIC_VALUE_OUT_OF_RANGE / ARITHMETIC_OVERFLOW —
    # sometimes wrapped in STAGE_MATERIALIZATION by AQE — DuckDB
    # Conversion Error; spot-verified on sql_presto_fn_compat and
    # knn rows).
    "ann_recall_matrix": "ERROR",
    "autocorr_lag7_revenue": "ERROR",
    "cohort_ltv": "ERROR",
    "daily_events": "ERROR",
    "daily_value_locf": "ERROR",
    "daily_wide_sums": "ERROR",
    "dow_seasonality": "ERROR",
    "embedding_dim_moments": "ERROR",
    "embedding_near_dup": "ERROR",
    "forecast_mape": "ERROR",
    "ivf_knn": "ERROR",
    "ivf_recall_eval": "ERROR",
    "kmeans_assign": "ERROR",
    "kmeans_update": "ERROR",
    "knn_bruteforce": "ERROR",
    "lag_delta_events": "ERROR",
    "last_touch_attribution": "ERROR",
    "linear_forecast": "ERROR",
    "local_hour_profile": "ERROR",
    "lsh_band_pairs": "ERROR",
    "moving_average_7d": "ERROR",
    "pivot_daily_values": "ERROR",
    "pq_adc_knn": "ERROR",
    "random_projection_knn": "ERROR",
    "rolling_zscore_days": "ERROR",
    "running_user_totals": "ERROR",
    "seasonal_forecast": "ERROR",
    "seasonal_forecast_mape": "ERROR",
    "semantic_dedup_census": "ERROR",
    "semantic_dedup_greedy": "ERROR",
    "semdedup_salt_recall": "ERROR",
    "session_window_stats": "ERROR",
    "sessionize_events": "ERROR",
    "sliding_value_sums_30m": "ERROR",
    "sql_presto_fn_compat": "ERROR",
    "unpivot_daily": "ERROR",
    "weighted_moving_average": "ERROR",
}


#: Degenerate-corpus VALUE-PARITY pin (r13: the degenerate audit grew
#: an oracle-parity tier on top of crash-only). empty/null/one sweep
#: fully green; the dup shape (every row tripled — primary keys
#: violated upstream) has exactly these documented PRECONDITION rows:
#: plans whose CONTRACT requires key uniqueness, where "fixing" the
#: divergence would buy robustness-to-garbage with an extra shuffle or
#: re-aggregation every clean run pays for. Each is a FAIL (both
#: engines compute, on different garbage); anything else — or one of
#: these healing — is a change worth a look.
EXPECTED_DUP_PRECONDITIONS: dict[str, str] = {
    # Partial-aggregate pushdown is 1:1 only under PK uniqueness
    # (re-aggregating would add a shuffle for nothing on clean data):
    "shipping_priority_topk": "FAIL",    # TPC-H Q3 shape
    "large_volume_customers": "FAIL",    # TPC-H Q18 shape
    "sole_blame_suppliers": "FAIL",      # TPC-H Q21 shape
    # rank == row_number requires the ORDER BY to end in a UNIQUE
    # tiebreak key; duplicated o_orderkey creates true peers, and
    # percent_rank/cume_dist disagree with the rank-spine formulas:
    "window_value_functions": "FAIL",
    # pair semantics are KEYED BY doc_id — with duplicated ids,
    # "pair (a,b)" no longer identifies a document pair, and the
    # count-based exact-jaccard arithmetic double-counts sets:
    "minhash_calibration": "FAIL",
    "winnowing_fingerprint_pairs": "FAIL",
    "winnowing_cap_recall": "FAIL",
}

#: "mixed" (r13): every non-key column NULL on a deterministic half
#: of rows — the shape that exercises NULL ORDERING (Spark NULLS
#: FIRST on ASC vs DuckDB NULLS LAST), rank spines, and quantile
#: picks over partially-dark columns. Its first sweep found 9 real
#: divergences plus 1 driver-side crash, all fixed; fully green since.
DEGEN_SHAPES = ("empty", "null", "one", "dup", "mixed")


def run_degenerate_values() -> tuple[list[str], list[str]]:
    """Oracle-parity sweep of every plan over the degenerate corpora
    (built by the crash audit that runs first). Returns
    (per-shape tally strings, problems)."""
    tallies, problems = [], []
    for shape in DEGEN_SHAPES:
        expected = (
            EXPECTED_DUP_PRECONDITIONS if shape == "dup" else {}
        )
        s = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tests", "oracle_harness.py"),
                f"/tmp/cba_degen_{shape}",
            ],
            capture_output=True,
            text=True,
        )
        rows = re.findall(
            r"^(OK|FAIL|ERROR|rows-only)\s+(\S+)", s.stdout, flags=re.M
        )
        if not rows:
            problems.append(f"degenerate value sweep ({shape}) did not run")
            tallies.append(f"{shape}: no rows")
            continue
        non_ok = {n: st for st, n in rows if st in ("FAIL", "ERROR")}
        new = {n: st for n, st in non_ok.items() if expected.get(n) != st}
        healed = sorted(set(expected) - set(non_ok))
        if new:
            problems.append(
                f"NEW degenerate value divergence(s) on {shape} — not a "
                "pinned precondition: "
                + ", ".join(f"{n} ({st})" for n, st in sorted(new.items()))
            )
        if healed:
            problems.append(
                f"pinned {shape} precondition row(s) now pass — prune "
                f"the pin: {', '.join(healed)}"
            )
        tallies.append(
            f"{shape}: {len(rows) - len(non_ok)}/{len(rows)} OK"
            + (
                f" + {len(non_ok)} pinned PK-precondition rows"
                if non_ok and not new
                else (f", {len(non_ok)} non-OK" if non_ok else "")
            )
        )
    return tallies, problems


def run_degenerate() -> tuple[list[str], bool]:
    """Run all shapes; return (per-shape tally strings, ok)."""
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "degenerate_audit.py")],
        capture_output=True,
        text=True,
    )
    tallies = re.findall(
        r"^(?:empty|null|one|dup|mixed): .*$", p.stdout, flags=re.M
    )
    return tallies, p.returncode == 0 and len(tallies) == len(DEGEN_SHAPES)


def run_torture() -> tuple[dict[str, str], int, bool]:
    """Build the torture corpus, sweep it; return (non-OK rows as
    {plan: status}, total rows, build+sweep ran)."""
    b = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "torture_corpus.py")],
        capture_output=True,
        text=True,
    )
    if b.returncode != 0:
        print(b.stdout[-2000:], b.stderr[-2000:], sep="\n", file=sys.stderr)
        return {}, 0, False
    s = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tests", "oracle_harness.py"),
            "/tmp/cba_torture_sf",
        ],
        capture_output=True,
        text=True,
    )
    rows = re.findall(r"^(OK|FAIL|ERROR|rows-only)\s+(\S+)", s.stdout, flags=re.M)
    non_ok = {name: st for st, name in rows if st in ("FAIL", "ERROR")}
    return non_ok, len(rows), bool(rows)


def main() -> None:
    problems: list[str] = []

    tallies, degen_ok = run_degenerate()
    if not degen_ok:
        problems.append(
            "degenerate audit regressed: " + ("; ".join(tallies) or "no tally")
        )

    value_tallies, value_problems = run_degenerate_values()
    problems.extend(value_problems)

    non_ok, total, swept = run_torture()
    if not swept:
        problems.append("torture corpus build/sweep did not run")
    new = {n: s for n, s in non_ok.items() if EXPECTED_TORTURE_SEAMS.get(n) != s}
    healed = sorted(set(EXPECTED_TORTURE_SEAMS) - set(non_ok))
    if new:
        problems.append(
            "NEW torture divergence(s) — not a documented seam: "
            + ", ".join(f"{n} ({s})" for n, s in sorted(new.items()))
        )

    # The two BENCH_NOTES tally lines (r12 format), printed regardless
    # so a failing run still shows where it stands.
    n_fail = sum(1 for s in non_ok.values() if s == "FAIL")
    n_err = len(non_ok) - n_fail
    print(
        "Round-end gate: degenerate audit "
        + "; ".join(t for t in tallies)
        + "."
    )
    print(
        "Degenerate value sweep: " + "; ".join(value_tallies) + "."
    )
    print(
        f"Torture sweep: {total - len(non_ok)}/{total} OK; "
        f"{len(non_ok)} non-OK, "
        + (
            "all matching the pinned documented-seam rows "
            if not new
            else f"{len(new)} NOT matching the seam pin "
        )
        + f"({n_fail} case-mapping FAILs, {n_err} value-domain ERRORs"
        + (f"; healed vs pin: {', '.join(healed)}" if healed else "")
        + ")."
    )

    if healed and not problems:
        # not a failure — but the pin should shrink to match reality
        print(
            f"note: {len(healed)} pinned seam row(s) now pass; prune "
            f"EXPECTED_TORTURE_SEAMS: {', '.join(healed)}",
            file=sys.stderr,
        )
    if problems:
        for p in problems:
            print(f"GATE FAIL: {p}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
