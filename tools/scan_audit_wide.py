"""Wide executed-scan audit: per-table executed scan counts for every
plan whose STATIC scan count is >= MIN_STATIC.

tools/scan_reuse_audit.py executes only the top-12 static counts; the
divergent-filter re-scan disease (a corpus tokenized once per leg
because pushed predicates or per-leg column pruning make the subtrees
non-ReuseExchange-identical) hides below that cutoff — r13 found it at
static 4-8 in bm25_top_docs (4 executed documents scans),
corpus_report_card (3), churn_hazard_table (3) and
seasonal_forecast_mape (3). This tool runs each candidate at sf0.001,
reads the FINAL adaptive plan, attributes every parquet scan to its
source table, and flags plans where a data-scaling table is executed
3+ times.

A flag is a LEAD, not a verdict: multi-pass can be the algorithm
(grouped_exact_median's histogram refinement, zorder's scale->max->
rollup cascade, the ANN recall evals' per-method legs) or a
column-pruning win (integrity_audit's checks each scan different
columns). Adjudicate per plan; fix only where one pass can serve the
legs without changing values (r13 verdicts: OPTIMIZATION_r13.md).

Caveat: a plan that lazily persists an intermediate (cache.py) renders
the cached relation's own scan once per InMemoryTableScan reference in
the explain text, so its count OVERSTATES executed work — check for
InMemoryTableScan before believing a flagged count.

Run: python tools/scan_audit_wide.py   (~5 min at sf0.001)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
MIN_STATIC = 4
SCALING = {
    "lineitem",
    "orders",
    "customer",
    "documents",
    "events",
    "embeddings",
    "part",
}


def main() -> None:
    from comperhensive_bigdata_analysis__spark import plans
    from comperhensive_bigdata_analysis__spark.cache import release_plan_caches
    from comperhensive_bigdata_analysis__spark.session import get_spark

    spark = get_spark(
        "scan-audit-wide", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    candidates = []
    for name, fn in plans.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain()
            if buf.getvalue().count("Scan parquet") >= MIN_STATIC:
                candidates.append(name)
        except Exception as ex:  # pragma: no cover - audit robustness
            print(f"{name:34s} SKIPPED ({type(ex).__name__})")
        finally:
            # always release: a failing plan must not leak its
            # registered caches into later iterations (ADVICE r13)
            release_plan_caches()

    n_flags = 0
    for name in sorted(candidates):
        try:
            df = plans.QUERIES[name](spark, SF_DIR)
            df.collect()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain()
            final = buf.getvalue().split("+- == Initial Plan ==")[0]
            per: dict[str, int] = {}
            for t in re.findall(r"/(\w+)\.parquet", final):
                per[t] = per.get(t, 0) + 1
            cached = final.count("InMemoryTableScan")
            hot = {t: c for t, c in per.items() if t in SCALING and c >= 3}
            flag = "  <<< FLAG" if hot and not cached else ""
            if flag:
                n_flags += 1
            note = f" (cached x{cached})" if cached else ""
            print(f"{name:34s} executed={sum(per.values()):2d} per={per}{note}{flag}")
        except Exception as ex:  # pragma: no cover
            print(f"{name:34s} ERROR {type(ex).__name__}")
        release_plan_caches()
    print(f"\n{len(candidates)} candidates, {n_flags} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
