"""Builder-side full-catalog correctness artifact (VERDICT r2 ask #1).

Runs EVERY registered plan through the same gate the driver uses
(tests/oracle_harness.py: Spark result vs DuckDB oracle at sf0.01 —
row count, sorted column names, order-insensitive value multiset) and
writes ``CORRECTNESS_FULL.json`` in the driver's exact row format::

    {"<plan>": {"rows_match": bool, "schema_match": bool,
                "hash_match": bool, "spark_rows": int,
                "oracle_rows": int, "err": null|str}}

Rows-only plans (no DuckDB-expressible oracle — the 3 sketch plans)
get ``"hash_match": null`` and ``"mode": "rows-only"`` so the weaker
check is visible, mirroring how the driver reports them.

Chunked so a single Spark session never runs longer than a driver
timeout slot::

    python tools/correctness_sweep.py                 # full sweep
    python tools/correctness_sweep.py --chunk 0 --of 3  # first third (merge)
    python tools/correctness_sweep.py plan1 plan2       # named subset (merge)

Chunk/subset runs merge into the existing artifact; the full run
rewrites it from scratch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ARTIFACT = os.path.join(REPO, "CORRECTNESS_FULL.json")


def _called_package_functions(fn, src: str):
    """(name, function, source) for every package-local function the
    given function's body calls, ONE level deep — whether reached via
    module globals or a function-local ``from ..x import y``. The
    transitive walk lives in ``_callee_closure``."""
    import importlib
    import inspect
    import re
    import sys

    pkg = "comperhensive_bigdata_analysis__spark"
    mod = sys.modules.get(fn.__module__)
    candidates: dict[str, object] = {}
    for called in set(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(", src)):
        candidates.setdefault(called, getattr(mod, called, None))
    for rel, names in re.findall(
        r"from\s+(\.[.\w]*)\s+import\s+\(?([\w,\s]+?)\)?\n", src
    ):
        try:
            m = importlib.import_module(rel, package=fn.__module__.rsplit(".", 1)[0])
        except Exception:
            continue
        for n in re.split(r"[,\s]+", names.strip()):
            # overwrite, not setdefault: the call-scan above pre-seeds
            # locally-imported names with None (module global lookup)
            if n and candidates.get(n) is None:
                candidates[n] = getattr(m, n, None)
    out = []
    for n in sorted(candidates):
        t = candidates[n]
        if (
            inspect.isfunction(t)
            and t is not fn
            and getattr(t, "__module__", "").startswith(pkg)
        ):
            try:
                out.append((n, t, inspect.getsource(t)))
            except (OSError, TypeError):
                pass
    return out


def _callee_closure(fn, src: str):
    """(qualified_name, source) for the TRANSITIVE closure of
    package-local functions reachable from the plan body (ADVICE r8:
    the one-level scan shipped pre-change rows as green when a helper
    two-plus calls down changed — live case: exact_substr_scrub_census
    -> exact_substr_scrub -> exact_substr_span_table). Cycle-guarded by
    function identity; sorted by qualified name so the hash is stable
    across walk order."""
    seen_fns = {fn}
    closure: dict[str, str] = {}
    stack = [(fn, src)]
    while stack:
        f, s = stack.pop()
        for _, callee, csrc in _called_package_functions(f, s):
            if callee in seen_fns:
                continue
            seen_fns.add(callee)
            key = f"{callee.__module__}.{callee.__qualname__}"
            closure[key] = csrc
            stack.append((callee, csrc))
    return sorted(closure.items())


def plan_src_hash(name: str, plans) -> str | None:
    """md5 over the plan function's source, the sources of the full
    TRANSITIVE closure of package-local functions it calls (ADVICE r8:
    one level missed helpers two-plus calls down), and its oracle SQL —
    the staleness stamp (review r8): a changed plan whose artifact row
    predates the change is detectable by hash mismatch, so the
    pre-commit sync re-sweeps it instead of shipping pre-change
    evidence as green. Remaining blind spot (documented, not closed):
    module-level CONSTANTS a helper reads aren't hashed unless some
    function's source changed too — constants in this package always
    ride next to the functions that use them, and the full per-round
    sweep remains the backstop."""
    import hashlib
    import inspect

    fn = plans.QUERIES[name]
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    pieces = [src]
    pieces += [s for _, s in _callee_closure(fn, src)]
    pieces.append(plans.ORACLES.get(name) or "")
    return hashlib.md5("".join(pieces).encode()).hexdigest()


def sweep(sf_dir: str, only: list[str] | None) -> dict[str, dict]:
    from comperhensive_bigdata_analysis__spark import plans
    from comperhensive_bigdata_analysis__spark.session import get_spark

    import oracle_harness as oh

    spark = get_spark("correctness-sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = oh.duck_con(sf_dir)
    out: dict[str, dict] = {}
    names = only or list(plans.QUERIES)
    for name in names:
        fn = plans.QUERIES[name]
        sql = plans.ORACLES.get(name)
        try:
            r = oh.compare_plan(spark, con, sf_dir, name, fn, sql)
        except Exception as e:  # keep sweeping; record the failure
            out[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": str(e)[:500],
            }
            print(f"ERROR     {name}: {str(e)[:200]}", flush=True)
            continue
        if r.get("status") == "rows-only":
            row = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": None,
                "mode": "rows-only",
                "spark_rows": r["spark_rows"],
                "oracle_rows": None,
                "err": None,
            }
            # VERDICT r5 ask #8: sketches can't hash-match, but their
            # error envelope is checkable — evaluate the plan's
            # tolerance contract against an EXACT DuckDB computation
            # and stamp the verdict into the artifact.
            from comperhensive_bigdata_analysis__spark.plans.sketch import (
                TOL_CHECKS,
            )

            if name in TOL_CHECKS:
                exact_sql, check = TOL_CHECKS[name]
                try:
                    row["tol_ok"] = bool(
                        check(
                            fn(spark, sf_dir).collect(),
                            con.execute(exact_sql).fetchall(),
                        )
                    )
                except Exception as e:
                    row["tol_ok"] = False
                    row["err"] = f"tol check: {str(e)[:400]}"
            out[name] = row
        else:
            out[name] = {
                "rows_match": r["rows_match"],
                "schema_match": r["cols_match"],
                "hash_match": r["values_match"],
                "spark_rows": r["spark_rows"],
                "oracle_rows": r["duck_rows"],
                "err": None,
            }
        out[name]["src_hash"] = plan_src_hash(name, plans)
        print(f"{r['status']:9s} {name}", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("plans", nargs="*", help="named subset (merged into artifact)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--of", type=int, default=3)
    args = ap.parse_args()

    from comperhensive_bigdata_analysis__spark import plans as _plans

    all_names = list(_plans.QUERIES)
    if args.plans:
        # Validate the whole subset BEFORE spinning up Spark: a typo'd
        # name used to KeyError mid-sweep and lose the partial run
        # (r12 verdict ask #6). Reject up front with close matches.
        unknown = [n for n in args.plans if n not in _plans.QUERIES]
        if unknown:
            import difflib

            for n in unknown:
                close = difflib.get_close_matches(n, all_names, n=3, cutoff=0.5)
                hint = f" — did you mean: {', '.join(close)}?" if close else ""
                print(f"unknown plan {n!r}{hint}", file=sys.stderr)
            sys.exit(2)
        only = args.plans
    elif args.chunk is not None:
        per = -(-len(all_names) // args.of)
        only = all_names[args.chunk * per : (args.chunk + 1) * per]
    else:
        only = None

    result = sweep(args.sf_dir, only)

    merged: dict[str, dict] = {}
    if only is not None and os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            merged = json.load(f)
    merged.update(result)
    # Keep registry order so diffs are stable round-over-round.
    ordered = {n: merged[n] for n in all_names if n in merged}
    with open(ARTIFACT, "w") as f:
        json.dump(ordered, f, indent=2)
        f.write("\n")

    bad = [
        n
        for n, r in ordered.items()
        if r.get("err") or r["rows_match"] is False or r["schema_match"] is False
        or r["hash_match"] is False or r.get("tol_ok") is False
    ]
    print(f"\nartifact: {len(ordered)}/{len(all_names)} rows, {len(bad)} failing")
    for n in bad:
        print(f"  FAIL {n}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
