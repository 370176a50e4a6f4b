"""Command-line entry point — the engine's answer to the reference's
``Main_File.py`` driver script (ingest) and notebook connector (query):

    python -m comperhensive_bigdata_analysis__spark list
    python -m comperhensive_bigdata_analysis__spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 10
    python -m comperhensive_bigdata_analysis__spark sql \
        "select count(*) n from orders" --sf-dir /root/testdata/sf0.01
    python -m comperhensive_bigdata_analysis__spark ingest ./csvs \
        --parquet-dir ./tables

``sql`` pre-registers every test-corpus table found in --sf-dir as a
temp view (same names the oracle uses), so ad-hoc SQL works out of the
box.
"""

from __future__ import annotations

import argparse
import sys


def _spark(cpus: str | None):
    from .session import get_spark

    master = f"local[{cpus}]" if cpus else None
    return get_spark("cba-spark-cli", master=master)


def _register_corpus(spark, sf_dir: str) -> None:
    import os

    from .sources.tables import load_table

    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            name = f[: -len(".parquet")]
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="comperhensive_bigdata_analysis__spark")
    ap.add_argument("--cpus", default=None, help="local core count (default env/32)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered plans (o = oracle-checked)")

    p_run = sub.add_parser("run", help="run a registered plan")
    p_run.add_argument("plan")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true", help="print the physical plan")

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the corpus tables")
    p_sql.add_argument("query")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("--limit", type=int, default=20)

    p_ing = sub.add_parser("ingest", help="CSV folder -> parquet tables + registry")
    p_ing.add_argument("folder")
    p_ing.add_argument("--parquet-dir", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "list":
        from . import plans

        for name in sorted(plans.QUERIES):
            mark = "o" if name in plans.ORACLES else " "
            print(f"{mark} {name}")
        return 0

    spark = _spark(args.cpus)
    try:
        if args.cmd == "run":
            from . import plans

            if args.plan not in plans.QUERIES:
                print(f"unknown plan {args.plan!r}; see `list`", file=sys.stderr)
                return 2
            df = plans.QUERIES[args.plan](spark, args.sf_dir)
            if args.explain:
                df.explain("formatted")
            df.show(args.limit, truncate=False)
        elif args.cmd == "sql":
            from .query import Engine

            _register_corpus(spark, args.sf_dir)
            Engine(spark).sql(args.query).show(args.limit, truncate=False)
        elif args.cmd == "ingest":
            from .sources.ingest import ingest_folder

            registry = ingest_folder(
                spark, args.folder, parquet_dir=args.parquet_dir
            )
            for tbl, cols in registry.items():
                print(tbl, cols)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
