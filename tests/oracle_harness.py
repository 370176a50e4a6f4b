"""Local replica of the driver's correctness gate.

Runs every plan in the registry through Spark AND its DuckDB oracle at a
given sf dir, then compares row count, sorted column names, and an
order-insensitive stringified value multiset (strict equality — floats
must be bit-identical, which the decimal-exact aggregation contract
guarantees). Usable as a module (tests) or a script for a quick sweep:

    python tests/oracle_harness.py [sf_dir] [plan ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{os.path.join(sf_dir, t)}.parquet"
        # Spark writes a table as a DIRECTORY of part files (the
        # degenerate/torture corpora); the driver testdata is single
        # files. DuckDB needs the glob spelled for the dir case.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize(rows, cols):
    """Sorted-by-name columns, order-insensitive row multiset of strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def compare_plan(spark, con, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols, snorm = normalize(srows, list(sdf.columns))
    if sql is None:
        return {"name": name, "status": "rows-only", "spark_rows": len(srows)}
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = [tuple(r) for r in cur.fetchall()]
    dcols, dnorm = normalize(drows, dcols)
    res = {
        "name": name,
        "spark_rows": len(srows),
        "duck_rows": len(drows),
        "cols_match": scols == dcols,
        "rows_match": len(srows) == len(drows),
        "values_match": snorm == dnorm,
    }
    res["status"] = (
        "OK" if res["cols_match"] and res["rows_match"] and res["values_match"] else "FAIL"
    )
    if res["status"] == "FAIL":
        res["spark_cols"], res["duck_cols"] = scols, dcols
        diff_s = [r for r in snorm if r not in set(dnorm)][:3]
        diff_d = [r for r in dnorm if r not in set(snorm)][:3]
        res["spark_only"], res["duck_only"] = diff_s, diff_d
    return res


def run_all(spark, sf_dir: str, only: list[str] | None = None):
    from comperhensive_bigdata_analysis__spark import plans

    con = duck_con(sf_dir)
    results = []
    for name, fn in plans.QUERIES.items():
        if only and name not in only:
            continue
        try:
            results.append(
                compare_plan(spark, con, sf_dir, name, fn, plans.ORACLES.get(name))
            )
        except Exception as e:  # keep sweeping; report the failure
            results.append({"name": name, "status": "ERROR", "error": str(e)[:500]})
    return results


if __name__ == "__main__":
    from comperhensive_bigdata_analysis__spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark("oracle-harness", master="local[8]", shuffle_partitions=8)
    bad = 0
    for r in run_all(spark, sf, only):
        line = f"{r['status']:9s} {r['name']}"
        if r["status"] == "OK":
            line += f"  rows={r['spark_rows']}"
        elif r["status"] == "rows-only":
            line += f"  rows={r['spark_rows']}"
        else:
            bad += 1
        print(line)
        if r["status"] == "FAIL":
            for k in ("spark_rows", "duck_rows", "cols_match", "spark_cols", "duck_cols",
                      "spark_only", "duck_only"):
                if k in r:
                    print(f"    {k}: {r[k]}")
        if r["status"] == "ERROR":
            print(f"    {r['error']}")
    sys.exit(1 if bad else 0)
