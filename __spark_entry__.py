"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real code lives in the ``comperhensive_bigdata_analysis__spark``
package; this module only adapts its plan registry to the driver's
calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from comperhensive_bigdata_analysis__spark import plans as _plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    return _plans.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2)."""
    return dict(_plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per plan (omitted => rows-only check)."""
    return dict(_plans.ORACLES)
