"""Largest-remainder proration: the conservation invariant the rollup
plan can't show — per ORDER, allocated cents equal the order's cents
exactly, and every allocation is within 1 cent of the real-valued
proportional share."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def _allocations(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").cast("bigint").alias("qty"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    j = li.join(o, "l_orderkey").withColumn("sum_qty", F.sum("qty").over(wo))
    j = (
        j.withColumn("base", F.expr("(cents * qty) div sum_qty"))
        .withColumn("rem", (F.col("cents") * F.col("qty")) % F.col("sum_qty"))
        .withColumn(
            "rk",
            F.row_number().over(wo.orderBy(F.col("rem").desc(), "l_linenumber")),
        )
        .withColumn("leftover", F.col("cents") - F.sum("base").over(wo))
        .withColumn(
            "alloc",
            F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0),
        )
    )
    return j


def test_proration_conserves_every_order(spark, sf_dir):
    j = _allocations(spark, sf_dir)
    bad = (
        j.groupBy("l_orderkey", "cents")
        .agg(F.sum("alloc").alias("total_alloc"))
        .filter(F.col("total_alloc") != F.col("cents"))
        .count()
    )
    assert bad == 0


def test_proration_within_one_cent_of_proportional(spark, sf_dir):
    j = _allocations(spark, sf_dir).withColumn(
        "ideal", F.col("cents") * F.col("qty") / F.col("sum_qty")
    )
    off = j.filter(F.abs(F.col("alloc") - F.col("ideal")) >= 1.0).count()
    assert off == 0
