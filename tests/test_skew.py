"""salted_join must be result-identical to the plain join while
spreading a hot key across salt sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.operators.skew import salted_join


def _skewed_fixture(spark):
    # 90% of rows share key 1 — the classic hot-key profile
    rows = [(1 if i % 10 else i, float(i)) for i in range(2000)]
    skewed = spark.createDataFrame(rows, "k long, v double")
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(0, 2000, 10)], "k long, label string"
    )
    return skewed, small


def test_salted_join_matches_plain_inner(spark):
    skewed, small = _skewed_fixture(spark)
    plain = skewed.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    salted = salted_join(skewed, small, "k", salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    assert plain["n"] == salted["n"]
    assert abs(plain["sv"] - salted["sv"]) < 1e-6


def test_salted_join_matches_plain_left(spark):
    skewed, small = _skewed_fixture(spark)
    plain = skewed.join(small, "k", "left")
    salted = salted_join(skewed, small, "k", how="left", salts=4)
    assert salted.count() == plain.count()
    assert salted.filter(F.col("label").isNull()).count() == plain.filter(
        F.col("label").isNull()
    ).count()
    assert sorted(salted.columns) == sorted(plain.columns)
