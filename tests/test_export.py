"""Viz-edge adapters: Arrow handoff, client geo join, color bounds."""

from __future__ import annotations

import pandas as pd

from comperhensive_bigdata_analysis__spark import export
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def test_to_pandas_arrow(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    pdf = export.to_pandas(n)
    assert isinstance(pdf, pd.DataFrame)
    assert len(pdf) == n.count()


def test_join_geo_attaches_result_columns(spark, sf_dir):
    from pyspark.sql import functions as F

    n = load_table(spark, sf_dir, "nation")
    result = n.groupBy(F.col("n_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    geo = pd.DataFrame(
        {
            "NAME_1": [r["n_name"] for r in n.select("n_name").collect()],
            "shape_area": range(n.count()),
        }
    )
    joined = export.join_geo(result, geo, "name", "NAME_1")
    assert "n_rows" in joined.columns and "shape_area" in joined.columns
    assert len(joined) == len(geo)
    assert joined["n_rows"].notna().all()


def test_color_scale_bounds(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    mn, mx = export.color_scale_bounds(o, "o_totalprice")
    assert mn <= mx
