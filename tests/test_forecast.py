"""Grouped forecast (applyInPandas) tests: schema stability, agreement
with the closed-form SQL plan, and MAPE on a synthetic linear series
(mirrors the reference's MAPE=0.02 holdout check, SURVEY §5.2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.forecast import grouped_forecast, mape
from comperhensive_bigdata_analysis__spark.plans.analytics import (
    _daily_xy,
    linear_forecast,
)


def _daily_series(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    return xy.select(
        "event_type", F.date_add(epoch, F.col("x")).alias("ds"), "y"
    )


def test_schema_and_row_count(spark, sf_dir):
    out = grouped_forecast(
        _daily_series(spark, sf_dir), "event_type", model="linear", horizon=7
    )
    assert out.schema.simpleString() == (
        "struct<group:string,ds:date,yhat:double,yhat_lower:double,yhat_upper:double>"
    )
    rows = out.collect()
    groups = {r["group"] for r in rows}
    assert len(rows) == 7 * len(groups)
    for r in rows:
        assert r["yhat_lower"] <= r["yhat"] <= r["yhat_upper"]


def test_matches_closed_form_plan(spark, sf_dir):
    """applyInPandas linear tier == the decimal-exact SQL plan tier."""
    udf_rows = {
        (r["group"], str(r["ds"])): r["yhat"]
        for r in grouped_forecast(
            _daily_series(spark, sf_dir), "event_type", model="linear"
        ).collect()
    }
    sql_rows = {
        (r["event_type"], r["day"]): r["yhat"]
        for r in linear_forecast(spark, sf_dir).collect()
    }
    assert set(udf_rows) == set(sql_rows)
    for k in udf_rows:
        assert abs(udf_rows[k] - sql_rows[k]) < 1e-4, k


def test_mape_on_linear_series(spark):
    """A noiseless linear series must forecast with ~zero MAPE."""
    base = dt.date(2024, 1, 1)
    hist = [("g", base + dt.timedelta(days=i), 100.0 + 2.0 * i) for i in range(60)]
    df = spark.createDataFrame(hist, "group string, ds date, y double")
    fc = grouped_forecast(df, "group", model="linear", horizon=10)
    actual = spark.createDataFrame(
        [("g", base + dt.timedelta(days=60 + i), 100.0 + 2.0 * (60 + i)) for i in range(10)],
        "group string, ds date, y double",
    )
    m = mape(actual, fc, ["group", "ds"]).collect()[0]["mape"]
    assert m < 1e-9
