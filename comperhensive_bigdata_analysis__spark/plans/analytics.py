"""Time-series analytics plans — the reference's distinctive capability
(SURVEY §2.9 M1-M5: sequential split, fit, predict, future frame, MAPE)
re-expressed with a deterministic closed-form linear-trend model so the
DuckDB oracle can replay it exactly. The Prophet-style grouped-map UDF
tier lives in forecast.py (same architecture, applyInPandas).

Determinism: all aggregates are decimal-exact; the regression algebra
then runs in scalar double on identical operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from . import plan

DEC = "decimal(18,6)"

# Shared daily-rollup SQL (events -> one row per event_type x day).
_DAILY_CTE = """
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    xy AS (
      SELECT event_type, (day - DATE '1970-01-01') AS x, y FROM daily
    )
"""

_REG_AGG = """
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(x * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             MAX(x) AS xmax
      FROM xy {where} GROUP BY event_type
"""


def _daily_xy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("y"))
    )
    return daily.select(
        "event_type",
        F.datediff("day", F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )


def _reg_agg(xy):
    """Decimal-exact regression sufficient statistics, cast to double."""
    return xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y").cast(DEC)).cast("double").alias("sxy"),
        F.max("x").alias("xmax"),
    )


def _slope_intercept(df):
    # try_divide: a series with ONE observed day (n=1, or all x equal)
    # zeroes the OLS denominator — ordinary data for a rare event_type,
    # not an error. DuckDB (the oracle's engine) returns NULL there;
    # ANSI `/` would crash the whole forecast (r12 single-row audit).
    slope = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
    )
    df = df.withColumn("slope", slope)
    return df.withColumn(
        "intercept", (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")
    )


# ---------------------------------------------------------------------------
# Linear-trend forecast: fit per event_type on all days, predict the next
# 7 days (reference M2-M4: fit + make_future_dataframe + predict).
# ---------------------------------------------------------------------------

_FORECAST_ORACLE = f"""
    WITH {_DAILY_CTE},
    r AS ({_REG_AGG.format(where="")}),
    s AS (
      SELECT event_type, xmax,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
      FROM r
    )
    SELECT event_type,
           strftime(DATE '1970-01-01' + INTERVAL (xmax + h) DAY, '%Y-%m-%d') AS day,
           ROUND(intercept + slope * (xmax + h), 6) AS yhat
    FROM s, (SELECT unnest(generate_series(1, 7)) AS h)
    ORDER BY event_type, day
"""


@plan("linear_forecast", _FORECAST_ORACLE)
def linear_forecast(spark, sf_dir):
    fitted = _slope_intercept(_reg_agg(_daily_xy(spark, sf_dir)))
    horizon = fitted.select(
        "event_type",
        "xmax",
        "slope",
        "intercept",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
    )
    return horizon.select(
        "event_type",
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("xmax") + F.col("h")),
            "yyyy-MM-dd",
        ).alias("day"),
        F.round(F.col("intercept") + F.col("slope") * (F.col("xmax") + F.col("h")), 6).alias(
            "yhat"
        ),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Holdout MAPE: sequential time split (reference M1: 83/17 positional ->
# here a fixed cutoff date), fit on train, MAPE on test (reference M5,
# ipynb:1057 — avg(abs((y - yhat)/y))).
# ---------------------------------------------------------------------------

_CUTOFF = "2024-01-24"

_MAPE_ORACLE = f"""
    WITH {_DAILY_CTE},
    r AS ({_REG_AGG.format(where=f"WHERE x < (DATE '{_CUTOFF}' - DATE '1970-01-01')")}),
    s AS (
      SELECT event_type,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
      FROM r
    )
    SELECT xy.event_type,
           COUNT(*) AS n_test,
           ROUND(CAST(SUM(CAST(abs((y - (intercept + slope * x)) / y) AS DECIMAL(18,12)))
                      AS DOUBLE) / COUNT(*), 6) AS mape
    FROM xy JOIN s ON xy.event_type = s.event_type
    WHERE x >= (DATE '{_CUTOFF}' - DATE '1970-01-01')
    GROUP BY xy.event_type
    ORDER BY xy.event_type
"""


@plan("forecast_mape", _MAPE_ORACLE)
def forecast_mape(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    cutoff_x = F.datediff(F.lit(_CUTOFF).cast("date"), F.lit("1970-01-01").cast("date"))
    fitted = _slope_intercept(_reg_agg(xy.filter(F.col("x") < cutoff_x))).select(
        "event_type", "slope", "intercept"
    )
    test = xy.filter(F.col("x") >= cutoff_x)
    ape = F.abs((F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))) / F.col("y"))
    return (
        test.join(F.broadcast(fitted), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(
                F.sum(ape.cast("decimal(18,12)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mape"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition forecast (VERDICT r2 ask #4, SQL-expressible
# tier): trend by the closed-form linear fit above, weekly seasonality
# as the mean residual per day-of-week, forecast = trend + dow offset.
# This is the classic additive decomposition — the structure Prophet
# fits in the reference (ipynb:1048-1054) — in a form both engines can
# replay exactly. The free-form Fourier-ridge tier lives in forecast.py
# (numpy applyInPandas, pytest-verified); THIS plan is its
# driver-checkable sibling.
#
# Determinism: slope/intercept come from decimal-exact sufficient
# statistics (identical doubles both engines); each residual is one
# double expression on identical operands; residuals go through a
# DECIMAL(18,6) cast before the cross-row SUM, the same discipline as
# forecast_mape. dow = (x + 4) % 7 — pure integer (1970-01-01 was a
# Thursday), no engine dayofweek() convention involved.
#
# 100 TB: the daily rollup is the only big shuffle; everything after
# runs on |event_type| x |days| rows, and the per-type model (2 + 7
# numbers) broadcasts back for scoring.
# ---------------------------------------------------------------------------

_SEASONAL_CTES = f"""
    {_DAILY_CTE},
    r AS ({_REG_AGG.format(where="")}),
    s AS (
      SELECT event_type, xmax,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
      FROM r
    ),
    dowoff AS (
      SELECT xy.event_type, (x + 4) % 7 AS dow,
             CAST(SUM(CAST(y - (intercept + slope * x) AS DECIMAL(18,6)))
                  AS DOUBLE) / COUNT(*) AS s_dow
      FROM xy JOIN s ON xy.event_type = s.event_type
      GROUP BY 1, 2
    )
"""

_SEASONAL_FC_ORACLE = f"""
    WITH {_SEASONAL_CTES}
    SELECT s.event_type AS event_type,
           strftime(DATE '1970-01-01' + INTERVAL (xmax + h) DAY, '%Y-%m-%d') AS day,
           ROUND(intercept + slope * (xmax + h) + s_dow, 6) AS yhat
    FROM s, (SELECT unnest(generate_series(1, 14)) AS h)
    JOIN dowoff ON dowoff.event_type = s.event_type
               AND dowoff.dow = (xmax + h + 4) % 7
    ORDER BY s.event_type, day
"""


def _dow_offsets(xy, fitted):
    """Mean residual per (event_type, day-of-week) — the weekly
    seasonal component, decimal-cast before the cross-row sum."""
    resid = xy.join(F.broadcast(fitted), "event_type").select(
        "event_type",
        ((F.col("x") + 4) % 7).alias("dow"),
        (F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")))
        .cast(DEC)
        .alias("res"),
    )
    return resid.groupBy("event_type", "dow").agg(
        (F.sum("res").cast("double") / F.count(F.lit(1))).alias("s_dow")
    )


@plan("seasonal_forecast", _SEASONAL_FC_ORACLE)
def seasonal_forecast(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    fitted = _slope_intercept(_reg_agg(xy))
    offsets = _dow_offsets(xy, fitted.select("event_type", "slope", "intercept"))
    horizon = fitted.select(
        "event_type",
        "xmax",
        "slope",
        "intercept",
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("h"),
    ).withColumn("dow", (F.col("xmax") + F.col("h") + 4) % 7)
    return (
        horizon.join(F.broadcast(offsets), ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"), F.col("xmax") + F.col("h")
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            F.round(
                F.col("intercept")
                + F.col("slope") * (F.col("xmax") + F.col("h"))
                + F.col("s_dow"),
                6,
            ).alias("yhat"),
        )
        .orderBy("event_type", "day")
    )


# Holdout comparison: same cutoff as forecast_mape; fit trend AND dow
# offsets on train only; report both models' MAPE side by side so the
# seasonal tier's improvement is itself driver-verified.

_SEASONAL_MAPE_ORACLE = f"""
    WITH {_DAILY_CTE},
    r AS ({_REG_AGG.format(where=f"WHERE x < (DATE '{_CUTOFF}' - DATE '1970-01-01')")}),
    s AS (
      SELECT event_type,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
      FROM r
    ),
    dowoff AS (
      SELECT xy.event_type, (x + 4) % 7 AS dow,
             CAST(SUM(CAST(y - (intercept + slope * x) AS DECIMAL(18,6)))
                  AS DOUBLE) / COUNT(*) AS s_dow
      FROM xy JOIN s ON xy.event_type = s.event_type
      WHERE x < (DATE '{_CUTOFF}' - DATE '1970-01-01')
      GROUP BY 1, 2
    )
    SELECT xy.event_type,
           COUNT(*) AS n_test,
           ROUND(CAST(SUM(CAST(abs((y - (intercept + slope * x)) / y)
                      AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS mape_linear,
           ROUND(CAST(SUM(CAST(abs((y - (intercept + slope * x + s_dow)) / y)
                      AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS mape_seasonal
    FROM xy
    JOIN s ON xy.event_type = s.event_type
    JOIN dowoff ON dowoff.event_type = xy.event_type AND dowoff.dow = (x + 4) % 7
    WHERE x >= (DATE '{_CUTOFF}' - DATE '1970-01-01')
    GROUP BY xy.event_type
    ORDER BY xy.event_type
"""


@plan("seasonal_forecast_mape", _SEASONAL_MAPE_ORACLE)
def seasonal_forecast_mape(spark, sf_dir):
    from ..cache import register_plan_cache

    # Lazy plan-cache (cache.py lifecycle): the train fit, the
    # day-of-week offsets, and the test scoring all consume the daily
    # (event_type, day) census through different filters/aggregates,
    # so their pruned subtrees are never ReuseExchange-identical and
    # the events corpus was scanned three times (r13 wide scan
    # audit; 3 -> 1 with the cache). Note the benched linear_forecast
    # shares _daily_xy, and Spark's CacheManager substitutes ANY
    # equivalent subtree once this persist is registered — within one
    # session linear_forecast stays an uncached measurement only
    # because of the phase-boundary release_plan_caches() contract
    # (cache.py) and because seasonal_forecast_mape is not in the
    # bench HEADLINE set; registering the cache here rather than
    # inside _daily_xy does not by itself isolate the benched row
    # (ADVICE r13).
    xy = register_plan_cache(_daily_xy(spark, sf_dir))
    cutoff_x = F.datediff(F.lit(_CUTOFF).cast("date"), F.lit("1970-01-01").cast("date"))
    train = xy.filter(F.col("x") < cutoff_x)
    fitted = _slope_intercept(_reg_agg(train)).select(
        "event_type", "slope", "intercept"
    )
    offsets = _dow_offsets(train, fitted)
    test = xy.filter(F.col("x") >= cutoff_x).withColumn(
        "dow", (F.col("x") + 4) % 7
    )
    lin_pred = F.col("intercept") + F.col("slope") * F.col("x")
    ape_lin = F.abs((F.col("y") - lin_pred) / F.col("y"))
    ape_seas = F.abs((F.col("y") - (lin_pred + F.col("s_dow"))) / F.col("y"))
    return (
        test.join(F.broadcast(fitted), "event_type")
        .join(F.broadcast(offsets), ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(
                F.sum(ape_lin.cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mape_linear"),
            F.round(
                F.sum(ape_seas.cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mape_seasonal"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Wide conditional-sum projection (reference Q2/Q3 shape: one column per
# category summed per day, ipynb:536-549 — pivot expressed as FILTER/CASE
# aggregates so it stays one shuffle).
# ---------------------------------------------------------------------------

_WIDE_ORACLE = """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS click_sum,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS view_sum,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS purchase_sum,
           CAST(SUM(CASE WHEN event_type IN ('click','view')
                    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS engagement_sum
    FROM events
    GROUP BY 1
    ORDER BY day
"""


@plan("daily_wide_sums", _WIDE_ORACLE)
def daily_wide_sums(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")

    def csum(pred, alias):
        return (
            F.sum(F.when(pred, F.col("value").cast(DEC)).otherwise(F.lit(0).cast(DEC)))
            .cast("double")
            .alias(alias)
        )

    et = F.col("event_type")
    return (
        e.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            csum(et == "click", "click_sum"),
            csum(et == "view", "view_sum"),
            csum(et == "purchase", "purchase_sum"),
            csum(et.isin("click", "view"), "engagement_sum"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis — the pre-flight check before any 100 TB
# shuffle join: per-key frequencies (first agg, map-side combined)
# reduced to distribution stats (second agg over one row per key).
# skew_ratio = hottest key count / mean count; > ~20 means salt the join
# or rely on AQE's skew split. All stats integer/decimal-exact: the
# ratio's FLOOR runs on an exact wide-integer division (Spark
# decimal(38,0) div -> bigint; DuckDB HUGEINT //), never on a double —
# a double multiply before FLOOR can land 1 ulp either side of the
# boundary and flip the last micro-digit between engines (the r1
# hash-fail class). The quotient is micro-units (ppm), <= n_keys*1e6,
# so it fits bigint to ~9e18 keys; the single int->double conversion +
# one IEEE divide at the end are bit-identical everywhere.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
    WITH k AS (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_keys,
           -- DuckDB types SUM(BIGINT) as HUGEINT, which pandas marshals
           -- to float64 (15000.0 vs Spark's 15000) — cast keeps the
           -- output column int64 on both engines (DETERMINISM.md rule)
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MAX(cnt) AS max_cnt,
           CAST((CAST(MAX(cnt) AS HUGEINT) * COUNT(*) * 1000000)
                // SUM(cnt) AS DOUBLE) / 1e6 AS skew_ratio
    FROM k
"""


@plan("join_key_skew", _SKEW_ORACLE)
def join_key_skew(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    agg = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "max_cnt",
        (
            F.expr(
                "cast(max_cnt as decimal(38,0)) * n_keys * 1000000 div n_rows"
            ).cast("double")
            / F.lit(1e6)
        ).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Exact monthly active users — the exact twin of approx_distinct_users.
# COUNT(DISTINCT user_id) plans as Spark's two-stage expand-distinct:
# partial dedup on (month, user) map-side, then the month-level count —
# the exact-distinct shape that stays shuffle-bounded at 100 TB because
# stage one collapses to unique pairs before anything moves.
# ---------------------------------------------------------------------------

_MAU_ORACLE = """
    SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
           COUNT(DISTINCT user_id) AS mau,
           COUNT(*) AS n_events
    FROM events
    GROUP BY date_trunc('month', ts)
    ORDER BY month
"""


@plan("monthly_active_users", _MAU_ORACLE)
def monthly_active_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"))
        .agg(
            F.countDistinct("user_id").alias("mau"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Timezone-aware hour-of-day profile — the "local business hours" lens
# over a UTC event stream. The conversion pins both engines to explicit
# IANA zones (UTC -> Europe/Stockholm) rather than session timezone, so
# the result is config-independent; bucketing is map-side, one 24-key
# shuffle. Value sums ride decimals as usual.
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
    SELECT strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Stockholm', '%H') AS local_hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY local_hour
    ORDER BY local_hour
"""


@plan("local_hour_profile", _TZ_ORACLE)
def local_hour_profile(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp("ts", "Europe/Stockholm")
    return (
        e.groupBy(F.date_format(local, "HH").alias("local_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .orderBy("local_hour")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users — sliding DISTINCT, the aggregate a window
# frame CANNOT express (COUNT(DISTINCT) over a moving range). The
# standard scale pattern: collapse events to unique (day, user) pairs
# FIRST (the big shrink), fan each pair out to the <=7 window-end days
# it belongs to via a range join on the tiny day grid, then a two-level
# distinct count per window day. The fan-out factor is bounded by the
# window length, never the data.
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM du
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS window_end,
           COUNT(DISTINCT u.user_id) AS active_7d
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    ORDER BY window_end
"""


@plan("rolling_7d_active_users", _ROLLING_ORACLE)
def rolling_7d_active_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = du.select(F.col("day").alias("wend")).distinct()
    return (
        du.join(
            F.broadcast(days),
            (F.col("day") <= F.col("wend"))
            & (F.col("day") >= F.date_sub(F.col("wend"), 6)),
        )
        .groupBy("wend")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(
            F.date_format("wend", "yyyy-MM-dd").alias("window_end"), "active_7d"
        )
        .orderBy("window_end")
    )


# ---------------------------------------------------------------------------
# Per-group MODE (most frequent value) with a deterministic tie-break
# (higher count wins, then lexicographic value) — implemented as
# count-then-rank so the answer is exact and engine-stable, never the
# sampling-dependent `mode()` builtins. Two shuffles: (group, value)
# counts, then the rank exchange on ~|groups x values|.
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), r AS (
      SELECT o_orderpriority, o_orderstatus, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY cnt DESC, o_orderstatus) AS rn
      FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, cnt AS n
    FROM r WHERE rn = 1
    ORDER BY o_orderpriority
"""


@plan("mode_status_by_priority", _MODE_ORACLE)
def mode_status_by_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), "o_orderstatus"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("cnt").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue delta — LAG over the monthly aggregate. The
# subtraction happens IN DECIMAL (exact on both engines) and only the
# final values cast to double. The global LAG window runs on post-agg
# rows (one per month), so the single-partition window is ~100 rows even
# at 100 TB — the heavy lifting is the map-side-combined monthly agg.
# ---------------------------------------------------------------------------

_MOM_DELTA_ORACLE = """
    WITH m AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
    FROM m ORDER BY month
"""


@plan("monthly_revenue_delta", _MOM_DELTA_ORACLE)
def monthly_revenue_delta(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"),
    )
    w = Window.orderBy("month")
    return (
        m.select(
            "month",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev") - F.lag("rev").over(w)).cast("double").alias("mom_delta"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Exact distinct users at THREE grains in one pass — COUNT(DISTINCT)
# under GROUPING SETS (by event type, by month, global). Spark expands
# each row once per grouping set, then runs its standard two-stage exact
# distinct: partial dedup on (grain, user) before the count, all
# map-side combined. GROUPING() disambiguates the rollup slots from a
# genuinely NULL group value.
# ---------------------------------------------------------------------------

_GRAIN_MAU_ORACLE = """
    WITH e2 AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m') AS month, user_id
      FROM events
    )
    SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END
             AS etype,
           CASE WHEN GROUPING(month) = 1 THEN 'ALL' ELSE month END AS month,
           COUNT(DISTINCT user_id) AS active_users,
           COUNT(*) AS n_events
    FROM e2
    GROUP BY GROUPING SETS ((event_type), (month), ())
    -- Spark omits the ()-grouping-set row on EMPTY input (engine seam,
    -- test_engine_seams.py); real groups always have >= 1 row
    HAVING COUNT(*) > 0
    ORDER BY etype, month
"""


@plan("active_users_by_grain", _GRAIN_MAU_ORACLE)
def active_users_by_grain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM").alias("ev_month"),
        "user_id",
    )
    return (
        e.groupingSets([["event_type"], ["ev_month"], []], "event_type", "ev_month")
        .agg(
            F.when(F.grouping("event_type") == 1, "ALL")
            .otherwise(F.col("event_type"))
            .alias("etype"),
            F.when(F.grouping("ev_month") == 1, "ALL")
            .otherwise(F.col("ev_month"))
            .alias("month"),
            F.countDistinct("user_id").alias("active_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("etype", "month", "active_users", "n_events")
        .orderBy("etype", "month")
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal index — avg daily event value per weekday over
# the all-days average. Exact: both engines sum decimals; the only
# doubles are the final division chain on identical operands. Weekday
# numbering pinned Monday=0 (Spark weekday() == DuckDB isodow()-1;
# neither side's locale-dependent day NAMES are used).
# ---------------------------------------------------------------------------

_DOW_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS day_rev
      FROM events GROUP BY 1
    ),
    by_dow AS (
      SELECT isodow(day) - 1 AS dow,
             SUM(day_rev) AS dow_rev,
             COUNT(*) AS n_days
      FROM daily GROUP BY 1
    )
    SELECT dow, n_days,
           CAST(dow_rev AS DOUBLE) AS dow_revenue,
           (CAST(dow_rev AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(SUM(dow_rev) OVER () AS DOUBLE)
                  / CAST(SUM(n_days) OVER () AS DOUBLE)) AS seasonal_index
    FROM by_dow
    ORDER BY dow
"""


@plan("dow_seasonality", _DOW_ORACLE)
def dow_seasonality(spark, sf_dir):
    """Per-weekday average daily revenue as an index against the
    all-days average (index > 1 = above-trend weekday).

    100 TB: two cascaded hash aggregates (day grain, then 7 weekday
    groups), both map-side combined; the normalizing windows run on the
    7-row aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("day_rev")
    )
    by_dow = daily.groupBy(F.weekday("day").cast("long").alias("dow")).agg(
        F.sum("day_rev").alias("dow_rev"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = Window.partitionBy()
    return by_dow.select(
        "dow",
        "n_days",
        F.col("dow_rev").cast("double").alias("dow_revenue"),
        (
            (F.col("dow_rev").cast("double") / F.col("n_days").cast("double"))
            / (
                F.sum("dow_rev").over(w).cast("double")
                / F.sum("n_days").over(w).cast("double")
            )
        ).alias("seasonal_index"),
    ).orderBy("dow")


# ---------------------------------------------------------------------------
# 30-day WEIGHTED moving average of daily revenue (weight = 30 - age,
# linear decay). SQL window frames can't weight by position inside the
# frame, so each source day fans out to the <=30 target days it
# contributes to (explode of a 30-element sequence — the weighted twin
# of rolling_7d_active_users' day-grid trick) and the target-day
# aggregate folds value*weight and the weight mass in exact decimal.
# Fan-out factor is the window length, never the data size.
# ---------------------------------------------------------------------------

_WMA_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS day_rev
      FROM events GROUP BY 1
    ),
    fan AS (
      SELECT day + TO_DAYS(CAST(k AS INTEGER)) AS target_day,
             30 - k AS w,
             day_rev
      FROM daily, UNNEST(generate_series(0, 29)) AS t(k)
    )
    SELECT strftime(target_day, '%Y-%m-%d') AS day,
           CAST(SUM(w) AS BIGINT) AS weight_mass,
           CAST(SUM(day_rev * w) AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE) AS wma30
    FROM fan
    WHERE target_day <= (SELECT MAX(day) FROM daily)
    GROUP BY target_day
    ORDER BY day
"""


@plan("weighted_moving_average", _WMA_ORACLE)
def weighted_moving_average(spark, sf_dir):
    """Linear-decay 30-day weighted moving average of daily event
    revenue; weight_mass records how much of the window each day saw
    (edges ramp up).

    100 TB: the fan-out happens AFTER the day-grain aggregate, so it
    multiplies ~|days| rows by 30, not the event count; both aggregates
    are map-side combined; no window sort anywhere.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("day_rev")
    )
    max_day = daily.agg(F.max("day").alias("max_day"))
    fan = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("k"),
        "day",
        "day_rev",
    ).select(
        F.date_add("day", F.col("k")).alias("target_day"),
        (F.lit(30) - F.col("k")).alias("w"),
        "day_rev",
    )
    return (
        fan.join(F.broadcast(max_day), F.col("target_day") <= F.col("max_day"))
        .groupBy("target_day")
        .agg(
            F.sum("w").cast("bigint").alias("weight_mass"),
            (
                F.sum(F.col("day_rev") * F.col("w")).cast("double")
                / F.sum("w").cast("double")
            ).alias("wma30"),
        )
        .select(
            F.date_format("target_day", "yyyy-MM-dd").alias("day"),
            "weight_mass",
            "wma30",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Lag-7 autocorrelation of daily revenue — Pearson r between the daily
# series and itself shifted a week, via a self-EQUI-join on day-7 (the
# Spark-first spelling: no global-window LAG over the whole series, so
# the pairing parallelizes like any hash join). Moments accumulate in
# exact decimal; only the final scalar algebra runs in double (+,-,*,/
# and sqrt — IEEE-deterministic).
#
# Cast discipline: each moment goes through FLOOR before the double
# cast. DuckDB casts wide decimals via int128 -> double -> /10^scale
# (two roundings) while Spark's BigDecimal cast rounds once, so a
# scale-12 moment whose scaled integer exceeds 2^53 can differ in the
# last ulp — and a decimal RESCALE doesn't help because the engines
# disagree there too (DuckDB truncates, Spark rounds half-up). FLOOR
# is defined identically in both, and casting the resulting scale-0
# decimal to double is a single identical rounding. The sub-unit
# truncation is noise at moment magnitude.
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.y AS x, b.y AS y
      FROM daily a JOIN daily b ON b.day = a.day + TO_DAYS(7)
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(FLOOR(SUM(x)) AS DOUBLE) AS sx,
             CAST(FLOOR(SUM(y)) AS DOUBLE) AS sy,
             CAST(FLOOR(SUM(x * y)) AS DOUBLE) AS sxy,
             CAST(FLOOR(SUM(x * x)) AS DOUBLE) AS sxx,
             CAST(FLOOR(SUM(y * y)) AS DOUBLE) AS syy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                  * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)) AS acf_7
    FROM m
"""


@plan("autocorr_lag7_revenue", _AUTOCORR_ORACLE)
def autocorr_lag7_revenue(spark, sf_dir):
    """Weekly autocorrelation of the daily revenue series (one row:
    pair count + Pearson r at lag 7).

    100 TB: day-grain aggregate (map-side combined), then a self
    equi-join on the shifted day key — both sides are the ~|days|-row
    aggregate — and a single all-reduce of six decimal moments.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("y")
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("y").alias("x"))
    b = daily.select(F.date_sub("day", 7).alias("day_a"), F.col("y").alias("y"))
    pairs = a.join(b, "day_a")
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("x")).cast("double").alias("sx"),
        F.floor(F.sum("y")).cast("double").alias("sy"),
        F.floor(F.sum(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.floor(F.sum(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.floor(F.sum(F.col("y") * F.col("y"))).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("acf_7"),
    )


# ---------------------------------------------------------------------------
# k-anonymity census (Sweeney 2002) — the governance gate a training
# pipeline runs before customer-derived data leaves the fence: group
# the table by its quasi-identifier tuple and report the equivalence-
# class size distribution plus what a k>=5 release policy would
# suppress. QIDs here are (nation, market segment) on customer — the
# classic "harmless" demographic pair whose joint distribution gets
# sparse. All-integer output.
# 100 TB: two map-side-combined hash aggregates (QID tuple, then class
# size) — the second runs on the |distinct QID| relation. Linear, no
# joins, no windows.
# ---------------------------------------------------------------------------

_K_ANON_ORACLE = """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS k
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(CASE WHEN k < 5 THEN SUM(k) ELSE 0 END AS BIGINT)
             AS suppressed_rows
    FROM g GROUP BY k ORDER BY k
"""


@plan("k_anonymity_census", _K_ANON_ORACLE)
def k_anonymity_census(spark, sf_dir):
    """Equivalence-class size histogram for the (nation, segment)
    quasi-identifier pair, with the rows a k>=5 policy suppresses."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        g.groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("k").cast("bigint").alias("n_rows"),
        )
        .select(
            "k",
            "n_classes",
            "n_rows",
            F.when(F.col("k") < 5, F.col("n_rows"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("suppressed_rows"),
        )
        .orderBy("k")
    )
