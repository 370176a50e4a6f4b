"""Behavioral analytics plans over the event stream: cohort retention
and funnel conversion — the product-analytics query shapes a complete
engine gets asked for daily, built on the same one-shuffle-per-level
discipline as the window plans.

Scale: every stage is a hash aggregation or equi-join on user_id, so a
single partitioning carries through the whole plan (Spark reuses the
exchange); nothing is ordered globally and nothing returns to the
driver except the final small result.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from . import plan

# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen day, counted on each
# subsequent active day. (cohort_day, days_since, n_users) is the
# retention-curve matrix.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(a.day - f.cohort AS BIGINT) AS days_since,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN firsts f USING (user_id)
    GROUP BY f.cohort, a.day - f.cohort
    ORDER BY cohort_day, days_since
"""


@plan("cohort_retention", _RETENTION_ORACLE)
def cohort_retention(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort"))
    act = e.distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("bigint").alias("days_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "days_since")
    )


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click (after the first view) -> purchase
# (after that click). Each stage keeps only users who passed the prior
# stage WITH increasing event times — the strict-sequence semantics that
# separates a funnel from three independent counts.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t0
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased
"""


@plan("funnel_view_click_purchase", _FUNNEL_ORACLE)
def funnel_view_click_purchase(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts): LAG the event
# type within each user's time-ordered stream, count (prev -> next)
# pairs. One exchange on user_id for the window, then a map-side-combined
# count on the tiny |event_types|^2 key space.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
    -- ts IS NOT NULL: unsequenceable events are excluded (pinned
    -- streaming contract). "has a predecessor" is judged by the
    -- predecessor's KEY (event_id, never NULL for a real row), not
    -- its type — filtering on prev_type conflated "stream start"
    -- with "predecessor of unknown type" and silently dropped those
    -- transitions (r13 mixed-corpus sweep)
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             LAG(event_id) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_id
      FROM events WHERE ts IS NOT NULL
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM s WHERE prev_id IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
"""


@plan("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        # predecessor presence by KEY; NULL event times excluded —
        # see the oracle comment
        e.filter(F.col("ts").isNotNull())
        .select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.lag("event_id").over(w).alias("__prev_id"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("__prev_id").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# Time-bounded funnel: view -> click within 1h -> purchase within 1h of
# the qualifying click. Two ordered window passes inside ONE user_id
# exchange: (1) each click learns the latest view at-or-before it
# (running conditional max of epoch-micros), (2) each purchase learns
# the latest QUALIFIED click the same way. All bound checks are BIGINT
# microsecond arithmetic — engine-exact. Contrast with
# funnel_view_click_purchase, which is sequence-only (no time bound).
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000

_FUNNEL_1H_ORACLE = f"""
    WITH e2 AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ), w1 AS (
      SELECT user_id, event_id, event_type, us,
             MAX(CASE WHEN event_type = 'view' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS last_view_us
      FROM e2
    ), w2 AS (
      SELECT user_id, event_type, us,
             CASE WHEN event_type = 'click' AND last_view_us IS NOT NULL
                       AND us - last_view_us <= {_HOUR_US}
                  THEN us END AS qc_us,
             event_id
      FROM w1
    ), w3 AS (
      SELECT user_id, event_type, us, qc_us,
             MAX(qc_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS last_qc_us
      FROM w2
    )
    SELECT COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
             AS n_viewed,
           COUNT(DISTINCT CASE WHEN qc_us IS NOT NULL THEN user_id END)
             AS n_clicked_1h,
           COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    AND last_qc_us IS NOT NULL
                                    AND us - last_qc_us <= {_HOUR_US}
                               THEN user_id END) AS n_purchased_1h
    FROM w3
"""


@plan("funnel_within_1h", _FUNNEL_1H_ORACLE)
def funnel_within_1h(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e2 = e.select("user_id", "event_id", "event_type", us.alias("us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w1 = e2.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    w2 = w1.withColumn(
        "qc_us",
        F.when(
            (F.col("event_type") == "click")
            & F.col("last_view_us").isNotNull()
            & (F.col("us") - F.col("last_view_us") <= _HOUR_US),
            F.col("us"),
        ),
    )
    w3 = w2.withColumn("last_qc_us", F.max("qc_us").over(w))
    return w3.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_viewed"),
        F.countDistinct(
            F.when(F.col("qc_us").isNotNull(), F.col("user_id"))
        ).alias("n_clicked_1h"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("last_qc_us").isNotNull()
                & (F.col("us") - F.col("last_qc_us") <= _HOUR_US),
                F.col("user_id"),
            )
        ).alias("n_purchased_1h"),
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day activity streak per user — gaps-and-islands by
# the date-minus-row_number trick: within a user's DISTINCT active days,
# (day_number - row_number) is constant exactly along a consecutive run.
# One exchange on user_id; the distinct, both windows, and both
# reductions all ride that partitioning. Everything is integer day
# arithmetic. Top-20 by (streak, user) with a deterministic tie-break.
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), r AS (
      SELECT user_id, day,
             (day - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d
    ), runs AS (
      SELECT user_id, grp, COUNT(*) AS streak_days,
             CAST(MIN(day) AS VARCHAR) AS streak_start
      FROM r GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, streak_days, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, streak_start) AS rn
      FROM runs
    )
    SELECT user_id, streak_days, streak_start
    FROM best WHERE rn = 1
    ORDER BY streak_days DESC, user_id LIMIT 20
"""


@plan("longest_daily_streak", _STREAK_ORACLE)
def longest_daily_streak(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn(
        "grp",
        F.datediff("day", F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    runs = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").cast("string").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        runs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
        .orderBy(F.col("streak_days").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Inter-event gap histogram: the distribution of time between a user's
# consecutive events, bucketed per minute (capped at 60+). Bucketing is
# integer division of BIGINT micros — no float ever decides a bucket.
# One user_id exchange for the LAG, then a map-side-combined count on
# ~61 keys.
# ---------------------------------------------------------------------------

_GAP_HIST_ORACLE = """
    WITH g AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT LEAST(gap_us // 60000000, 60) AS gap_minutes,
           COUNT(*) AS n
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1 ORDER BY gap_minutes
"""


@plan("inter_event_gap_histogram", _GAP_HIST_ORACLE)
def inter_event_gap_histogram(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select((us - F.lag(us).over(w)).alias("gap_us"))
    return (
        g.filter(F.col("gap_us").isNotNull())
        .select(
            F.least(
                F.expr("gap_us div 60000000"), F.lit(60).cast("bigint")
            ).alias("gap_minutes")
        )
        .groupBy("gap_minutes")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("gap_minutes")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution: each purchase is credited to the nearest
# PRECEDING non-purchase event of the same user (the marketing-channel
# question). One per-user ordered window — no self-join, no driver
# loop; (ts, event_id) is a total order so ties are deterministic.
# ---------------------------------------------------------------------------

_LAST_TOUCH_ORACLE = """
    WITH tagged AS (
      SELECT user_id, event_type, value, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY channel
"""


@plan("last_touch_attribution", _LAST_TOUCH_ORACLE)
def last_touch_attribution(spark, sf_dir):
    """Purchase count and decimal-exact value credited to the last
    preceding non-purchase event type per user ('direct' when none).

    100 TB: one exchange on user_id; the window frame is a running
    last-non-null carry (no per-partition re-sort beyond the window
    sort, bounded by per-user event counts); the final aggregate has
    ~|event_type| groups with map-side combine.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# RFM census: per-customer Recency / Frequency / Monetary scored against
# FIXED business thresholds (quantile-free on purpose: threshold scoring
# is a pure map over the per-customer aggregate, so the plan stays fully
# parallel at any customer cardinality — no global NTILE sort; the
# quantile variant of this shape lives in decile_revenue_share /
# ntile_price_quartiles).
# ---------------------------------------------------------------------------

_RFM_ANCHOR = "2001-08-02"
_RFM_ORACLE = f"""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       DATE '{_RFM_ANCHOR}') AS rec_days,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT CASE WHEN rec_days <= 180 THEN 3
                  WHEN rec_days <= 720 THEN 2 ELSE 1 END AS r_score,
             CASE WHEN freq >= 12 THEN 3
                  WHEN freq >= 6 THEN 2 ELSE 1 END AS f_score,
             CASE WHEN monetary >= 3000000 THEN 3
                  WHEN monetary >= 1500000 THEN 2 ELSE 1 END AS m_score,
             monetary
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS total_value
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_score, f_score, m_score
"""


@plan("rfm_segments", _RFM_ORACLE)
def rfm_segments(spark, sf_dir):
    """Customer count and decimal-exact value per (R,F,M) segment cell,
    scored by fixed thresholds against the day after the corpus' last
    order date.

    100 TB: one exchange on o_custkey for the per-customer aggregate
    (map-side partial MAX/COUNT/SUM), threshold scoring map-side, then
    a 27-cell final aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"), F.max(F.to_date("o_orderdate"))
        ).alias("rec_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("monetary"),
    )
    scored = per_cust.select(
        F.when(F.col("rec_days") <= 180, 3)
        .when(F.col("rec_days") <= 720, 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("freq") >= 12, 3)
        .when(F.col("freq") >= 6, 2)
        .otherwise(1)
        .alias("f_score"),
        F.when(F.col("monetary") >= 3000000, 3)
        .when(F.col("monetary") >= 1500000, 2)
        .otherwise(1)
        .alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Audience overlap matrix — pairwise Jaccard between the USER SETS of
# each event type. Intersections via a user-keyed self-join of the
# distinct (type, user) relation (per-user fan-out bounded by the
# number of types, never the event count); unions by inclusion-
# exclusion from the per-type distinct counts, so no second join pass.
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_common
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
"""


@plan("audience_overlap_matrix", _OVERLAP_ORACLE)
def audience_overlap_matrix(spark, sf_dir):
    """Jaccard overlap between every pair of event-type audiences.

    100 TB: the distinct (type, user) relation shrinks events to at
    most |types| rows per user; the self-join shuffles on user_id once;
    the size lookup is a broadcast of |types| rows.
    """
    e = load_table(spark, sf_dir, "events")
    du = e.select("event_type", "user_id").distinct()
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")))
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining, simplest useful form: the top-20 most
# common consecutive 3-event paths (trigrams) across users. Two LAGs
# per user replace any subsequence self-join; the global head is a
# TakeOrderedAndProject under the (count desc, path) total order.
# ---------------------------------------------------------------------------

_PATH_ORACLE = """
    WITH seq AS (
      SELECT user_id,
             LAG(event_type, 2) OVER w AS e1,
             LAG(event_type, 1) OVER w AS e2,
             event_type AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
    FROM seq
    WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
"""


@plan("top_event_paths", _PATH_ORACLE)
def top_event_paths(spark, sf_dir):
    """Top-20 consecutive view>click>... 3-step paths by frequency.

    100 TB: one exchange on user_id for the lag window, a path-keyed
    aggregate bounded by |types|^3 groups, then a parallel top-k —
    no global sort of the path table.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    )
    # all THREE steps must be known: a NULL event_type inside a trigram
    # must drop the trigram on both engines — concat_ws silently SKIPS
    # a NULL segment (yielding a 2-step path) while the oracle's ||
    # propagates NULL into a NULL path group (r12 torture-corpus audit)
    return (
        seq.filter(
            F.col("e1").isNotNull()
            & F.col("e2").isNotNull()
            & F.col("e3").isNotNull()
        )
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Time-decay attribution — every preceding touch within 100 minutes of
# a purchase gets credit that HALVES per 10 elapsed minutes. The decay
# weight is deliberately dyadic: w = 2^-k with k = floor(dt/10min), so
# w scaled by 2^40 is the integer 2^(40-k) (shiftleft — no pow(), no
# libm), the per-channel credit fold is an exact DECIMAL(38,0) sum
# (order-free; BIGINT would silently wrap past ~2^23 credits per
# channel under Spark's non-ANSI overflow while DuckDB promotes to
# HUGEINT — decimal keeps both engines exact to ~10^38 ≈ 2^126, i.e.
# ~10^26 credits per channel), and one final division by 2^40 (exact
# power-of-two scaling) produces the double. The touch<-purchase
# pairing is a user-keyed banded self-join whose fan-out the
# 100-minute cap bounds.
# ---------------------------------------------------------------------------

_DECAY_ORACLE = """
    WITH p AS (
      SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_type FROM events WHERE event_type <> 'purchase'
    ),
    credits AS (
      SELECT t.event_type AS channel,
             CAST(date_diff('microseconds', t.ts, p.pts)
                  // 600000000 AS BIGINT) AS k
      FROM t JOIN p ON p.user_id = t.user_id
       AND t.ts < p.pts
       AND date_diff('microseconds', t.ts, p.pts) <= 6000000000
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(40 - k AS INTEGER)
                         AS DECIMAL(38,0))) AS DOUBLE)
             / 1099511627776 AS credit
    FROM credits
    GROUP BY 1
    ORDER BY channel
"""


@plan("time_decay_attribution", _DECAY_ORACLE)
def time_decay_attribution(spark, sf_dir):
    """Per-channel decayed credit for touches preceding purchases
    (half-life 10 min, horizon 100 min).

    100 TB: one exchange on user_id; pair fan-out bounded by touches
    per 100-minute window; the credit fold is an exact decimal(38,0)
    sum with map-side combine (bound: ~10^26 credits per channel
    before 38 digits overflow — BIGINT would wrap at ~2^23).
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us")
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.col("event_type").alias("channel"),
    )
    dt = F.col("p_us") - F.col("t_us")
    pairs = t.join(p, "user_id").filter((dt > 0) & (dt <= 6000000000))
    credits = pairs.select(
        "channel",
        F.expr(
            "cast(shiftleft(1L, cast(40 - ((p_us - t_us) div 600000000)"
            " as int)) as decimal(38,0))"
        ).alias("w_fp"),
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            (F.sum("w_fp").cast("double") / F.lit(1099511627776.0)).alias("credit"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve — cumulative purchase value per user by cohort day
# and days-since-signup (first-seen day). The cumulative step runs on
# the (cohort, days_since) AGGREGATE (bounded by days^2/2 cells, not
# events) in exact decimal; per-user division happens once at the end
# in double on identical operands. Retention's revenue twin.
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
    ),
    sizes AS (
      SELECT cohort, COUNT(*) AS n_users FROM firsts GROUP BY 1
    ),
    rev AS (
      SELECT f.cohort,
             CAST(CAST(e.ts AS DATE) - f.cohort AS BIGINT) AS days_since,
             SUM(CAST(e.value AS DECIMAL(18,6))) AS day_rev
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, days_since,
             SUM(day_rev) OVER (PARTITION BY cohort ORDER BY days_since
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev
      FROM rev
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
           c.days_since,
           CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
           CAST(c.cum_rev AS DOUBLE) / CAST(s.n_users AS DOUBLE)
             AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort)
    ORDER BY cohort_day, days_since
"""


@plan("cohort_ltv", _LTV_ORACLE)
def cohort_ltv(spark, sf_dir):
    """Cumulative revenue and LTV-per-user by cohort day and age.

    100 TB: firsts and the day-grain revenue aggregate shuffle on
    user_id/cohort with map-side combine; the running sum windows over
    the per-(cohort, age) aggregate (~days^2/2 rows max); cohort sizes
    broadcast into the final divide.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).cast("bigint").alias(
                "days_since"
            ),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("day_rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("days_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_rev", F.sum("day_rev").over(w))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            "days_since",
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            (F.col("cum_rev").cast("double") / F.col("n_users").cast("double")).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_day", "days_since")
    )


# ---------------------------------------------------------------------------
# In-engine model evaluation: a first-order Markov next-event predictor
# FIT on the first 20 days (mode next-type per prev-type, deterministic
# count-desc/name-asc tie-break) and SCORED on the remainder — the
# train/eval split (SURVEY §2.9 M1) applied to a pure-SQL model. The
# "model" is a |types|-row table that broadcasts into the scoring join;
# accuracy is one conditional aggregate.
# ---------------------------------------------------------------------------

_MARKOV_SPLIT = "2024-01-21"
_MARKOV_ORACLE = f"""
    WITH pairs AS (
      SELECT ts, user_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM events
    ),
    train AS (
      SELECT prev_type, next_type, COUNT(*) AS n
      FROM pairs
      WHERE prev_type IS NOT NULL AND ts < TIMESTAMP '{_MARKOV_SPLIT}'
      GROUP BY 1, 2
    ),
    model AS (
      SELECT prev_type, next_type AS predicted FROM (
        SELECT prev_type, next_type,
               ROW_NUMBER() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, next_type) AS rn
        FROM train
      ) WHERE rn = 1
    ),
    test AS (
      SELECT prev_type, next_type FROM pairs
      WHERE prev_type IS NOT NULL AND ts >= TIMESTAMP '{_MARKOV_SPLIT}'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN m.predicted = t.next_type THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN m.predicted = t.next_type THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM test t JOIN model m USING (prev_type)
"""


@plan("markov_next_event_accuracy", _MARKOV_ORACLE)
def markov_next_event_accuracy(spark, sf_dir):
    """Holdout accuracy of the majority-transition predictor.

    100 TB: one user_id exchange builds all (prev, next) pairs; the
    fitted model is |types| rows and broadcasts into the scoring join;
    train/test split is a timestamp predicate, not a shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    split = F.lit(_MARKOV_SPLIT).cast("timestamp")
    train = (
        pairs.filter(F.col("ts") < split)
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("prev_type").orderBy(F.col("n").desc(), "next_type")
    model = (
        train.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    test = pairs.filter(F.col("ts") >= split).select("prev_type", "next_type")
    hit = F.when(F.col("predicted") == F.col("next_type"), 1).otherwise(0)
    return test.join(F.broadcast(model), "prev_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(hit).cast("bigint").alias("n_correct"),
        (F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# Churn hazard table — the discrete survival-analysis primitive. Per
# lifetime day d: users still at risk (lifetime >= d), users churned at
# d (last activity exactly d days after first, and censoring-aware:
# users last seen on the corpus' final day are censored, not churned),
# and the hazard ratio. The Kaplan-Meier survival curve is the running
# product of (1 - hazard); products of doubles are order-dependent, so
# like the PSI log term it is left to the consumer — every emitted
# number here is an exact count or a single division.
# ---------------------------------------------------------------------------

_HAZARD_ORACLE = """
    WITH span AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_day,
             MAX(CAST(ts AS DATE)) AS last_day
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
    lives AS (
      SELECT CAST(s.last_day - s.first_day AS BIGINT) AS lifetime,
             CASE WHEN s.last_day < b.max_day THEN 1 ELSE 0 END AS uncensored
      FROM span s CROSS JOIN bounds b
    ),
    days AS (
      SELECT DISTINCT lifetime AS d FROM lives
    )
    SELECT d.d AS lifetime_day,
           CAST(SUM(CASE WHEN l.lifetime >= d.d THEN 1 ELSE 0 END) AS BIGINT)
             AS n_at_risk,
           CAST(SUM(CASE WHEN l.lifetime = d.d AND l.uncensored = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN l.lifetime = d.d AND l.uncensored = 1
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN l.lifetime >= d.d THEN 1 ELSE 0 END)
                    AS DOUBLE) AS hazard
    FROM days d JOIN lives l ON l.lifetime >= 0
    GROUP BY d.d
    ORDER BY lifetime_day
"""


@plan("churn_hazard_table", _HAZARD_ORACLE)
def churn_hazard_table(spark, sf_dir):
    """Discrete churn hazards by lifetime day, censoring-aware.

    100 TB: per-user spans are one user_id exchange; the grid join fans
    each user's ROW (not events) out over observed lifetime days —
    bounded by the corpus day span — with map-side combined counts.
    """
    from ..cache import register_plan_cache

    e = load_table(spark, sf_dir, "events")
    # Lazy plan-cache (cache.py lifecycle): three legs consume the
    # per-user span census (the observation bound, the lifetime rows,
    # and the distinct lifetime-day grid) with different column needs,
    # so Catalyst prunes each leg's partial aggregate differently and
    # no two subtrees stay ReuseExchange-identical — the events corpus
    # was scanned three times (r13 wide scan audit). One |users|-sized
    # materialization serves all three; executed events scans 3 -> 1.
    span = register_plan_cache(
        e.groupBy("user_id").agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
    )
    # corpus max day = max of the per-user maxes (MAX skips NULLs on
    # both paths, so all-NULL users drop out identically) — derived
    # from the cached span census instead of a second raw scan
    bounds = span.agg(F.max("last_day").alias("max_day"))
    lives = span.crossJoin(F.broadcast(bounds)).select(
        F.datediff("last_day", "first_day").cast("bigint").alias("lifetime"),
        F.when(F.col("last_day") < F.col("max_day"), 1).otherwise(0).alias(
            "uncensored"
        ),
    )
    days = lives.select(F.col("lifetime").alias("d")).distinct()
    at_risk = F.sum(F.when(F.col("lifetime") >= F.col("d"), 1).otherwise(0))
    churned = F.sum(
        F.when((F.col("lifetime") == F.col("d")) & (F.col("uncensored") == 1), 1)
        .otherwise(0)
    )
    return (
        F.broadcast(days)
        .join(lives, F.col("lifetime") >= 0)
        .groupBy(F.col("d").alias("lifetime_day"))
        .agg(
            at_risk.cast("bigint").alias("n_at_risk"),
            churned.cast("bigint").alias("n_churned"),
            (churned.cast("double") / at_risk.cast("double")).alias("hazard"),
        )
        .orderBy("lifetime_day")
    )
