"""Sketches + reshaping plans.

- unpivot_daily: the wide-per-category daily table melted back to long
  form (the reference's 40-col timeseries table round-trip, SURVEY §1.1
  "optionally unpivot with stack()/melt"). Fully deterministic ->
  full DuckDB oracle (spelled as UNION ALL so both engines replay it).
- approx_distinct_users: HyperLogLog++ distinct counts. The sketch is
  engine-specific, so this plan registers WITHOUT an oracle (the driver
  records the weaker rows-only check); tests/test_sketch.py pins the
  <=5% relative-error contract against the exact count instead.
  Scale: approx_count_distinct shuffles O(sketch) bytes per group, not
  O(distinct values) — at 100 TB it replaces the two-stage exact
  distinct entirely when tolerance allows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from . import plan

DEC = "decimal(18,6)"

_UNPIVOT_ORACLE = """
    WITH wide AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS click_sum,
             CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS view_sum,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS purchase_sum
      FROM events GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, 'click' AS series, click_sum AS value_sum FROM wide
    UNION ALL
    SELECT strftime(day, '%Y-%m-%d') AS day, 'view', view_sum FROM wide
    UNION ALL
    SELECT strftime(day, '%Y-%m-%d') AS day, 'purchase', purchase_sum FROM wide
    ORDER BY day, series
"""


@plan("unpivot_daily", _UNPIVOT_ORACLE)
def unpivot_daily(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")

    def csum(label, alias):
        return (
            F.sum(
                F.when(F.col("event_type") == label, F.col("value").cast(DEC)).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast("double")
            .alias(alias)
        )

    wide = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        csum("click", "click_sum"),
        csum("view", "view_sum"),
        csum("purchase", "purchase_sum"),
    )
    long = wide.selectExpr(
        "date_format(day, 'yyyy-MM-dd') AS day",
        "stack(3, 'click', click_sum, 'view', view_sum, 'purchase', purchase_sum)"
        " AS (series, value_sum)",
    )
    return long.orderBy("day", "series")


# ---------------------------------------------------------------------------
# True pivot (groupBy().pivot() with pinned values — dynamic pivot would
# need a driver-side distinct pass; pinning keeps it one shuffle) and
# argmax (max_by): the remaining aggregate API surface.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase
    FROM events
    GROUP BY 1
    ORDER BY day
"""


@plan("pivot_daily_values", _PIVOT_ORACLE)
def pivot_daily_values(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
        .orderBy("day")
    )


_ARGMAX_ORACLE = """
    SELECT user_id,
           MAX(CASE WHEN value IS NOT NULL
                    THEN {'v': value, 'e': event_id} END).e AS top_event_id,
           MAX(value) AS top_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""


@plan("argmax_event_per_user", _ARGMAX_ORACLE)
def argmax_event_per_user(spark, sf_dir):
    """Deterministic argmax: top-1 row per user under the total order
    (value DESC NULLS LAST, event_id DESC), so a VALUE TIE breaks on
    the highest event_id identically in both engines — bare
    max_by/arg_max leave tie order engine- and partition-dependent
    (measured diverging on a tied corpus, r12 torture audit; the old
    docstring's 'production plans would add a tiebreak struct' is now
    this plan). Shape note: a MAX over a (value, event_id) struct
    states the same thing in one aggregate, but a struct buffer can't
    hash-aggregate and compiles to a keyed SortAggregate — the
    per-partition sort the plan-shape suite forbids at 100 TB; the
    rank-filtered window keeps WindowGroupLimit's map-side prune (the
    r10 triage rule), so the hot user's reducer stays bounded. The
    NULLS LAST order plus the when() keeps arg_max's NULL semantics:
    a NULL value never wins, an all-NULL user yields a NULL argmax.
    Both engines order NaN above every double."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc_nulls_last(), F.col("event_id").desc()
    )
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.when(F.col("value").isNotNull(), F.col("event_id")).alias(
                "top_event_id"
            ),
            F.col("value").alias("top_value"),
        )
        .orderBy("user_id")
    )


@plan("approx_distinct_users", None)  # sketch: rows-only driver check
def approx_distinct_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@plan("approx_percentile_prices", None)  # sketch: rows-only driver check
def approx_percentile_prices(spark, sf_dir):
    """KLL/GK-style approximate percentiles — the single-pass mergeable
    replacement for exact percentile at 100 TB (exact `percentile`
    buffers each group's values; approx keeps a bounded sketch).
    Tolerance vs the exact plan is pinned in tests."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("ap50"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("ap90"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# MERGEABLE distinct sketches (Apache DataSketches HLL via
# hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-group
# sketches built once, then UNIONED to coarser grains without touching
# raw data — the 100 TB pattern for distinct counts over arbitrary
# rollups (pre-sketch per partition/day, merge on demand; re-scanning
# for each grain is what it replaces). approx_count_distinct's HLL++ is
# aggregate-only — its sketch can't be stored or merged; these can.
# Engine-specific binary -> rows-only check + tolerance test
# (tests/test_sketch_and_bucketing.py) like the other sketches.
# ---------------------------------------------------------------------------


@plan("hll_mergeable_distinct")
def hll_mergeable_distinct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_type_est = per_type.select(
        F.col("event_type").alias("grain"),
        "n_events",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    merged = per_type.agg(
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("approx_users"),
    ).select(F.lit("ALL").alias("grain"), "n_events", "approx_users")
    return per_type_est.unionByName(merged).orderBy("grain")


# ---------------------------------------------------------------------------
# EXACT distinct via bitmap fold — the roaring-bitmap idea in pure SQL
# ops: user_id maps to (word, bit); per (group, word) the bits OR
# together (bit_or has a map-side partial, and the word space is
# |ids|/64 AT MOST — sparse ids collapse to the words actually
# present); popcount-sum the words per group. Deliberately oracled
# against DuckDB's plain COUNT(DISTINCT): the check proves the bitmap
# algebra EQUALS distinct counting, not that two copies of the same
# query agree. At 100 TB this shuffles 64x fewer rows than the
# expand-distinct rewrite whenever ids are locally dense (the common
# case for dictionary-encoded / sequential ids).
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
"""


@plan("bitmap_distinct_users", _BITMAP_ORACLE)
def bitmap_distinct_users(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    words = (
        e.select(
            "event_type",
            F.expr("user_id div 64").alias("word"),
            F.expr("shiftleft(1L, cast(user_id % 64 as int))").alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return (
        words.groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-Min heavy hitters — the mergeable frequency sketch beside the
# bloom filter (membership) and HLL (cardinality): a 4x256 counter
# matrix where each of 4 md5-derived hash rows buckets every token
# occurrence; a term's estimate is the MIN over its 4 row counters —
# always >= the true count, overshooting only on bucket collisions.
# Built with ONE (row, col) groupBy whose output is 1024 counters
# regardless of corpus size (the per-partition partial matrices merge
# by addition — exactly what a 1000-executor build does map-side), then
# probed for the exact top-20 terms so the estimate-vs-exact
# overcount is visible and oracle-checked. All integers + md5 — fully
# deterministic in both engines.
# ---------------------------------------------------------------------------

_CM_ROWS = 4
_CM_COLS = 256

_COUNTMIN_ORACLE = rf"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents WHERE length(trim(text)) > 0
    ),
    exact AS (
      SELECT term, COUNT(*) AS n_exact FROM tok GROUP BY term
      ORDER BY n_exact DESC, term LIMIT 20
    ),
    rows_ AS (SELECT unnest(generate_series(0, {_CM_ROWS - 1})) AS r),
    cells AS (
      SELECT r,
             CAST('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || ':' || term), 1, 8)
                  AS BIGINT) % {_CM_COLS} AS col,
             COUNT(*) AS cnt
      FROM tok CROSS JOIN rows_
      GROUP BY 1, 2
    ),
    probe AS (
      SELECT exact.term, exact.n_exact, MIN(cells.cnt) AS n_est
      FROM exact
      CROSS JOIN rows_
      JOIN cells
        ON cells.r = rows_.r
       AND cells.col = CAST('0x' || substr(md5('cm' || CAST(rows_.r AS VARCHAR)
                                               || ':' || exact.term), 1, 8) AS BIGINT)
                       % {_CM_COLS}
      GROUP BY exact.term, exact.n_exact
    )
    SELECT term, n_exact, n_est, n_est - n_exact AS overcount
    FROM probe ORDER BY n_exact DESC, term
"""


@plan("countmin_heavy_hitters", _COUNTMIN_ORACLE)
def countmin_heavy_hitters(spark, sf_dir):
    """Count-Min estimates vs exact counts for the top-20 terms.

    100 TB: the sketch build shuffles at most ROWS*COLS counters no
    matter the corpus (uniform md5 shuffle keys, map-side combined);
    the probe is a broadcast join of the 20-term target list against
    the 1024-row sketch. The exact leg here exists to price the
    overcount; a production pipeline keeps only the sketch.
    """
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.filter(F.length(F.trim("text")) > 0).select(
        F.explode(tokens(F.col("text"))).alias("term")
    )
    exact = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "term")
        .limit(20)
    )
    rows_ = F.array(*[F.lit(r) for r in range(_CM_ROWS)])

    def cm_col(term_col, r_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "",
                            F.lit("cm"),
                            r_col.cast("string"),
                            F.lit(":"),
                            term_col,
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CM_COLS
        )

    cells = (
        tok.select("term", F.explode(rows_).alias("r"))
        .select("r", cm_col(F.col("term"), F.col("r")).alias("col"))
        .groupBy("r", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe = (
        exact.select("term", "n_exact", F.explode(rows_).alias("r"))
        .withColumn("col", cm_col(F.col("term"), F.col("r")))
        .join(cells, ["r", "col"])
        .groupBy("term", "n_exact")
        .agg(F.min("cnt").alias("n_est"))
    )
    return probe.select(
        "term",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
    ).orderBy(F.desc("n_exact"), "term")


# ---------------------------------------------------------------------------
# Approx-percentile calibration — the tolerance audit for the GK-sketch
# percentiles beside the other sketch evals (bloom FP pricing, count-min
# overcount, minhash error envelope): exact vs percentile_approx at
# accuracy=10000 for p50/p90/p99 of order totals, with the relative
# error in the row. Registered WITHOUT an oracle (the sketch is
# engine-specific — DuckDB's approx algorithm differs by design);
# tests/test_sketch_probe_invariants.py pins the <=1% relative-error
# contract instead, the same pattern as approx_distinct_users.
# 100 TB: both legs are single aggregates; the exact leg is the
# O(n log n)-ish baseline you run on a SAMPLE at scale, the sketch is
# the production path (mergeable, bounded memory).
# ---------------------------------------------------------------------------

_CAL_PS = (0.5, 0.9, 0.99)


@plan("approx_percentile_calibration", None)  # sketch: rows-only driver check
def approx_percentile_calibration(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    ps = list(_CAL_PS)
    agg = o.agg(
        F.expr(
            f"percentile(o_totalprice, array({', '.join(map(str, ps))}))"
        ).alias("exact"),
        F.percentile_approx(
            "o_totalprice", F.array(*[F.lit(p) for p in ps]), 10000
        ).alias("approx"),
    )
    pairs = agg.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in ps]).alias("p"),
                F.col("exact").alias("exact"),
                F.col("approx").alias("approx"),
            )
        ).alias("z")
    )
    rel_err = F.abs(F.col("z.approx") - F.col("z.exact")) / F.col("z.exact")
    return pairs.select(
        F.col("z.p").alias("p"),
        F.col("z.exact").alias("exact"),
        F.col("z.approx").alias("approx"),
        rel_err.alias("rel_err"),
    ).orderBy("p")


# ---------------------------------------------------------------------------
# Tolerance-VERDICT twins for the four rows-only sketch plans (VERDICT
# r9 ask #2). The raw sketch plans above legitimately cannot hash-match
# a cross-engine oracle (the estimate is engine-specific), so across
# r1-r9 they had zero external *green* evidence — the driver records
# `err: "no_oracle"` for them, not even a rows-count check. These twins
# turn each sketch's documented ACCURACY CONTRACT into a hash-matchable
# row, the winnowing_cap_recall pattern (plans/dedup.py): Spark
# computes the sketch AND its own exact aggregate and emits only
# cross-engine-deterministic columns — the group key, the exact value
# (integers only; interpolated exact percentiles stay Spark-side
# because the last-ulp of cross-engine float interpolation is not a
# contract worth gating on), and an integer `within_tol` verdict.
# DuckDB derives the same row from its exact aggregate with
# within_tol=1 by construction: a hash MISMATCH therefore means either
# the exact legs disagree (a real correctness bug) or the sketch
# violated its documented bound (a real contract breach). The raw
# plans stay in the catalog for the estimate itself (TOL_CHECKS still
# stamps their local tolerance); the twins are what the driver can
# verify.
# 100 TB: each twin's exact leg is an eval-only baseline (exact
# distinct / exact percentile are precisely what the sketches replace
# in production — at scale the eval runs on a sample, the sketch leg
# is the production shape and is unchanged here).
# ---------------------------------------------------------------------------

_ADU_TOL_ORACLE = """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 AS BIGINT) AS within_tol
    FROM events GROUP BY event_type ORDER BY event_type
"""


@plan("approx_distinct_users_tol", _ADU_TOL_ORACLE)
def approx_distinct_users_tol(spark, sf_dir):
    """HLL++ (rsd=0.02) vs exact distinct, per event_type: emits the
    exact count (cross-engine integer) and the <=5% relative-error
    verdict — the same bound tests/test_sketch.py pins locally, now
    externally hash-checkable."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.col("exact_users") * 0.05
    )
    return per.select(
        "event_type",
        "exact_users",
        "n_events",
        F.when(F.col("exact_users") == 0, F.col("approx_users") == 0)
        .otherwise(ok)
        .cast("bigint")
        .alias("within_tol"),
    ).orderBy("event_type")


_APP_TOL_ORACLE = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(1 AS BIGINT) AS within_tol
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@plan("approx_percentile_prices_tol", _APP_TOL_ORACLE)
def approx_percentile_prices_tol(spark, sf_dir):
    """approx_percentile(accuracy=10000) p50/p90 vs Spark's own exact
    `percentile`, per priority: <=5% relative error on BOTH quantiles
    (the interpolation-vs-actual-data-value semantic gap dominates at
    small group sizes — same bound as the local TOL_CHECKS contract).
    The exact percentile value itself stays Spark-side: it is an
    interpolated float, and gating on its cross-engine last ulp would
    test IEEE trivia, not the sketch."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile(o_totalprice, array(0.5, 0.9))"
        ).alias("exact"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9), 10000)"
        ).alias("approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ok = F.lit(True)
    for i in range(2):
        ok = ok & (
            F.abs(F.col("approx")[i] - F.col("exact")[i])
            <= F.abs(F.col("exact")[i]) * 0.05
        )
    return per.select(
        "o_orderpriority",
        "n_orders",
        # vacuously within tolerance when the group has nothing to
        # measure (all-NULL prices -> NULL percentiles -> NULL
        # comparison); same contract as the calibration report
        F.coalesce(ok, F.lit(True)).cast("bigint").alias("within_tol"),
    ).orderBy("o_orderpriority")


_HLL_TOL_ORACLE = """
    SELECT * FROM (
      SELECT event_type AS grain,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(1 AS BIGINT) AS within_tol
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'ALL',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT user_id) AS BIGINT),
             CAST(1 AS BIGINT)
      FROM events
    ) ORDER BY grain
"""


@plan("hll_mergeable_distinct_tol", _HLL_TOL_ORACLE)
def hll_mergeable_distinct_tol(spark, sf_dir):
    """DataSketches HLL (lgK=14) vs exact distinct at BOTH grains —
    per event_type and the 'ALL' row whose sketch comes from
    hll_union_agg over the per-type sketches, so a green row verifies
    the MERGE path (the 100 TB rollup pattern), not just the build.
    <=5% bound, same as the local tolerance stamp."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_row = per_type.select(
        F.col("event_type").alias("grain"),
        "n_events",
        "exact_users",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    merged_sk = per_type.agg(
        # SUM over zero per-type partials (empty corpus) is NULL where
        # the oracle's COUNT(*) is 0 — state the 0 explicitly
        F.coalesce(F.sum("n_events"), F.lit(0).cast("long")).alias(
            "n_events"
        ),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("approx_users"),
    )
    global_exact = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    merged = merged_sk.crossJoin(global_exact).select(
        F.lit("ALL").alias("grain"), "n_events", "exact_users", "approx_users"
    )
    both = per_row.unionByName(merged)
    ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.col("exact_users") * 0.05
    )
    return both.select(
        "grain",
        "n_events",
        "exact_users",
        F.when(F.col("exact_users") == 0, F.col("approx_users") == 0)
        .otherwise(ok)
        .cast("bigint")
        .alias("within_tol"),
    ).orderBy("grain")


_CAL_TOL_ORACLE = """
    SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p_pct,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders,
           CAST(1 AS BIGINT) AS within_tol
    ORDER BY p_pct
"""


@plan("approx_percentile_calibration_tol", _CAL_TOL_ORACLE)
def approx_percentile_calibration_tol(spark, sf_dir):
    """The accuracy=10000 calibration contract (<=1% relative error at
    p50/p90/p99 of order totals vs Spark's exact percentile) as one
    integer verdict row per quantile — p rendered as an integer
    percent so no float literal crosses engines."""
    o = load_table(spark, sf_dir, "orders")
    ps = list(_CAL_PS)
    agg = o.agg(
        F.expr(
            f"percentile(o_totalprice, array({', '.join(map(str, ps))}))"
        ).alias("exact"),
        F.percentile_approx(
            "o_totalprice", F.array(*[F.lit(p) for p in ps]), 10000
        ).alias("approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # On an EMPTY corpus both percentile aggregates return NULL (not an
    # empty array): arrays_zip(literal, NULL, NULL) is NULL and
    # explode(NULL) emits nothing, silently dropping the report's three
    # rows where the oracle keeps them. Coalesce each to an
    # all-NULL-element array so the calibration report always has one
    # row per quantile, vacuously within tolerance when there is
    # nothing to measure (the oracle's constant 1).
    null_arr = F.array(*[F.lit(None).cast("double") for _ in ps])
    pairs = agg.select(
        "n_orders",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(int(p * 100)) for p in ps]).alias("p_pct"),
                F.coalesce(F.col("exact"), null_arr).alias("exact"),
                F.coalesce(F.col("approx"), null_arr).alias("approx"),
            )
        ).alias("z"),
    )
    ok = F.abs(F.col("z.approx") - F.col("z.exact")) <= F.abs(
        F.col("z.exact")
    ) * 0.01
    return pairs.select(
        F.col("z.p_pct").cast("bigint").alias("p_pct"),
        "n_orders",
        F.coalesce(ok, F.lit(True)).cast("bigint").alias("within_tol"),
    ).orderBy("p_pct")


# ---------------------------------------------------------------------------
# Tolerance contracts for the rows-only sketch plans (VERDICT r5 ask
# #8). A sketch's output legitimately cannot hash-match a cross-engine
# oracle, but its ERROR ENVELOPE is still checkable: each entry below
# pairs an EXACT DuckDB computation with the documented bound, and the
# correctness sweep stamps `tol_ok` into CORRECTNESS_FULL.json so the
# weaker rows-only entries carry a verified tolerance instead of
# nothing. The bounds mirror the local pytest contracts
# (tests/test_sketch_and_bucketing.py / test_sketch_probe_invariants):
# 5% for the HLL-family distincts (rsd=0.02 sketches, >=3 sigma), 5%
# for approx_percentile vs interpolated exact (the actual-data-value
# vs interpolation semantic gap dominates at small group sizes), 1%
# rel_err for the accuracy=10000 calibration.
# ---------------------------------------------------------------------------


def _tol_approx_distinct(rows, exact):
    ex = {r[0]: r[1] for r in exact}
    got = {r["event_type"]: r["approx_users"] for r in rows}
    return set(got) == set(ex) and all(
        abs(got[k] - ex[k]) / ex[k] <= 0.05 for k in ex
    )


def _tol_approx_percentile(rows, exact):
    ex = {r[0]: (r[1], r[2]) for r in exact}
    got = {r["o_orderpriority"]: (r["ap50"], r["ap90"]) for r in rows}
    return set(got) == set(ex) and all(
        abs(a - e) / abs(e) <= 0.05
        for k in ex
        for a, e in zip(got[k], ex[k])
    )


def _tol_hll_mergeable(rows, exact):
    ex = {r[0]: r[1] for r in exact}
    got = {r["grain"]: r["approx_users"] for r in rows}
    return set(got) == set(ex) and all(
        abs(got[k] - ex[k]) / ex[k] <= 0.05 for k in ex
    )


def _tol_calibration(rows, exact):
    ex = {float(r[0]): float(r[1]) for r in exact}
    return all(r["rel_err"] <= 0.01 for r in rows) and all(
        abs(r["approx"] - ex[float(r["p"])]) / ex[float(r["p"])] <= 0.01
        for r in rows
    )


#: plan name -> (exact DuckDB SQL over the same tables, check(rows,
#: exact_rows) -> bool). Consumed by tools/correctness_sweep.py.
TOL_CHECKS = {
    "approx_distinct_users": (
        """
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        _tol_approx_distinct,
    ),
    "approx_percentile_prices": (
        """
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90
        FROM orders GROUP BY 1 ORDER BY 1
        """,
        _tol_approx_percentile,
    ),
    "hll_mergeable_distinct": (
        """
        SELECT event_type AS grain,
               COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY 1
        UNION ALL
        SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
        """,
        _tol_hll_mergeable,
    ),
    "approx_percentile_calibration": (
        """
        SELECT unnest([0.5, 0.9, 0.99]) AS p,
               unnest(quantile_cont(o_totalprice, [0.5, 0.9, 0.99]))
                 AS exact
        FROM orders
        """,
        _tol_calibration,
    ),
}
