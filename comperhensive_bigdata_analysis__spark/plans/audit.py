"""Statistical data-audit plans: Benford first-digit conformance,
two-period distribution drift, and A/B conversion testing.

These extend the reference's data-quality posture (its only checks are
shape probes and NaN scans, ``helper_utils.py:88-95``) to the audits a
production pipeline runs before trusting a 100 TB table. Determinism
contract: every float that reaches the oracle comparison is produced by
IEEE-deterministic ops only (+, -, *, /, sqrt, floor on identical
operands) or is a shared parsed literal — no engine-side transcendental
functions (log/exp/pow), whose last-ULP rounding differs across libm
implementations.

Scale notes per plan are inline; all three are scan -> small-group
aggregate shapes with map-side partial combine and O(10)-row results.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from . import plan

# log10(1 + 1/d) embedded as repr literals: both engines parse the same
# shortest-round-trip decimal string to the same double, so "expected"
# is bit-identical without either engine calling log10 at runtime.
_BENFORD = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}

_BENFORD_ORACLE = f"""
    WITH digits AS (
      SELECT SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS digit,
             COUNT(*) AS n
      FROM orders
      WHERE o_totalprice >= 1
      GROUP BY 1
    )
    SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS observed,
           CASE digit
             {" ".join(f"WHEN '{d}' THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items())}
           END AS expected,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
             - CASE digit
                 {" ".join(f"WHEN '{d}' THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items())}
               END AS deviation
    FROM digits
    ORDER BY digit
"""


@plan("benford_digit_audit", _BENFORD_ORACLE)
def benford_digit_audit(spark, sf_dir):
    """First-significant-digit census of order totals vs Benford's law.

    Reference parity: generalizes the notebook's eyeball-the-aggregates
    validation (SURVEY §5.1) into a statistical audit. FLOOR + bigint +
    string head extracts the digit without log10 (cast of double to
    bigint truncates in Spark but ROUNDS in DuckDB — FLOOR first makes
    both exact). 100 TB: one scan, 9 groups, partial agg map-side; the
    window total runs on 9 rows.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.groupBy(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    expected = F.create_map(
        *[x for d, v in _BENFORD.items() for x in (F.lit(str(d)), F.lit(float(v)))]
    )[F.col("digit")]
    total = F.sum("n").over(Window.partitionBy())
    observed = F.col("n").cast("double") / total.cast("double")
    return digits.select(
        "digit",
        "n",
        observed.alias("observed"),
        expected.alias("expected"),
        (observed - expected).alias("deviation"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# Two-period distribution drift over fixed price buckets — the PSI
# (population stability index) report shape, minus the log term (kept
# out of the compared output for cross-engine determinism; a consumer
# computes sum((p-q)*ln(p/q)) from the p/q columns trivially). Fixed
# literal bucket edges mean the bucketing is a pure map; the compare is
# a 10-row join-free conditional aggregate.
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "1998-01-01"
_DRIFT_WIDTH = 50000.0
_DRIFT_ORACLE = f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / {_DRIFT_WIDTH!r}) AS BIGINT), 9)
               AS bucket,
             CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END
               AS in_a
      FROM orders
    ),
    agg AS (
      SELECT bucket,
             CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - in_a) AS BIGINT) AS n_b
      FROM b GROUP BY 1
    )
    SELECT bucket, n_a, n_b,
           CAST(n_a AS DOUBLE) / CAST(SUM(n_a) OVER () AS DOUBLE) AS p,
           CAST(n_b AS DOUBLE) / CAST(SUM(n_b) OVER () AS DOUBLE) AS q,
           CAST(n_a AS DOUBLE) / CAST(SUM(n_a) OVER () AS DOUBLE)
             - CAST(n_b AS DOUBLE) / CAST(SUM(n_b) OVER () AS DOUBLE) AS p_minus_q,
           (CAST(n_a AS DOUBLE) / CAST(SUM(n_a) OVER () AS DOUBLE))
             / (CAST(n_b AS DOUBLE) / CAST(SUM(n_b) OVER () AS DOUBLE)) AS p_over_q
    FROM agg
    ORDER BY bucket
"""


@plan("price_drift_buckets", _DRIFT_ORACLE)
def price_drift_buckets(spark, sf_dir):
    """Order-price distribution, early period (< 1998) vs late, over ten
    fixed 50k-wide buckets: per-bucket share in each period plus their
    difference and ratio.

    100 TB: single scan of orders; bucket + period flags are map-side
    expressions; the aggregate has 10 groups (partial combine collapses
    each input partition to <=10 rows before the one exchange); the
    share windows run on the 10-row aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(_DRIFT_WIDTH)).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bucket"),
        F.when(F.col("o_orderdate") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    agg = b.groupBy("bucket").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("n_b"),
    )
    w = Window.partitionBy()
    # try_divide, not /: a period with zero orders (all-early or
    # all-late data) zeroes a share denominator, and a bucket with no
    # late-period rows zeroes q for p_over_q — ANSI `/` would crash the
    # plan where DuckDB (and the oracle) return NULL (r12 null-corpus
    # audit; the p_over_q case is reachable on ordinary skewed data).
    p = F.try_divide(F.col("n_a").cast("double"), F.sum("n_a").over(w).cast("double"))
    q = F.try_divide(F.col("n_b").cast("double"), F.sum("n_b").over(w).cast("double"))
    return agg.select(
        "bucket",
        "n_a",
        "n_b",
        p.alias("p"),
        q.alias("q"),
        (p - q).alias("p_minus_q"),
        F.try_divide(p, q).alias("p_over_q"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# A/B conversion z-test — users split into two deterministic arms by
# user_id parity; conversion = user emitted >= 1 purchase event with
# value > 150 (threshold keeps both arms away from the degenerate
# pooled-rate 0/1 edge at every test scale factor). The
# two-proportion pooled z statistic uses only IEEE-deterministic ops
# (sqrt is correctly rounded per IEEE 754, unlike log/exp).
# ---------------------------------------------------------------------------

_AB_ORACLE = """
    WITH per_user AS (
      SELECT user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events
      GROUP BY user_id
    ),
    arms AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS c0,
        SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS c1
      FROM per_user
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
           CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
           (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
              - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / SQRT(
                 (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                 * (1 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                 * (1 / CAST(n0 AS DOUBLE) + 1 / CAST(n1 AS DOUBLE))
               ) AS z
    FROM arms
"""


@plan("ab_conversion_z", _AB_ORACLE)
def ab_conversion_z(spark, sf_dir):
    """Two-proportion pooled z-statistic for purchase conversion between
    user_id-parity arms.

    Reference parity: the notebook's only inferential statistic is the
    Prophet MAPE (``ipynb:1057``); this adds the experiment-analysis
    primitive a pipeline needs. 100 TB: one exchange on user_id for the
    per-user conversion flag (map-side partial MAX), then a single
    all-reduce to one row; the scalar algebra runs on the driver row.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("converted")
    )
    arm = F.col("user_id") % 2
    arms = per_user.agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(arm == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(arm == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    # try_divide throughout: an empty arm (n0 or n1 = 0) or a
    # degenerate pooled rate (all/none converted -> sqrt term 0) would
    # crash ANSI `/` where DuckDB — and the oracle — return NULL. Both
    # states are reachable on real data, not just the null-corpus
    # audit: a single-arm backfill or a zero-conversion window.
    p0 = F.try_divide(F.col("c0").cast("double"), F.col("n0").cast("double"))
    p1 = F.try_divide(F.col("c1").cast("double"), F.col("n1").cast("double"))
    pooled = F.try_divide(
        (F.col("c0") + F.col("c1")).cast("double"),
        (F.col("n0") + F.col("n1")).cast("double"),
    )
    z = F.try_divide(
        p0 - p1,
        F.sqrt(
            pooled
            * (1 - pooled)
            * (
                F.try_divide(F.lit(1.0), F.col("n0").cast("double"))
                + F.try_divide(F.lit(1.0), F.col("n1").cast("double"))
            )
        ),
    )
    return arms.select(
        "n0",
        "n1",
        "c0",
        "c1",
        p0.alias("p0"),
        p1.alias("p1"),
        z.alias("z"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence audit between order priority and status. All
# inputs are exact BIGINT counts; each cell's (o-e)^2/e term is IEEE
# arithmetic on identical operands — but the TERMS must not be summed
# as raw doubles (double addition isn't associative and neither engine
# guarantees an order), and they must not detour through a wide decimal
# either (the engines' double<->decimal conversions disagree beyond
# ~15 digits — see the cast-discipline note on autocorr_lag7_revenue).
# Deterministic fold: DYADIC FIXED-POINT. term * 2^20 is an exact
# exponent shift, FLOOR of it is an integer-valued double, and adding
# integer-valued doubles (totals << 2^53) is EXACT, hence order-free;
# the final /2^20 is again exact scaling. The statistic loses only
# sub-2^-20 precision, identically in both engines.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT r, c, o,
             SUM(o) OVER (PARTITION BY r) AS rt,
             SUM(o) OVER (PARTITION BY c) AS ct,
             SUM(o) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT r, c,
             CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e,
             CAST(o AS DOUBLE) AS od
      FROM m
    )
    SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols,
           CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT)
             AS dof,
           CAST(SUM(CAST(FLOOR((od - e) * (od - e) / e * 1048576) AS BIGINT))
                AS DOUBLE) / 1048576 AS chi2
    FROM terms
"""


@plan("chi2_priority_status", _CHI2_ORACLE)
def chi2_priority_status(spark, sf_dir):
    """Pearson chi-square statistic (plus table shape and degrees of
    freedom) for independence of order priority and order status.

    100 TB: one scan collapses to the |priorities| x |statuses|
    contingency table via map-side combine; the margin windows and the
    term fold run on those ~15 cells.
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    ).agg(F.count(F.lit(1)).alias("obs"))
    m = cells.select(
        "r",
        "c",
        "obs",
        F.sum("obs").over(Window.partitionBy("r")).alias("rt"),
        F.sum("obs").over(Window.partitionBy("c")).alias("ct"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast(
        "double"
    )
    od = F.col("obs").cast("double")
    terms = m.select(
        "r",
        "c",
        F.floor((od - e) * (od - e) / e * F.lit(1048576))
        .cast("bigint")
        .alias("term_fp"),
    )
    return terms.agg(
        F.countDistinct("r").cast("bigint").alias("n_rows"),
        F.countDistinct("c").cast("bigint").alias("n_cols"),
        ((F.countDistinct("r") - 1) * (F.countDistinct("c") - 1))
        .cast("bigint")
        .alias("dof"),
        (F.sum("term_fp").cast("double") / F.lit(1048576.0)).alias("chi2"),
    )
