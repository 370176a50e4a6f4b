"""Exact distributed quantiles without a global sort.

Spark's exact ``percentile`` aggregate buffers every value of a group
in executor memory, and a global ORDER BY ships the whole column
through one range shuffle — neither survives a 100 TB column. This
operator finds the EXACT discrete percentile (the value at rank
ceil(q*n), i.e. percentile_disc semantics) with:

- one COUNT + min/max pass,
- up to ``max_refine`` equi-width histogram passes, each narrowing the
  candidate range to one bucket (driver traffic = ``buckets`` counts
  per pass, data traffic = a filter-pushdown scan),
- a final parallel top-k (TakeOrdered) inside the last bucket, whose
  expected size is n / buckets^depth.

Heavy single-value buckets (massive ties) stop narrowing the range;
the loop detects a stuck bucket whose span cannot shrink (all values
equal) and returns that value immediately — ties make the answer
exact, not slower. approx_percentile remains the one-pass estimate;
this is the exact tier for when the answer must be right (SLAs,
billing thresholds, regulatory cuts).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantile_disc(
    df: DataFrame,
    col: str,
    q: float,
    buckets: int = 4096,
    max_refine: int = 4,
    final_k_cap: int = 2_000_000,
) -> float | None:
    """Exact q-th discrete percentile of ``df[col]`` (0 < q <= 1).

    Returns ``None`` on an empty input (after NULL/NaN filtering) —
    the discrete percentile of an empty set is undefined, and SQL's
    ``percentile_disc`` returns NULL there; an empty upstream filter
    result is routine in a pipeline and must not crash it. Raises
    ValueError if the final in-bucket rank exceeds ``final_k_cap``
    (pathological tie mass — raise ``buckets`` or the cap).
    """
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    c = F.col(col).cast("double")
    # NaN must go too: Spark's max ranks NaN above every double, so one
    # NaN would make hi=NaN, width=NaN, and the bucket expression NULL —
    # the histogram loop would then die on the rank invariant.
    base = df.select(c.alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not n:
        return None
    target = max(1, math.ceil(q * n))  # rank among ascending values
    remaining = base
    offset = 0  # number of values strictly below the current range

    for _ in range(max_refine):
        if lo == hi:
            return lo
        width = (hi - lo) / buckets
        if width == 0.0:  # degenerate fp span
            return lo
        bucket = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
            F.lit(buckets - 1),
        ).cast("int")
        hist = {
            r["b"]: r["cnt"]
            for r in remaining.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        cum = 0
        hit = None
        for b in range(buckets):
            cnt = hist.get(b, 0)
            if offset + cum + cnt >= target:
                hit = b
                break
            cum += cnt
        assert hit is not None  # target <= n by construction
        offset += cum
        remaining = remaining.filter(bucket == F.lit(hit))
        new_lo = lo + hit * width
        new_hi = hi if hit == buckets - 1 else lo + (hit + 1) * width
        if (new_lo, new_hi) == (lo, hi):  # cannot narrow further
            break
        lo, hi = new_lo, new_hi

    k = target - offset
    if k > final_k_cap:
        raise ValueError(
            f"exact_quantile_disc: residual rank {k} exceeds cap; "
            f"raise buckets/max_refine"
        )
    rows = remaining.orderBy("v").limit(k).agg(F.max("v").alias("v")).first()
    return rows["v"]


def grouped_exact_quantile_disc(
    df: DataFrame,
    key: str,
    col: str,
    q: float,
    buckets: int = 256,
    rounds: int = 2,
) -> DataFrame:
    """Exact per-group discrete percentile at scale: the same histogram
    refinement as exact_quantile_disc, but with ALL per-key state held
    in DataFrames — no driver loop over keys, so a million groups
    refine as cheaply as five.

    Each round: join rows to their key's refinement state, histogram on
    (key, bucket), pick each key's target bucket with a per-key running
    sum over <= ``buckets`` rows, and append the pick to the key's
    bucket-path history. Row membership is always decided by the SAME
    bucket expressions the histograms used (the (lo, width, picked_b)
    history travels in the state table), never by a derived value
    range — float rounding at bucket edges can make
    ``v BETWEEN lo AND hi`` disagree with ``floor((v-lo)/width)``, and
    any disagreement corrupts the rank bookkeeping. After ``rounds``
    rounds the residue per key is ~n_key/buckets^rounds; a final
    per-key rank window reads off the exact value. Returns (key, value).

    Spark's own exact ``percentile`` buffers every group's values in
    one aggregation buffer; this never materializes more than one
    histogram row per (key, bucket). Keys that degenerate to a single
    value (massive ties) freeze early and skip the residual sort.
    """
    from pyspark.sql.window import Window

    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    v = F.col(col).cast("double")
    # NaN filtered with NULL for the same reason as exact_quantile_disc:
    # a NaN hi poisons width and would silently drop the key's rows.
    base = df.select(F.col(key).alias("k"), v.alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    state = (
        base.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .select(
            "k",
            "lo",
            "hi",
            F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n")))
            .cast("bigint")
            .alias("target"),
            F.lit(0).cast("bigint").alias("offset"),
        )
    )

    def bucket_expr(lo_col: str, w_col: str):
        return F.least(
            F.floor((F.col("v") - F.col(lo_col)) / F.col(w_col)),
            F.lit(buckets - 1),
        ).cast("int")

    def history_filter(n_hist: int):
        cond = F.lit(True)
        for i in range(n_hist):
            cond = cond & (bucket_expr(f"h{i}_lo", f"h{i}_w") == F.col(f"h{i}_b"))
        return cond

    finished = None  # keys whose value is already exact (lo == hi)

    for r in range(rounds):
        state = state.withColumn("width", (F.col("hi") - F.col("lo")) / buckets)
        is_live = (F.col("lo") < F.col("hi")) & (F.col("width") > 0)
        newly_done = state.filter(~is_live).select("k", F.col("lo").alias("value"))
        finished = (
            newly_done if finished is None else finished.unionByName(newly_done)
        )
        state = state.filter(is_live)

        joined = base.join(state, "k").filter(history_filter(r))
        hist = joined.groupBy("k", bucket_expr("lo", "width").alias("b")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wk = Window.partitionBy("k").orderBy("b")
        cum = hist.withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cnt").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        picked = (
            cum.join(state, "k")
            .filter(
                F.col("offset") + F.col("cum_before") + F.col("cnt")
                >= F.col("target")
            )
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1)
        )
        keep_hist = [
            c
            for pair in ((f"h{i}_lo", f"h{i}_w", f"h{i}_b") for i in range(r))
            for c in pair
        ]
        state = picked.select(
            "k",
            "target",
            (F.col("offset") + F.col("cum_before")).alias("offset"),
            (F.col("lo") + F.col("b") * F.col("width")).alias("new_lo"),
            F.when(F.col("b") == buckets - 1, F.col("hi"))
            .otherwise(F.col("lo") + (F.col("b") + 1) * F.col("width"))
            .alias("new_hi"),
            F.col("lo").alias(f"h{r}_lo"),
            F.col("width").alias(f"h{r}_w"),
            F.col("b").alias(f"h{r}_b"),
            *keep_hist,
        ).withColumnsRenamed({"new_lo": "lo", "new_hi": "hi"})

    residue = base.join(state, "k").filter(history_filter(rounds))
    wv = Window.partitionBy("k").orderBy("v")
    rest = (
        residue.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == F.col("target") - F.col("offset"))
        .select("k", F.col("v").alias("value"))
    )
    out = rest if finished is None else finished.unionByName(rest)
    return out.withColumnRenamed("k", key)
