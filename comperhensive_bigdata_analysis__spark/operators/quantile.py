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
) -> float:
    """Exact q-th discrete percentile of ``df[col]`` (0 < q <= 1).

    Raises ValueError on an empty input or if the final in-bucket rank
    exceeds ``final_k_cap`` (pathological tie mass — raise ``buckets``
    or the cap).
    """
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    c = F.col(col).cast("double")
    base = df.select(c.alias("v")).filter(F.col("v").isNotNull())
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not n:
        raise ValueError("exact_quantile_disc: empty input")
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
