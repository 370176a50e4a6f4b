"""Vector math over array<float|double> embedding columns.

Two tiers, both JVM-side:

- Fold tier (fast path): zip_with + aggregate — a single codegen'd
  expression per row, sequential left-fold, no shuffle. Used by the
  similarity operators.
- Exact tier: posexplode + decimal-sum — order-insensitive EXACT dot
  products for oracle-checked plans (float sums are otherwise
  order-dependent and engines disagree in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot_product(a, b) -> Column:
    """Sequential-fold dot product (double accumulator)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a, b) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
