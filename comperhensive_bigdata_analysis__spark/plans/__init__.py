"""Query catalog: every operator capability as a named, oracle-checked plan.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB SQL string over the same parquet tables. The
pair is the correctness contract (SURVEY §5.2): the driver runs both and
hash-compares values, so every computed column is aliased identically on
both sides, and aggregates over doubles go through decimal casts so the
sums are EXACT (order-insensitive) and bit-identical across engines.

Two documented DOMAIN limits of that contract (r12 torture-corpus
audit, tests/test_engine_seams.py):

- The decimal-exact casts bound the value domain: DECIMAL(18,6) holds
  |x| < 1e12, and a poisoned value like 1e308 makes BOTH engines raise
  (Spark NUMERIC_VALUE_OUT_OF_RANGE, DuckDB Conversion Error) — an
  agreed, loud error, never silent divergence. Pipelines carrying
  unbounded magnitudes must range-filter before these aggregates.
- Unicode case mapping differs BETWEEN the engines on two code-point
  families: Turkish İ (U+0130) lowercases to "i"+U+0307 under the
  JVM's full Unicode mapping but to plain "i" under DuckDB's simple
  mapping, and word-final Greek Σ becomes ς on the JVM (context-
  sensitive) but σ in DuckDB. Plans whose values pass lowered text
  through hashes or length counts (simhash, quality scores) diverge
  from their oracles on text containing those code points; the Spark
  side implements the fuller Unicode semantics and is the behavior of
  record.

Import side effect: importing this package registers all plans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def plan(name: str, oracle: str | None = None):
    """Register a query plan; ``oracle`` is DuckDB SQL (None => the op is
    not SQL-expressible and gets the driver's weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from . import relational  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import vector  # noqa: E402,F401
from . import ann  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import sketch  # noqa: E402,F401
from . import stream_parity  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import behavior  # noqa: E402,F401
from . import audit  # noqa: E402,F401
from . import sqldoor  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import formats  # noqa: E402,F401
