"""Query catalog: every operator capability as a named, oracle-checked plan.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB SQL string over the same parquet tables. The
pair is the correctness contract (SURVEY §5.2): the driver runs both and
hash-compares values, so every computed column is aliased identically on
both sides, and aggregates over doubles go through decimal casts so the
sums are EXACT (order-insensitive) and bit-identical across engines.

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
