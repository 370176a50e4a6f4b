"""The engine's query front door — the capability the reference exposed
through `PrestoConnector.execute_db_query` (ipynb:36-41): hand it SQL,
get a result frame; plus the catalog/ingest verbs around it.

Dialect notes (SURVEY §4.2): every Presto-ism the reference uses is
natively accepted by Spark SQL —
- `date('1990-01-01')` / `date(col)`: Spark's `date()` cast-function,
- ordinal `ORDER BY 2`: `spark.sql.orderByOrdinal` (on by default,
  pinned in session.RUNTIME_CONFS),
- implicit column alias without AS (`sum(x) total`): accepted.
So `sql()` is a true pass-through; translate() exists as the seam where
any future dialect rewrite would live, and currently only normalizes
whitespace. Tests (tests/test_reference_queries.py) replay the
reference's Q0-Q12 verbatim to pin this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs
from .sources.ingest import ingest_csv, ingest_folder


def translate(q: str) -> str:
    """Presto-dialect -> Spark SQL (currently identity; see module doc)."""
    return q.strip()


class Engine:
    """Session + catalog + SQL in one handle.

    Replaces the reference's PrestoConnector + helper pipeline: analysts
    get `engine.sql(q)` against tables registered once (the multi-user
    shared-copy contract of the Hive metastore, aws_utils.py:203-220).
    """

    def __init__(self, spark: SparkSession):
        self.spark = apply_runtime_confs(spark)

    # -- query surface -----------------------------------------------------
    def sql(self, q: str) -> DataFrame:
        return self.spark.sql(translate(q))

    def to_pandas(self, q: str):
        """Arrow-backed client handoff — the viz edge (S11)."""
        return self.sql(q).toPandas()

    # -- catalog -----------------------------------------------------------
    def register(self, df: DataFrame, name: str) -> None:
        df.createOrReplaceTempView(name)

    def table_exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    # -- ingest ------------------------------------------------------------
    def ingest(self, csv_path: str, **kw) -> DataFrame:
        return ingest_csv(self.spark, csv_path, **kw)

    def ingest_folder(self, folder: str, **kw):
        return ingest_folder(self.spark, folder, **kw)
