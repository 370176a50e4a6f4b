"""The Python-UDF escape hatch, demonstrated the right way (SURVEY
§2.11): Arrow-vectorized pandas_udf tiers with JVM-expression twins.

Policy: hot paths use the JVM twin (whole-stage codegen); the pandas
tier exists for logic Spark expressions can't say (real BPE tokenizers,
model scoring) and is always Arrow-batched — never row-at-a-time
Python. Tests pin tier agreement so swapping tiers is behavior-neutral.

- bpe_ish_token_count: GPT-style token estimate — word pieces + digit
  runs + non-space symbols. Scalar pandas_udf vs JVM regexp_count.
- geo_mean (GROUPED_AGG pandas_udf) vs exp(avg(ln)) JVM twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

#: One "token" per word piece of <=4 letters, digit run, or symbol —
#: a deterministic stand-in for a BPE vocabulary's piece lengths.
BPE_ISH_PATTERN = r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count_jvm(col) -> Column:
    """JVM twin: regexp_count inside codegen — the hot-path tier."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


# DataType instances, not DDL strings: string types are parsed at
# decoration time and would demand a live SparkSession at import.
@pandas_udf(T.IntegerType())
def bpe_ish_token_count_py(s: pd.Series) -> pd.Series:
    """Scalar pandas_udf tier: vectorized pandas str.count per Arrow
    batch. Swap the regex for a real tokenizer (tiktoken et al.) here —
    the Spark-side contract (types, batching) stays identical."""
    return s.str.count(BPE_ISH_PATTERN).fillna(0).astype("int32")


def geo_mean_jvm(col) -> Column:
    """JVM twin of the grouped-agg UDF: exp(avg(ln(x))) over positive x."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.avg(F.log(c)))


@pandas_udf(T.DoubleType())
def geo_mean_py(v: pd.Series) -> float:
    """GROUPED_AGG pandas_udf: one numpy reduction per group partition.
    Spark feeds each group's values as a Series; partial aggregation
    does NOT apply (unlike JVM avg), so prefer the JVM twin unless the
    reduction genuinely needs Python."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


# ---------------------------------------------------------------------------
# UDTF: the table-function leg of the U*F family (UDF / UDAF / UDTF).
# Same overlapping-token-window semantics as the codegen chunker in
# plans/training.py:doc_chunks (size/stride constants shared); use THIS
# when chunk logic needs real Python (sentence-aware splitters, BPE
# budgets), the JVM plan when it doesn't. Registered per-session via
# register_chunk_udtf and invoked with LATERAL in SQL.
# ---------------------------------------------------------------------------


def make_chunk_udtf():
    """Build the UDTF class lazily (the decorator needs no session, but
    keeping construction in a function mirrors the pandas_udf policy)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, n_tokens: int, chunk: string")
    class ChunkDocUDTF:
        def eval(self, text: str, size: int, stride: int):
            toks = (text or "").strip().lower().split()
            if not toks:
                yield 0, 0, ""
                return
            for i, s in enumerate(range(0, len(toks), stride)):
                piece = toks[s : s + size]
                yield i, len(piece), " ".join(piece)

    return ChunkDocUDTF


def register_chunk_udtf(spark, name: str = "chunk_doc"):
    """Register for SQL use:
    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_doc(d.text, 50, 40) c
    """
    spark.udtf.register(name, make_chunk_udtf())
    return name
