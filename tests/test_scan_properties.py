"""Property tests for the skew-safe scan operators (round 10): on
arbitrary small frames — nullable keys, duplicate keys, negative and
null values, any k/salts — salted_top_k and distributed_scan must be
indistinguishable from the bare windows they replace. The example
tests in test_skew_shapes.py pin the hot-key shapes; these pin the
long tail of inputs a 100 TB corpus will eventually contain.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comperhensive_bigdata_analysis__spark.operators.skew import (
    distributed_scan,
    ntile_from_rank,
    salted_top_k,
)

# (key | NULL, value) rows; i is appended per-row as the unique
# order tiebreak the operators' total-order contract requires.
row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["a", "b", "hot"])),
    st.one_of(st.none(), st.integers(min_value=-1_000, max_value=1_000)),
)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)],
        "k string, i long, v long",
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row, min_size=1, max_size=25),
       k=st.integers(min_value=1, max_value=4),
       salts=st.sampled_from([1, 3, 64]))
def test_salted_top_k_property(spark, rows, k, salts):
    df = _frame(spark, rows)
    got = sorted(
        map(tuple, salted_top_k(df, ["k"], ["i"], k, salts=salts).collect()),
        key=str,
    )
    w = Window.partitionBy("k").orderBy("i")
    want = sorted(
        map(
            tuple,
            df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .collect(),
        ),
        key=str,
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row, min_size=1, max_size=25))
def test_distributed_scan_property(spark, rows):
    df = _frame(spark, rows)
    got = sorted(
        map(
            tuple,
            distributed_scan(
                df, ["k"], ["i"], rank_col="r",
                prior_sum_of="v", prior_col="p", total_count_col="c",
            ).collect(),
        ),
        key=str,
    )
    w = Window.partitionBy("k").orderBy("i")
    want = sorted(
        map(
            tuple,
            df.select(
                "k", "i", "v",
                F.row_number().over(w).cast("long").alias("r"),
                F.coalesce(
                    F.sum("v").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).alias("p"),
                F.count(F.lit(1)).over(Window.partitionBy("k")).alias("c"),
            ).collect(),
        ),
        key=str,
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row, min_size=1, max_size=25),
       n=st.integers(min_value=1, max_value=7))
def test_ntile_from_rank_property(spark, rows, n):
    df = _frame(spark, rows)
    w = Window.partitionBy("k").orderBy("i")
    both = df.select(
        "k", "i",
        F.row_number().over(w).cast("long").alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("__c"),
        F.ntile(n).over(w).cast("long").alias("want"),
    ).withColumn("got", ntile_from_rank(n, "__r", "__c"))
    assert both.filter(F.col("got") != F.col("want")).count() == 0
