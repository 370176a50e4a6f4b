"""JDBC wrappers (S9/S10): no driver jar ships in this container, so
these tests pin the option-plumbing layer — the reader/writer must be
constructed with our options and fail only at connection time with the
driver error, proving the Spark JDBC path is wired correctly."""

from __future__ import annotations

import pytest

from comperhensive_bigdata_analysis__spark.sources.jdbc import read_jdbc, write_jdbc


def test_read_jdbc_fails_at_driver_not_at_plumbing(spark):
    with pytest.raises(Exception) as e:
        read_jdbc(
            spark,
            "jdbc:mysql://localhost:3306/nodb",
            "some_table",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        )
    assert "driver" in str(e.value).lower()


def test_write_jdbc_fails_at_driver_not_at_plumbing(spark, sf_dir):
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as e:
        write_jdbc(df, "jdbc:mysql://localhost:3306/nodb", "nation_copy")
    assert "driver" in str(e.value).lower()
