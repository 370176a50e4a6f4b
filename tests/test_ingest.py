"""Ingestion property tests (SURVEY §5.2 #3): round-trip preservation,
sanitizer idempotence, all-NULL column drop, eager timestamp coercion,
and the exact ±2**30 int-width rule of the reference
(helper_utils.py:27-36, 88-95, 105-110)."""

from __future__ import annotations

import csv
import os

import pytest

from comperhensive_bigdata_analysis__spark.sources.ingest import (
    INT_WIDTH_BOUND,
    ingest_csv,
    ingest_folder,
    preprocess,
    sanitize_columns,
    sanitize_name,
    table_name_for,
)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvs")
    rows = [
        # headers with spaces/hyphens/specials; all-null col; date col;
        # small and large ints (around +/-2**30)
        ["NUTS level", "Code-2021", "all null!", "commissioning date",
         "small_int", "big int", "capacity (MW)"],
        ["1", "DE1", "", "2011-12-16", "123", str(2**30 + 5), "1.5"],
        ["2", "DE21", "", "2015-01-02", "-456", str(-(2**31) + 7), "2.75"],
        ["3", "DE212", "", "1999-07-31", "789", "42", "0.25"],
    ]
    p = d / "Power Plants-DE.csv"
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(d)


def test_sanitize_name_semantics():
    assert sanitize_name("NUTS level") == "NUTS_level"
    assert sanitize_name("capacity (MW)") == "capacity_MW_"
    assert sanitize_name("a--b  c") == "a_b_c"
    # idempotence
    for s in ("NUTS level", "a!!b", "x__y", "ok_name"):
        assert sanitize_name(sanitize_name(s)) == sanitize_name(s)


def test_table_name_for():
    assert table_name_for("/data/Power Plants-DE.csv") == "power_plants_de"


def test_ingest_semantics(spark, csv_dir):
    df = ingest_csv(
        spark, os.path.join(csv_dir, "Power Plants-DE.csv"), register_view=True
    )
    cols = dict(df.dtypes)
    # all-NULL column dropped (helper_utils.py:88-90)
    assert not any("null" in c for c in cols)
    # names sanitized
    assert "NUTS_level" in cols and "Code_2021" in cols and "capacity_MW_" in cols
    # string date column coerced to timestamp (helper_utils.py:91-95)
    assert cols["commissioning_date"] == "timestamp"
    # +/-2**30 widening rule (helper_utils.py:105-110)
    assert cols["small_int"] == "int"
    assert cols["big_int"] == "bigint"
    # row count preserved
    assert df.count() == 3
    # registered in catalog
    assert spark.catalog.tableExists("power_plants_de")
    got = spark.sql(
        "SELECT Code_2021 FROM power_plants_de WHERE NUTS_level = 2"
    ).first()[0]
    assert got == "DE21"


def test_int_bound_is_exactly_2_pow_30(spark):
    df = spark.createDataFrame(
        [(INT_WIDTH_BOUND - 1, INT_WIDTH_BOUND)], "at_bound long, over long"
    )
    from comperhensive_bigdata_analysis__spark.sources.ingest import _narrow_ints

    out = dict(_narrow_ints(df).dtypes)
    assert out["at_bound"] == "int"  # strictly inside (-2**30, 2**30)
    assert out["over"] == "bigint"  # max == 2**30 -> NOT narrowed


def test_preprocess_keeps_non_datetime_strings(spark):
    df = spark.createDataFrame(
        [("DE1", "2011-12-16"), ("not a date", "2012-01-01")], "a string, b string"
    )
    out = dict(preprocess(df).dtypes)
    assert out == {"a": "string", "b": "timestamp"}


def test_folder_ingest_registry(spark, csv_dir, tmp_path):
    reg = ingest_folder(spark, csv_dir, parquet_dir=str(tmp_path / "pq"))
    assert "power_plants_de" in reg
    names = [c for c, _ in reg["power_plants_de"]]
    assert "commissioning_date" in names
    # parquet round-trip happened
    assert os.path.isdir(str(tmp_path / "pq" / "power_plants_de"))


def test_union_evolving_aligns_drifted_schemas(spark):
    from comperhensive_bigdata_analysis__spark.sources.ingest import union_evolving

    v1 = spark.createDataFrame([(1, "a")], "id: int, name: string")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id: int, name: string, score: double")
    v3 = spark.createDataFrame([(3, 7.5)], "id: bigint, score: double")  # name dropped
    out = union_evolving([v1, v2, v3]).orderBy("id")
    assert out.columns == ["id", "name", "score"]  # first frame order + appends
    assert dict(out.dtypes)["id"] == "bigint"  # int widened by v3
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, "a", None), (2, "b", 9.5), (3, None, 7.5)]


def test_union_evolving_rejects_incompatible_drift(spark):
    import pytest as _pytest

    from comperhensive_bigdata_analysis__spark.sources.ingest import union_evolving

    a = spark.createDataFrame([(1,)], "x: int")
    b = spark.createDataFrame([(["nope"],)], "x: array<string>")
    with _pytest.raises(Exception):
        union_evolving([a, b]).collect()


def test_format_roundtrips(spark, tmp_path):
    """orders survives parquet/json/orc/csv round-trips value-intact
    (csv via explicit schema — inference would re-derive types)."""
    import pytest as _pytest

    from comperhensive_bigdata_analysis__spark.sources.formats import (
        read_table,
        write_table,
    )
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    # deterministic subset — an unordered limit() re-executes differently
    # per job, so the written rows could differ from the collected ones
    src = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
        "o_orderkey < 200"
    )
    key = lambda rows: sorted(map(str, rows))  # noqa: E731 — null-safe sort
    want = key(tuple(r) for r in src.collect())
    for fmt in ("parquet", "json", "orc", "csv"):
        p = str(tmp_path / f"rt_{fmt}")
        write_table(src, p, fmt)
        back = read_table(spark, p, fmt, schema=src.schema)
        assert key(tuple(r) for r in back.collect()) == want, fmt
    with _pytest.raises(ValueError):
        write_table(src, str(tmp_path / "x"), "avro")


def test_csv_roundtrip_text_lossless(spark, tmp_path):
    """CSV round-trips hostile text BYTE-VERBATIM (r13 torture-corpus
    findings, each a silent default-lossy case in stock Spark CSV):
    embedded newlines misparse without multiLine; the WRITER Java-trims
    leading/trailing chars <= U+0020 (spaces, tabs, \\x01 control
    bytes) unless told not to; NULL and '' conflate without the \\N
    sentinel; \\r and quotes must survive quoting."""
    from comperhensive_bigdata_analysis__spark.sources.formats import (
        read_table,
        write_table,
    )

    rows = [
        (1, "line\nbreak\ttab\rcarriage end"),
        (2, "   leading spaces"),
        (3, "trailing spaces   "),
        (4, " "),
        (5, "\t\n  \t"),
        (6, ""),
        (7, None),
        (8, 'quote"inside and, comma'),
        (9, "\x01control\x02chars\x03 here"),
    ]
    src = spark.createDataFrame(rows, "doc_id: long, text: string")
    p = str(tmp_path / "lossless_csv")
    write_table(src, p, "csv")
    back = read_table(spark, p, "csv", schema=src.schema)
    got = {r.doc_id: r.text for r in back.collect()}
    want = dict(rows)
    assert got == want, {
        k: (want[k], got.get(k)) for k in want if got.get(k) != want[k]
    }

    # Documented seam, same as Hive text tables: a LITERAL \N in the
    # data is indistinguishable from NULL (quoting doesn't help —
    # Spark's writer escape turns both into the same bytes). Pinned so
    # a Spark upgrade that starts disambiguating breaks this and the
    # seam note gets removed.
    lit = spark.createDataFrame([(1, "\\N")], "doc_id: long, text: string")
    p2 = str(tmp_path / "sentinel_csv")
    write_table(lit, p2, "csv")
    assert read_table(spark, p2, "csv", schema=lit.schema).collect()[0].text is None


def test_audited_ingest_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE + corrupt-record capture: clean rows parse under the
    declared schema, malformed rows come back verbatim for replay."""
    from comperhensive_bigdata_analysis__spark.sources.ingest import (
        ingest_csv_audited,
    )

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,amount,when\n"
        "1,10.5,2024-01-01T00:00:00\n"
        "2,not_a_number,2024-01-02T00:00:00\n"
        "3,30.25,2024-01-03T00:00:00\n"
        "4,40.0,never\n"
    )
    clean, rejects = ingest_csv_audited(
        spark, str(p), "id INT, amount DOUBLE, when TIMESTAMP", table="dirty"
    )
    assert clean.count() == 2
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1, 3]
    bad = sorted(r["raw_line"] for r in rejects.collect())
    assert len(bad) == 2
    assert any("not_a_number" in b for b in bad)
    assert any("never" in b for b in bad)
    # registered and queryable
    assert spark.table("dirty").count() == 2
