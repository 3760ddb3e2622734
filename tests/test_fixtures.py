"""Golden-fixture parity tests (FIXTURES.md F2/F3): the reference's committed
RCFile fixtures re-expressed as deterministic in-test tables, asserting the
same golden values its tests assert."""

import pyspark.sql.functions as F

SAMPLE_07 = [
    ("00-0000", "All Occupations", 134354250, 40690),
    ("11-0000", "Management occupations", 6003930, 96150),
    ("11-1011", "Chief executives", 299160, 151370),
    ("11-1021", "General and operations managers", 1655410, 103780),
    ("11-1031", "Legislators", 61110, 33880),
]


def _sample_07(spark):
    return spark.createDataFrame(
        SAMPLE_07, "code string, description string, total_emp int, salary int"
    )


def test_sample_07_golden_rows_roundtrip(spark, tmp_path):
    """F2: the 5 golden rows (HdfsSerDeImportServiceTest.java:46-50) survive
    a format write/read with explicit schema, bit-identical."""
    from hadoop_etl_udfs_spark.sources.formats import read_pages, write_table

    df = _sample_07(spark)
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"s07_{fmt}")
        write_table(df, path, fmt=fmt)
        back = read_pages(
            spark, path, fmt=fmt,
            schema="code string, description string, total_emp int, salary int",
        )
        assert sorted(tuple(r) for r in back.collect()) == sorted(SAMPLE_07), fmt


def test_sample_07_projection_reorder_duplicate(spark):
    """F2: OUTPUT_COLUMNS='salary, total_emp, description, code, salary'
    (HdfsSerDeImportServiceTest.java:54-68) — reorder + duplicate column."""
    out = _sample_07(spark).select(
        "salary", "total_emp", "description", "code",
        F.col("salary").alias("salary2"),
    )
    rows = sorted(tuple(r) for r in out.collect())
    expect = sorted((s, t, d, c, s) for (c, d, t, s) in SAMPLE_07)
    assert rows == expect


def test_complex_fixture_missing_paths_are_null(spark):
    """F3: out-of-range array index and missing map key extract as NULL, not
    an error (HdfsSerDeImportServiceTest.java:114-127 expects nulls)."""
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"K1": "v1"}, [["x"], ["y", "z"]])],
        "id long, f1 array<string>, f2 map<string,string>, f5 array<array<string>>",
    )
    # Spark 4 runs ANSI mode: plain getItem throws on out-of-range indices;
    # F.get() is the null-tolerant accessor that matches the reference's
    # missing-path -> null behavior (map getItem is already null-tolerant)
    row = df.select(
        F.get("f1", 0).alias("f1_0"),
        F.get("f1", 9).alias("f1_oob"),
        F.col("f2").getItem("K1").alias("f2_k1"),
        F.col("f2").getItem("MISSING").alias("f2_missing"),
        F.get(F.get("f5", 1), 0).alias("f5_1_0"),
        F.get(F.get("f5", 7), 0).alias("f5_oob"),
    ).collect()[0]
    assert row["f1_0"] == "a" and row["f1_oob"] is None
    assert row["f2_k1"] == "v1" and row["f2_missing"] is None
    assert row["f5_1_0"] == "y" and row["f5_oob"] is None


def test_complex_fixture_whole_column_json_render(spark):
    """F3: whole complex columns render as exact JSON strings
    (HdfsSerDeImportServiceTest.java:107-110)."""
    df = spark.createDataFrame(
        [(1, ["a", "b"], [["x"], ["y", "z"]])],
        "id long, f1 array<string>, f5 array<array<string>>",
    )
    row = df.select(
        F.to_json(F.col("f1")).alias("j1"),
        F.to_json(F.col("f5")).alias("j5"),
    ).collect()[0]
    assert row["j1"] == '["a","b"]'
    assert row["j5"] == '[["x"],["y","z"]]'


def test_pages_edge_rows_roundtrip_bit_identical(spark):
    """F1 edge rows the synthetic generator doesn't produce: empty text,
    single-byte text, nulls in text/html, all-identical lang — must survive
    the full encode->decode engine bit-identically."""
    import pyarrow as pa

    from hadoop_etl_udfs_spark.operators.encode import (
        decode_chunks,
        encode_pages,
    )

    rows = [
        ("https://e.com/empty", 1_700_000_000_000_000, b"<html></html>", "", "en"),
        ("https://e.com/one", 1_700_000_000_000_001, b"x", "x", "en"),
        ("https://e.com/nulltext", 1_700_000_000_000_002, b"<p>z</p>", None, "en"),
        ("https://e.com/nullhtml", 1_700_000_000_000_003, None, "some text", "en"),
        ("https://e.com/normal", 1_700_000_000_000_004, b"<p>hi</p>", "hi there", "en"),
    ]
    pages = spark.createDataFrame(
        [(u, ts, h, t, lg) for (u, ts, h, t, lg) in rows],
        "url string, warc_ts long, html binary, text string, lang string",
    ).withColumn("warc_ts", (F.col("warc_ts") / 1_000_000).cast("timestamp"))
    enc = encode_pages(pages, shuffle=False)
    dec = decode_chunks(enc)
    orig = {r["url"]: r for r in pages.collect()}
    back = {r["url"]: r for r in dec.collect()}
    assert set(orig) == set(back)
    for url, r in orig.items():
        b = back[url]
        assert (r["html"], r["text"], r["lang"], r["warc_ts"]) == (
            b["html"], b["text"], b["lang"], b["warc_ts"]
        ), url


def test_numeric_golden_row_f4():
    """F4 (HdfsSerDeExportServiceTest.java:44-132): the reference's numeric
    golden row — every width + a null twin per type — bit-identical through
    the codec engine."""
    from decimal import Decimal

    import pyarrow as pa

    from hadoop_etl_udfs_spark.codecs import decode_array, encode_array, verify_crc

    cols = {
        "ti": pa.array([55, None], type=pa.int8()),
        "si": pa.array([5555, None], type=pa.int16()),
        "i": pa.array([555555555, None], type=pa.int32()),
        "bi": pa.array([555555555555555555, None], type=pa.int64()),
        "f": pa.array([55.55, None], type=pa.float32()),
        "d": pa.array([55555.55555, None], type=pa.float64()),
        "dec1": pa.array(
            [Decimal("5" * 30 + "555555"), None], type=pa.decimal128(36, 0)
        ),
        "dec2": pa.array(
            [Decimal("5" * 31 + ".55555"), None], type=pa.decimal128(36, 5)
        ),
        "dec3": pa.array([Decimal("0.12345678"), None], type=pa.decimal128(8, 8)),
    }
    for name, arr in cols.items():
        enc = encode_array(arr, codec="auto")
        out = decode_array(enc.payload, enc.meta)
        assert out.equals(arr), name
        assert verify_crc(out, enc.crc32), name


def test_temporal_bool_string_golden_row_f5():
    """F5 (HdfsSerDeExportServiceTest.java:135-274): timestamps (t2 = t1
    - 6 months - 12 h), booleans, and varchar/string exactness with null
    twins, through the codec engine."""
    from datetime import datetime

    import pyarrow as pa

    from hadoop_etl_udfs_spark.codecs import decode_array, encode_array

    t1 = datetime(2015, 6, 15, 12, 30, 45, 123456)
    t2 = datetime(2014, 12, 15, 0, 30, 45, 123456)  # -6 months, -12 h
    cols = {
        "t": pa.array([t1, t2, None], type=pa.timestamp("us")),
        "b": pa.array([True, False, None]),
        "v": pa.array(["a", "aaaaaaaaaa", None], type=pa.utf8()),
    }
    for name, arr in cols.items():
        enc = encode_array(arr, codec="auto")
        out = decode_array(enc.payload, enc.meta)
        assert out.equals(arr), name
