"""S1 Avro dispatch evidence (reference: "all Hive SerDes — Parquet, ORC,
RC, Avro, JSON, text", doc/import.md:15; dynamic dispatch
HdfsSerDeImportService.java:84-85). No spark-avro jar in this runtime, so
the dispatch falls back to the pure-Python container-file reader
(sources/avro_lite.py) — these tests prove the branch moves real Avro bytes:
a committed golden file decodes value-exact, and a write->dispatch-read
round trip is bit-identical."""

import os

from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.sources.avro_lite import (
    pages_avro_schema,
    read_avro,
    write_avro,
)
from hadoop_etl_udfs_spark.sources.formats import read_pages, supported_formats

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_avro_listed_as_supported(spark):
    assert "avro" in supported_formats(spark)


def test_golden_fixture_reads_through_dispatch(spark):
    """The committed .avro binary (written once by tools/make_avro_fixture.py,
    deflate codec, 2-record blocks) decodes value-exact through the S1
    format dispatch — golden-file family, like the reference's committed
    RCFile fixtures (HdfsSerDeImportServiceTest.java:26-51)."""
    df = read_pages(spark, FIXTURE_DIR, fmt="avro")
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 5
    r = rows["https://a.example/x"]
    assert bytes(r["html"]) == b"<html>\x00\xff</html>"
    assert r["text"] == "hello world" and r["lang"] == "en"
    assert r["warc_ts"].isoformat().startswith("2020-09-13")
    assert bytes(rows["https://d.example/w"]["html"]) == bytes(range(256))
    assert rows["https://b.example/y"]["html"] == bytearray(b"")
    assert rows["https://c.example/z"]["text"] == "grüß gott — ümläut"


def test_avro_roundtrip_bit_identical(spark, tmp_path):
    """pages -> avro files (one per lang, multi-file read) -> dispatch read:
    full-row fingerprint identical (north-rule style gate)."""
    from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 200, seed=11).cache()
    avro_dir = str(tmp_path / "avro_pages")
    os.makedirs(avro_dir)
    rows = pages.collect()
    schema = pages_avro_schema()
    by_lang: dict[str, list] = {}
    for r in rows:
        epoch_us = int(r["warc_ts"].timestamp() * 1_000_000)
        by_lang.setdefault(r["lang"], []).append(
            {"url": r["url"], "warc_ts": epoch_us,
             "html": bytes(r["html"]), "text": r["text"], "lang": r["lang"]}
        )
    for lang, lrows in by_lang.items():
        write_avro(os.path.join(avro_dir, f"{lang}.avro"), schema, lrows,
                   codec="null", records_per_block=37)
    got = read_pages(spark, avro_dir, fmt="avro")

    def fp(df):
        return df.select(
            F.bit_xor(F.xxhash64("url", "warc_ts", "html", "text", "lang"))
            .alias("h")
        ).collect()[0]["h"]

    assert got.count() == 200
    assert fp(got) == fp(pages)
    pages.unpersist()


def test_avro_lite_property_roundtrip(tmp_path):
    """Property test: arbitrary rows over the full supported type matrix
    round-trip exactly through both codecs and any block size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "l", "type": ["null", "long"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": ["null", "bytes"]},
            {"name": "f", "type": "boolean"},
            {"name": "i", "type": "int"},
        ],
    }
    row_st = st.fixed_dictionaries({
        "s": st.text(max_size=40),
        "l": st.none() | st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        "d": st.floats(allow_nan=False, width=64),
        "b": st.none() | st.binary(max_size=40),
        "f": st.booleans(),
        "i": st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
    })

    @settings(max_examples=40, deadline=None)
    @given(
        rows=st.lists(row_st, max_size=25),
        codec=st.sampled_from(["null", "deflate"]),
        per_block=st.integers(min_value=1, max_value=7),
    )
    def roundtrip(rows, codec, per_block):
        p = str(tmp_path / "prop.avro")
        write_avro(p, schema, rows, codec=codec, records_per_block=per_block)
        _, back = read_avro(p)
        assert back == rows

    roundtrip()


def test_write_table_avro_fallback_roundtrip(spark, tmp_path):
    """S6 symmetry: write_table(fmt='avro') dispatches to the pure-Python
    container-file sink when spark-avro is absent (one file per partition),
    and the dispatch read gets the rows back fingerprint-identical."""
    from hadoop_etl_udfs_spark.sources.formats import write_table
    from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 120, seed=13).repartition(3).cache()
    out = str(tmp_path / "avro_sink")
    write_table(pages, out, fmt="avro")
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 3  # one container file per partition
    got = read_pages(spark, out, fmt="avro")

    def fp(df):
        return df.select(
            F.bit_xor(F.xxhash64("url", "warc_ts", "html", "text", "lang"))
            .alias("h")
        ).collect()[0]["h"]

    assert got.count() == 120 and fp(got) == fp(pages)
    # overwrite replaces; unsupported sink options fail loud
    write_table(pages.limit(10).coalesce(1), out, fmt="avro")
    assert read_pages(spark, out, fmt="avro").count() == 10
    import pytest

    with pytest.raises(ValueError, match="fallback sink"):
        write_table(pages, out, fmt="avro", partition_by=["lang"])
    with pytest.raises(ValueError, match="modes overwrite"):
        write_table(pages, out, fmt="avro", mode="append")
    with pytest.raises(FileExistsError):
        write_table(pages, out, fmt="avro", mode="errorifexists")
    # Spark's ignore contract: no-op when the target exists, write if absent
    write_table(pages, out, fmt="avro", mode="ignore")
    assert read_pages(spark, out, fmt="avro").count() == 10  # unchanged
    fresh = str(tmp_path / "avro_fresh")
    write_table(pages.limit(5).coalesce(1), fresh, fmt="avro", mode="ignore")
    assert read_pages(spark, fresh, fmt="avro").count() == 5
    pages.unpersist()


def test_encode_value_union_mismatch_is_diagnosable(tmp_path):
    """None for a non-nullable field raises a ValueError naming the problem,
    not a bare StopIteration/AttributeError."""
    import pytest

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": ["long", "string"]}],
    }
    with pytest.raises(ValueError, match="fits no branch"):
        write_avro(str(tmp_path / "bad.avro"), schema, [{"v": None}])
    schema2 = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": "string"}],
    }
    with pytest.raises(ValueError, match="non-nullable"):
        write_avro(str(tmp_path / "bad2.avro"), schema2, [{"v": None}])


def test_avro_lite_union_nulls(tmp_path):
    """Nullable fields via [null, T] unions — Avro's standard null idiom."""
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": ["null", "long"]},
            {"name": "b", "type": ["null", "bytes"]},
        ],
    }
    rows = [
        {"k": "a", "v": 1, "b": b"\x01"},
        {"k": "b", "v": None, "b": None},
        {"k": "c", "v": -(1 << 62), "b": b""},
    ]
    p = str(tmp_path / "u.avro")
    write_avro(p, schema, rows)
    _, back = read_avro(p)
    assert back == rows
