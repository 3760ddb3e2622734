"""Multi-format source/sink parity (reference S1: Parquet, ORC, RC, Avro,
JSON, text — doc/import.md:15; RC covered by ORC, Avro detected at runtime)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.sources.formats import (
    read_pages,
    supported_formats,
    write_table,
)
from hadoop_etl_udfs_spark.sources.pages import synthesize_pages


def test_supported_formats(spark):
    fmts = supported_formats(spark)
    assert {"parquet", "orc", "json", "csv"} <= set(fmts)


def test_roundtrip_all_formats(spark):
    base = tempfile.mkdtemp(prefix="fmt_")
    # text columns only (binary doesn't survive csv/json textual formats)
    pages = (
        synthesize_pages(spark, 300, seed=9)
        .select("url", "text", "lang")
        .cache()
    )
    fp = lambda df: df.select(
        F.bit_xor(F.xxhash64("url", "text", "lang")).alias("h")
    ).collect()[0]["h"]
    want = fp(pages)
    try:
        for fmt in ["parquet", "orc", "json", "csv", "avro"]:
            p = os.path.join(base, fmt)
            write_table(pages, p, fmt=fmt)
            got = read_pages(spark, p, fmt=fmt, schema="url string, text string, lang string")
            assert fp(got) == want, fmt
        # text format: single-column lines (S1's TextInputFormat role)
        p = os.path.join(base, "text")
        write_table(pages.select(F.col("url").alias("value")), p, fmt="text")
        got_urls = {r["value"] for r in read_pages(spark, p, fmt="text").collect()}
        assert got_urls == {r["url"] for r in pages.collect()}
        # binary columns survive the columnar formats
        full = synthesize_pages(spark, 200, seed=9).cache()
        for fmt in ["parquet", "orc"]:
            p = os.path.join(base, f"full_{fmt}")
            write_table(full, p, fmt=fmt, compression="snappy" if fmt == "parquet" else None)
            got = read_pages(spark, p, fmt=fmt)
            assert got.count() == 200
            h1 = full.select(F.bit_xor(F.xxhash64(*full.columns)).alias("h")).collect()[0]["h"]
            h2 = got.select(F.bit_xor(F.xxhash64(*got.columns)).alias("h")).collect()[0]["h"]
            assert h1 == h2, fmt
    finally:
        shutil.rmtree(base, ignore_errors=True)
        pages.unpersist()


def test_partitioned_write_prunes(spark):
    """Hive-style directory partitioning + partition pruning (reference P5/P7:
    MultiPartitionFilter + path-derived values)."""
    base = tempfile.mkdtemp(prefix="part_")
    try:
        pages = synthesize_pages(spark, 1000, seed=4)
        write_table(pages, base + "/t", fmt="parquet", partition_by=["lang"])
        got = spark.read.parquet(base + "/t")
        one = got.filter(F.col("lang") == "en")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
        assert one.count() == pages.filter(F.col("lang") == "en").count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_schema_evolution_old_files_read_null(spark, tmp_path):
    """Files written before a column was added must read as NULL for that
    column (HdfsSerDeImportService.java:190-194: table columns missing from
    a file's schema come back null). Mixed-schema sink: one pre-evolution
    file + one post-evolution file, read with the evolved explicit schema."""
    from hadoop_etl_udfs_spark.sources.formats import read_pages, write_table

    sink = str(tmp_path / "evolved")
    old = spark.createDataFrame(
        [("u1", "hello"), ("u2", "world")], "url string, text string"
    )
    write_table(old, sink, fmt="parquet", mode="overwrite")
    new = spark.createDataFrame(
        [("u3", "bonjour", "fr")], "url string, text string, lang string"
    )
    write_table(new, sink, fmt="parquet", mode="append")
    out = read_pages(
        spark, sink, fmt="parquet", schema="url string, text string, lang string"
    )
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["u1"]["lang"] is None and rows["u2"]["lang"] is None
    assert rows["u3"]["lang"] == "fr"
    # evolved column still filterable (null-safe predicates over old files)
    assert out.filter("lang IS NULL").count() == 2


def test_ddl_pre_statements_before_export(spark, tmp_path):
    """S11: DDL pre-statements run against the session catalog before the
    export writes (the reference prepares the Hive target with user DDL)."""
    from hadoop_etl_udfs_spark.sources.formats import export_with_ddl, read_pages

    src = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    src.createOrReplaceTempView("_export_src")
    sink = str(tmp_path / "ddl_sink")
    export_with_ddl(
        spark,
        "_export_target",
        sink,
        pre_statements=[
            "CREATE OR REPLACE TEMP VIEW _export_target AS "
            "SELECT k, v * 10 AS v10 FROM _export_src WHERE v >= 2",
        ],
    )
    out = read_pages(spark, sink, fmt="parquet", schema="k string, v10 int")
    assert {(r["k"], r["v10"]) for r in out.collect()} == {("b", 20), ("c", 30)}


def test_catalog_table_roundtrip(spark):
    """S9: catalog-backed read/write — schema + partition keys resolved from
    the session catalog by NAME (reference: HiveMetastoreService.java:49-86
    metastore lookup; idempotent partition registration :92-110). The write
    registers the table, the read never supplies a schema, and partition
    pruning works on the catalog's partition columns."""
    from hadoop_etl_udfs_spark.sources.formats import (
        read_catalog_table,
        save_catalog_table,
    )

    pages = synthesize_pages(spark, 400, seed=7).cache()
    try:
        save_catalog_table(pages, "pages_cat", partition_by=["lang"])
        # catalog holds the metadata: table listed, schema matches
        assert any(t.name == "pages_cat" for t in spark.catalog.listTables())
        cols = {c.name: c.dataType for c in spark.catalog.listColumns("pages_cat")}
        assert cols["url"] == "string" and cols["warc_ts"] == "timestamp"
        assert cols["html"] == "binary"
        # name-based read, no schema supplied; values bit-identical
        got = read_catalog_table(spark, "pages_cat")
        fp = lambda df: df.select(
            F.bit_xor(F.xxhash64("url", "warc_ts", "html", "text", "lang"))
            .alias("h")
        ).collect()[0]["h"]
        assert got.count() == 400 and fp(got) == fp(pages)
        # catalog partition columns prune the scan
        one = got.filter(F.col("lang") == "en")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert one.count() == pages.filter(F.col("lang") == "en").count()
        # idempotent re-create (reference: AlreadyExistsException swallowed)
        save_catalog_table(pages.limit(10), "pages_cat", mode="overwrite")
        assert read_catalog_table(spark, "pages_cat").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_cat")
        pages.unpersist()


def test_partition_or_filter_and_junk_file_skip(spark, tmp_path):
    """F7 (PartitionPathFilterTest.java:14-32, HdfsService.java:120-122):
    comma=OR / slash=AND partition filters prune to exact leaves, and
    files named `_*` or zero-length are skipped by the scan."""
    import os

    from hadoop_etl_udfs_spark.sources.formats import write_table

    root = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(2001, 1, "a"), (2001, 2, "b"), (2002, 3, "c"), (2003, 11, "d")],
        "y int, m int, v string",
    )
    write_table(df, root, partition_by=["y", "m"])
    # drop junk into a leaf: an underscore file and a zero-length part file
    leaf = os.path.join(root, "y=2001", "m=1")
    with open(os.path.join(leaf, "_SPURIOUS_marker"), "w") as f:
        f.write("not data")
    open(os.path.join(leaf, "part-empty.parquet"), "wb").close()
    back = spark.read.parquet(root)
    # OR-of-AND partition filter: (y=2001 AND m=1) OR (y=2002 AND m=3)
    from pyspark.sql import functions as F

    got = back.filter(
        ((F.col("y") == 2001) & (F.col("m") == 1))
        | ((F.col("y") == 2002) & (F.col("m") == 3))
    )
    assert {r["v"] for r in got.collect()} == {"a", "c"}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the junk files did not break the read nor add rows
    assert back.count() == 4
