"""Multi-format source/sink dispatch (reference S1/S2/S6 parity).

The reference opens any Hive SerDe by metastore class name
(UdfUtils.getInstanceByName, HdfsSerDeImportService.java:84-85) and supports
"all Hive SerDes — Parquet, ORC, RC, Avro, JSON, text" (doc/import.md:15);
its sink is Parquet-only (doc/export.md:23-26). Spark's DataFrameReader is
the equivalent dispatch: format name -> built-in vectorized reader, with
schema always EXPLICIT (the reference never infers — schema comes from the
metastore, SURVEY.md §1.4) and both read and write symmetric.

RCFile has no Spark datasource; its role (columnar splittable storage) is
covered by ORC. Avro requires the external spark-avro module — detected at
runtime, reported in SUPPORTED_FORMATS. Iceberg likewise: when an Iceberg
catalog is configured, ``read_table``/``write_table`` use it; this sandbox
has no Iceberg runtime jar, so path-based parquet is the tested fallback
(same DataFrame plans either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMAT_OPTIONS: dict[str, dict[str, str]] = {
    "parquet": {},
    "orc": {},
    "json": {},
    "csv": {"header": "true"},
    "text": {},
    "avro": {},
}


_HAS_SPARK_AVRO: bool | None = None  # classpath is constant per process


def _has_spark_avro(spark: SparkSession) -> bool:
    global _HAS_SPARK_AVRO
    if _HAS_SPARK_AVRO is None:
        try:
            spark.read.format("avro").schema("x int").load(
                "/nonexistent_probe_path"
            ).schema
            _HAS_SPARK_AVRO = True
        except Exception as e:  # noqa: BLE001
            # datasource resolution happens before the path lookup, so a
            # missing module fails with this exact template; any OTHER
            # error (e.g. path-not-found) proves the source resolved
            _HAS_SPARK_AVRO = "Failed to find data source" not in str(e)
    return _HAS_SPARK_AVRO


def supported_formats(spark: SparkSession) -> list[str]:
    # avro is always supported in BOTH directions: via the spark-avro module
    # when it is on the classpath, else via the pure-Python container-file
    # fallback (sources/avro_lite.py) wired into read_pages AND write_table
    return list(_FORMAT_OPTIONS)


def read_pages(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Schema-explicit read (never inferred — metastore-supplied in the
    reference, caller-supplied here)."""
    from .pages import PAGES_SCHEMA

    if fmt == "avro" and not _has_spark_avro(spark):
        # reference parity (S1 reads Avro via SerDe dispatch,
        # doc/import.md:15): no spark-avro jar in this runtime, so dispatch
        # to the pure-Python container-file reader — distributed via
        # binaryFile + mapInArrow (see avro_lite module docstring)
        from .avro_lite import read_avro_spark

        return read_avro_spark(spark, path, schema or PAGES_SCHEMA)
    if fmt == "iceberg":
        # table-format branch (the north star's input is an Iceberg table):
        # no Iceberg runtime jar here either, so dispatch to the spec-pure
        # metadata/manifest planner (sources/iceberg_lite.py); the schema
        # comes from the table's own metadata, never from the caller —
        # accepting-and-ignoring a caller schema would break the explicit-
        # schema contract every other branch honors, so refuse it loudly
        if schema is not None:
            raise ValueError(
                "read_pages(fmt='iceberg') resolves the schema from the "
                "table's own metadata; an explicit schema= is not honored "
                "on this branch — drop it (select/cast after the read to "
                "reshape)"
            )
        from .iceberg_lite import read_iceberg

        return read_iceberg(spark, path)
    reader = spark.read.format(fmt)
    for k, v in _FORMAT_OPTIONS.get(fmt, {}).items():
        reader = reader.option(k, v)
    if fmt != "text":
        reader = reader.schema(schema or PAGES_SCHEMA)
    return reader.load(path)


def run_pre_sql(spark: SparkSession, statements: list[str]) -> None:
    """S11: DDL pre-statements executed before an export — the reference
    runs user-supplied SQL to prepare the target (table/partition DDL ahead
    of the write, ExportHCatTable.java flow); here they run through
    spark.sql against the session catalog (views, databases, properties)."""
    for stmt in statements:
        spark.sql(stmt)


def export_with_ddl(
    spark: SparkSession,
    source_table: str,
    path: str,
    pre_statements: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Export preceded by DDL pre-statements (S11 + S6). The source is
    resolved BY NAME after the DDL runs — a pre-statement may create the
    very view being exported, so resolution must not happen earlier."""
    run_pre_sql(spark, pre_statements)
    write_table(spark.table(source_table), path, fmt=fmt, mode=mode)


def save_catalog_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S9/S10: catalog-backed sink. The reference resolves schema, location
    and partition keys from the Hive metastore (HiveMetastoreService.java:
    49-86) and registers partitions idempotently (:92-110); Spark's session
    catalog is the equivalent — ``saveAsTable`` records schema + partition
    columns in the catalog and readers address the table BY NAME
    (:func:`read_catalog_table`), never by path. With an Iceberg catalog
    configured the same call targets Iceberg; this sandbox tests the
    built-in in-memory/Derby session catalog."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.saveAsTable(table)


def read_catalog_table(spark: SparkSession, table: str) -> DataFrame:
    """Name-based read: schema comes from the catalog, not the caller
    (the metastore-supplied-schema model, SURVEY.md §1.4)."""
    return spark.read.table(table)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Format-dispatched sink with Hive-style directory partitioning
    (reference export: dynamic-partition GROUP BY + one file per group,
    ExportHCatTable.java:114-156 — here ``partitionBy`` + task parallelism)."""
    if fmt == "avro" and not _has_spark_avro(df.sparkSession):
        # symmetric with read_pages' fallback: the pure-Python container-file
        # writer, one file per partition (partition_by/compression are
        # spark-avro features — fail loud rather than silently ignore)
        if partition_by or compression:
            raise ValueError(
                "avro fallback sink supports neither partition_by nor "
                "compression options — vendor spark-avro for those"
            )
        from .avro_lite import write_avro_spark
        import os
        import shutil

        if mode == "overwrite":
            if os.path.isdir(path):
                shutil.rmtree(path)
        elif mode in ("error", "errorifexists"):
            if os.path.exists(path):
                raise FileExistsError(path)
        elif mode == "ignore":  # Spark contract: no-op when target exists
            if os.path.exists(path):
                return
        else:
            # append would silently clobber same-numbered part files
            raise ValueError(
                f"avro fallback sink supports modes overwrite/errorifexists/"
                f"ignore, not {mode!r}"
            )
        write_avro_spark(df, path)
        return
    w = df.write.format(fmt).mode(mode)
    for k, v in _FORMAT_OPTIONS.get(fmt, {}).items():
        w = w.option(k, v)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
