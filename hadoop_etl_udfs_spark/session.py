"""SparkSession factory tuned for the encode engine.

Local mode stands in for the multi-executor cluster (BASELINE.md §c): the
same partitioning/shuffle design runs unchanged on a real cluster; bench.py
evidences scaling by running at two parallelism levels (local[8] vs local[32]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size ≈ encode chunk size: one mapInArrow batch = one chunk.
DEFAULT_CHUNK_ROWS = 65536


def get_spark(
    app_name: str = "hadoop_etl_udfs_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
