"""Streaming incremental encode: files arrive in two waves; the sink must
contain each chunk exactly once and decode bit-identical."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.operators.encode import verify_roundtrip
from hadoop_etl_udfs_spark.plans import lineage
from hadoop_etl_udfs_spark.sources.pages import synthesize_pages
from hadoop_etl_udfs_spark.streaming.encode_stream import (
    start_encode_stream,
    streaming_lineage_metrics,
)


def test_streaming_incremental_encode(spark):
    base = tempfile.mkdtemp(prefix="stream_")
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)
    try:
        wave1 = synthesize_pages(spark, 1000, seed=5).cache()
        wave2 = synthesize_pages(spark, 2200, seed=5).filter(
            F.xxhash64("url") % 2 == 0
        ).cache()
        wave1.coalesce(1).write.parquet(os.path.join(in_dir, "w1"))

        q = start_encode_stream(spark, in_dir + "/*", out_dir, ckpt)
        q.processAllAvailable()
        q.stop()
        n1 = lineage.read_manifest(spark, out_dir).select("chunk_id").distinct().count()
        assert n1 > 0

        wave2.coalesce(1).write.parquet(os.path.join(in_dir, "w2"))
        q = start_encode_stream(spark, in_dir + "/*", out_dir, ckpt)
        q.processAllAvailable()
        q.stop()

        enc = lineage.read_encoded(spark, out_dir)
        # each (chunk, column) exactly once — no duplicate encodes
        dupes = (
            enc.groupBy("chunk_id", "column").count().filter(F.col("count") > 1).count()
        )
        assert dupes == 0
        # decoded union is bit-identical to the union of the two waves
        all_pages = wave1.union(wave2)
        result = verify_roundtrip(all_pages, enc)
        assert result["ok"], result
        metrics = streaming_lineage_metrics(spark, out_dir)
        assert metrics.count() >= 5
    finally:
        shutil.rmtree(base, ignore_errors=True)
