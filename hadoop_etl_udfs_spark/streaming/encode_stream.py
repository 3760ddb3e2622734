"""Incremental (streaming) encode: watch a directory of page parquet files,
encode each micro-batch into the chunk sink, maintain lineage.

    q = start_encode_stream(spark, input_dir, out_dir, checkpoint_dir)
    q.processAllAvailable(); q.stop()

Semantics: the file source's checkpoint guarantees each input file is
processed once; if a micro-batch is replayed after a crash, the encode
kernel re-derives the same content-addressed chunk ids and the skip-set
drops already-committed chunks — the sink stays duplicate-free without a
transactional store.

Also provides a windowed streaming metrics rollup (bytes/ratio per minute of
processing time) as the engine's observability stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.encode import encode_pages
from ..plans import lineage
from ..sources.pages import PAGES_SCHEMA


def start_encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    codec: str = "auto",
    salt_buckets: int = 8,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        done = lineage.completed_chunk_ids(spark, out_dir, n_columns=5)
        enc = encode_pages(
            batch_df, codec=codec, salt_buckets=salt_buckets, skip_chunk_ids=done
        )
        lineage.write_encoded(enc, out_dir, mode="append")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_lineage_metrics(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """Batch view over the continuously-appended manifest: per-column codec
    mix and compression ratio (what a dashboard would poll) — the same
    rollup as operators.encode.codec_metrics, over the sink manifest."""
    from ..operators.encode import codec_metrics

    return codec_metrics(lineage.read_manifest(spark, out_dir))


def windowed_event_metrics(
    spark: SparkSession,
    events_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over an event stream (the Structured
    Streaming pattern the reference lacks entirely — SURVEY.md §2.7): late
    rows beyond the watermark drop, windows finalize exactly once."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (tz) event time; parquet may carry NTZ
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
