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
from pyspark.sql import functions as F
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
    cluster_by: str | None = None,
    bloom_by: list[str] | None = None,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        done = lineage.completed_chunk_ids(spark, out_dir, n_columns=5)
        enc = encode_pages(
            batch_df, codec=codec, salt_buckets=salt_buckets,
            skip_chunk_ids=done, cluster_by=cluster_by, bloom_by=bloom_by,
        )
        lineage.write_encoded(enc, out_dir, mode="append")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


DOCUMENTS_SCHEMA = "doc_id long, text string, lang string, source string"


def start_curated_encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    codec: str = "auto",
    max_files_per_trigger: int = 16,
    repetition_gate: bool = False,
) -> StreamingQuery:
    """Streaming CURATION: the stratified sample gate applied inside the
    incremental encode — only the training-mix sample of each arriving
    micro-batch is chunk-encoded (round 7).

    The gate needs ZERO state: membership is a pure function of doc_id
    (curation.stratified_sample_df's md5 hash gate), so replayed batches
    re-derive the same keep/drop decisions, corpus growth never resamples
    old docs, and — the property the test pins — the streaming sink over
    N waves decodes to EXACTLY the batch operator's sample of the union.
    ``repetition_gate=True`` (round 8) additionally drops docs whose
    Gopher ``repetition_flag`` fires — also stateless by construction,
    because the repetition signals are INTRA-document (a pure function of
    the doc's own text), so batch boundaries cannot change any verdict
    and the N-wave sink still equals the batch composition over the
    union. Curation that needs cross-batch state (near-dup resolution,
    cross-doc boilerplate, the corpus-trained LM filter) stays a batch
    job over the sink (jobs/curate_job.py); the gates are the part that
    belongs on the ingest path, because dropped docs cost no encode CPU
    and no sink bytes. Docs arrive in DOCUMENTS_SCHEMA; the encode
    shuffles on doc_id (table-agnostic partition_cols path)."""
    from pyspark.sql import functions as F

    from ..operators.curation import stratified_sample_df
    from ..operators.textstats import repetition_signals_df

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    # derived, not hard-coded: a DOCUMENTS_SCHEMA edit must tighten the
    # torn-write resume check automatically (r7 review). Parsed via the DDL
    # parser, NOT a comma split — a comma-bearing type added later
    # (decimal(10,2), struct<...>) would silently inflate the count and
    # make completed_chunk_ids use a wrong arity (r7 advice)
    from pyspark.sql.types import StructType

    n_columns = len(StructType.fromDDL(DOCUMENTS_SCHEMA).fields)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        done = lineage.completed_chunk_ids(spark, out_dir, n_columns=n_columns)
        gated = stratified_sample_df(batch_df)
        if repetition_gate:
            flagged = (
                repetition_signals_df(gated)
                .filter(F.col("repetition_flag"))
                .select("doc_id")
            )
            gated = gated.join(flagged, "doc_id", "left_anti")
        enc = encode_pages(
            gated, codec=codec,
            skip_chunk_ids=done, partition_cols=["doc_id"],
        )
        lineage.write_encoded(enc, out_dir, mode="append")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_decode_stream(
    spark: SparkSession,
    sink_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """The decode-side stream: watch a chunk sink and emit decoded rows as
    new chunks commit — the downstream half of the encode stream above
    (continuous ingestion in, continuous decoded feed out).

    Unit of consumption = committed sink FILES; each encode task writes a
    chunk's column rows consecutively into one file, so every micro-batch
    carries whole chunks and decodes with the grouped path (which also
    dedupes any replayed chunk WITHIN its batch). The file-source checkpoint
    guarantees each sink file is consumed exactly once, so an appended
    (resume-style) sink streams out exactly once too.

    A COLUMN-PARTITIONED sink (``write_encoded(partition_by_column=True)``)
    breaks that premise — a chunk's column rows live in different files, a
    micro-batch boundary can split them, and decode_chunks would fill the
    missing columns with NULL (its schema-evolution behavior) and append
    silently-wrong rows FOREVER (exactly-once means no retry). Refuse it
    loudly; that layout decodes via the batch paths."""
    import glob as _glob
    import os as _os

    from ..operators.encode import ENCODED_SCHEMA, decode_chunks

    if _glob.glob(_os.path.join(lineage.chunks_path(sink_dir), "column=*")):
        raise ValueError(
            f"sink {sink_dir!r} is column-partitioned (column=*/ dirs): a "
            "micro-batch boundary could tear chunks across files and decode "
            "them as NULL-filled rows — stream-decode only the default "
            "colocated layout; use batch decode_chunks for this sink"
        )

    stream = (
        spark.readStream.schema(ENCODED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(lineage.chunks_path(sink_dir))
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        decode_chunks(batch_df, schema=schema).write.mode("append").parquet(
            out_dir
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def iceberg_ingest_tick(
    spark: SparkSession,
    table_dir: str,
    sink_dir: str,
    codec: str = "auto",
    salt_buckets: int = 8,
    cluster_by: str | None = None,
    partition_cols: list[str] | None = None,
) -> dict:
    """One cycle of the production ingestion daemon: poll the Iceberg
    table for commits newer than the sink's watermark, encode-append
    exactly that snapshot diff, advance the watermark. Returns what the
    tick did (snapshot ids, rows seen, chunks before/after).

    Exactly-once WITHOUT a transactional store: ticks are at-least-once
    (a crash between the encode-append and the watermark write makes the
    next tick re-read the same diff), but the encode skips chunks whose
    content-addressed ids the sink manifest already holds — so replays
    re-encode nothing and the sink converges to exactly-once regardless of
    where a tick died. The watermark is just an optimization cursor, never
    a correctness mechanism. It records the snapshot id AND that snapshot's
    live file list: if maintenance (expire_snapshots) expires the watermark
    snapshot, the tick recovers by replaying exactly the files not yet
    ingested (immutable-file identity) — same rows, same chunking,
    exactly-once preserved. A legacy watermark without a file list cannot
    recover from expiry and raises (hand-reset the watermark file then).

    Semantics: the sink is an append-only LOG of ingested rows, not a
    mirror of the table — an OVERWRITE commit upstream ingests the new
    snapshot's rows in full (its files are all "added") while previously
    ingested rows stay in the sink; pair with the dedup/recluster batch
    jobs if superseded history must be compacted away."""
    import json as _json
    import os as _os

    from ..sources.iceberg_lite import (
        SnapshotNotFoundError,
        iceberg_data_files,
        read_iceberg,
        read_iceberg_file_diff,
        read_iceberg_incremental,
        read_table_meta,
    )

    wm_path = _os.path.join(sink_dir, "_iceberg_watermark.json")
    last, seen_files = 0, None
    if _os.path.exists(wm_path):
        with open(wm_path) as f:
            wm = _json.load(f)
        last = wm["snapshot_id"]
        seen_files = wm.get("files")
    meta = read_table_meta(table_dir)
    current = meta["current-snapshot-id"]
    out = {"from_snapshot": last, "to_snapshot": current, "rows": 0}
    if current == last:
        return {**out, "noop": True}
    if last:
        try:
            diff = read_iceberg_incremental(spark, table_dir, last)
        except SnapshotNotFoundError:
            # typed catch (ADVICE r5): exactly the expired-snapshot
            # condition routes to recovery — any other ValueError
            # propagates, message wording notwithstanding
            if seen_files is None:
                raise
            # the watermark snapshot was expired by expire_snapshots (the
            # maintenance job). Recover via the recorded ingested-FILE set:
            # Iceberg data files are immutable, so replaying exactly the
            # unseen files reproduces the rows AND the chunking an
            # incremental read would have produced — the skip set keeps the
            # sink exactly-once. (A full-table re-read would shuffle
            # old+new rows into DIFFERENT chunks and duplicate rows.)
            diff = read_iceberg_file_diff(spark, table_dir, seen_files)
            out["watermark_expired_file_diff"] = True
    else:
        diff = read_iceberg(spark, table_dir)
    done = lineage.completed_chunk_ids(
        spark, sink_dir, n_columns=len(diff.columns)
    )
    enc = encode_pages(
        diff, codec=codec, salt_buckets=salt_buckets,
        skip_chunk_ids=done, cluster_by=cluster_by,
        # non-pages tables (round 6): declare the co-location key so the
        # tick ingests ANY Iceberg table, not just the pages layout
        partition_cols=partition_cols,
    )
    lineage.write_encoded(enc, sink_dir, mode="append")
    out["rows"] = diff.count()
    out["chunks_skipped"] = len(done)
    _os.makedirs(sink_dir, exist_ok=True)
    # the watermark records the snapshot AND its live file list: the file
    # set is the expiry-proof recovery cursor (one path per data file —
    # same O(n_files) scale as the manifests themselves). Written
    # atomically: the list spans many write syscalls, and a tick killed
    # mid-write must not leave a torn JSON that bricks every later tick.
    from ..sources.iceberg_lite import _atomic_write

    files_cur, _ = iceberg_data_files(table_dir, current)
    _atomic_write(
        wm_path, _json.dumps({"snapshot_id": current, "files": files_cur})
    )
    return {**out, "noop": False}


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


SESSION_SCHEMA = "user_id long, session_start timestamp, n_events int, total_value double"
_STATE_SCHEMA = "start long, n int, total double, last long"


def sessionize_events(
    events_stream: DataFrame, gap_seconds: int = 300, watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (gap-based sessions — emitted when the
    event-time watermark passes the session gap). The per-group state is a
    4-tuple; the kernel is pandas-vectorized within each micro-batch group.

    The reference has no stateful processing of any kind (SURVEY.md §2.7);
    this is the engine's custom-stateful-operator pattern.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def _emit(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "n_events": [n for _, n, _ in sessions],
                "total_value": [round(t, 4) for _, _, t in sessions],
            }
        )

    def update(key, pdfs, state):
        import numpy as np

        user_id = key[0]
        if state.hasTimedOut:
            start, n, total, _last = state.get
            state.remove()
            yield _emit(user_id, [(start, n, total)])
            return
        parts = list(pdfs)
        pdf = pd.concat(parts).sort_values("ts") if parts else None
        cur = tuple(state.get) if state.exists else None  # (start, n, total, last)
        closed: list[tuple[int, int, float]] = []
        if pdf is not None and len(pdf):
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            vals = pdf["value"].to_numpy()
            # split the sorted batch wherever the gap exceeds the threshold
            seg_starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(ts_us) > gap_us) + 1)
            )
            seg_ends = np.concatenate((seg_starts[1:], [len(ts_us)]))
            for a, b in zip(seg_starts, seg_ends):
                s0, s1 = int(ts_us[a]), int(ts_us[b - 1])
                n_seg, t_seg = int(b - a), float(vals[a:b].sum())
                if cur is not None and s0 - cur[3] <= gap_us:
                    cur = (cur[0], cur[1] + n_seg, cur[2] + t_seg, s1)
                else:
                    if cur is not None:
                        closed.append((cur[0], cur[1], cur[2]))
                    cur = (s0, n_seg, t_seg, s1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[3] // 1000 + gap_seconds * 1000)
        yield _emit(user_id, closed)

    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup(
    docs_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup by content fingerprint: the training-pipeline
    version of operators.dedup.exact_dedup for a document FEED.

    ``dropDuplicatesWithinWatermark`` keeps fingerprint state only for the
    watermark horizon — duplicates arriving within it drop, state is evicted
    after, so memory is bounded by (arrival rate x watermark), not corpus
    size. Cross-horizon dedupe belongs to the batch operator over the
    accumulated sink."""
    from ..functions.text import fingerprint

    d = docs_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        d.withColumn("fp", fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
