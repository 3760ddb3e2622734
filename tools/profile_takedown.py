"""Scale probe for the round-8 point-lookup layer: Bloom-pruned lookup
and surgical takedown on a corpus-scale bloomed sink.

The driver-gate entry (point_lookup_over_encoded, 500 docs) proves
VALUES; the pytest proves pruning HAPPENS; this probe proves the pruning
MATTERS at corpus scale — the wall-clock separation between touching the
blast radius and touching the corpus:

  1. encode N synthesized pages into a bloomed sink (bloom_by=[url]);
  2. point lookup of Q urls: bloom-pruned decode_chunks_where_key_in vs
     the naive full decode + row filter (same results, asserted);
  3. takedown of Q urls: delete_from_sink (bloom-pruned key scan,
     chunks_affected re-encoded, rest carried raw) vs the naive
     full decode -> filter -> full re-encode rewrite;
  4. chunk accounting: chunks_total / chunks_key_scanned /
     chunks_affected / chunks_new.

Methodology per CLAUDE.md: this host throttles CPU in minute-scale
windows, so >=3 interleaved passes and per-cell minima; Spark work is
measured warm (one untimed lookup pass first).

Output: compact JSON on stdout (last line) + BENCH/takedown_scale_latest.json.

Usage:
    PYTHONPATH=. python tools/profile_takedown.py
    # smaller/faster: SPARK_GRAFT_TAKEDOWN_DOCS=20000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

# 16x the standard 205k corpus: at 205k the full decode is ~0.7 s on 32
# cores — BOTH paths are Spark job-latency-bound and the probe measures
# fixed overheads, not pruning (measured speedup 0.4x; still 0.65x at
# 822k). Only at multi-million docs does decode/encode CPU dominate the
# fixed job costs and the pruning separation become the real effect —
# the same sizing lesson as the 4M-vector ann_sink bench.
N_DOCS = int(os.environ.get("SPARK_GRAFT_TAKEDOWN_DOCS", "3288752"))
N_KEYS = int(os.environ.get("SPARK_GRAFT_TAKEDOWN_KEYS", "20"))
PASSES = int(os.environ.get("SPARK_GRAFT_TAKEDOWN_PASSES", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_etl_udfs_spark.operators.encode import decode_chunks, encode_pages
    from hadoop_etl_udfs_spark.plans import lineage
    from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench._session(cores, shuffle_partitions=max(32, cores))
    work = tempfile.mkdtemp(prefix="takedown_probe_")
    src = os.path.join(work, "sink")

    pages = synthesize_pages(spark, N_DOCS).cache()
    pages.count()
    t0 = time.time()
    # column-partitioned: the 100 TB layout — the takedown's key scan and
    # the lookup's bloom probe then read the key column's directory only
    lineage.write_encoded(
        encode_pages(pages, salt_buckets="adaptive", bloom_by=["url"]), src,
        partition_by_column=True,
    )
    encode_wall = time.time() - t0
    enc = lineage.read_encoded(spark, src)
    n_chunks = enc.select("chunk_id").distinct().count()

    # deterministic probe set, hash-spread across the corpus (never a
    # full-corpus collect: stride-filter distributed, collect <= 2K keys)
    keys = [
        r["url"]
        for r in pages.select("url")
        .filter(
            F.pmod(F.xxhash64("url"), F.lit(max(1, N_DOCS // (2 * N_KEYS))))
            == 0
        )
        .orderBy("url")
        .limit(N_KEYS)
        .collect()
    ]
    assert len(keys) == N_KEYS

    # --- point lookup: bloom-pruned vs naive full decode -------------------
    pruned_w, full_w = float("inf"), float("inf")
    st = enc.filter(F.col("column") == "url").select("chunk_id", "stats")
    cand = lineage.bloom_candidate_chunks(st, "url", keys, spark).count()
    lineage.decode_chunks_where_key_in(spark, src, "url", keys).count()  # warm
    for _ in range(PASSES):
        t0 = time.time()
        n_pruned = lineage.decode_chunks_where_key_in(
            spark, src, "url", keys
        ).count()
        pruned_w = min(pruned_w, time.time() - t0)
        t0 = time.time()
        n_full = (
            decode_chunks(lineage.read_encoded(spark, src))
            .filter(F.col("url").isin(keys))
            .count()
        )
        full_w = min(full_w, time.time() - t0)
    assert n_pruned == n_full == len(keys), (n_pruned, n_full, len(keys))

    # --- takedown: surgical vs naive full rewrite --------------------------
    surgical_w, naive_w = float("inf"), float("inf")
    stats = None
    for p in range(PASSES):
        dst = os.path.join(work, f"dst_surgical_{p}")
        t0 = time.time()
        stats = lineage.delete_from_sink(
            spark, src, dst, keys, key_column="url", partition_by_column=True
        )
        surgical_w = min(surgical_w, time.time() - t0)

        dst_n = os.path.join(work, f"dst_naive_{p}")
        t0 = time.time()
        rows = decode_chunks(lineage.read_encoded(spark, src)).filter(
            ~F.col("url").isin(keys)
        )
        lineage.write_encoded(
            encode_pages(rows, shuffle=False, bloom_by=["url"]), dst_n,
            partition_by_column=True,
        )
        naive_w = min(naive_w, time.time() - t0)
        n_surgical = decode_chunks(lineage.read_encoded(spark, dst)).count()
        n_naive = decode_chunks(lineage.read_encoded(spark, dst_n)).count()
        assert n_surgical == n_naive == N_DOCS - len(keys), (
            n_surgical, n_naive,
        )

    result = {
        "n_docs": N_DOCS,
        "n_keys": len(keys),
        "cores": cores,
        "passes": PASSES,
        "encode_bloomed_wall_s": round(encode_wall, 2),
        "chunks_total": n_chunks,
        "lookup": {
            "candidate_chunks": cand,
            "pruned_wall_s": round(pruned_w, 2),
            "full_decode_wall_s": round(full_w, 2),
            "speedup": round(full_w / pruned_w, 2),
        },
        "takedown": {
            "chunks_key_scanned": stats["chunks_key_scanned"],
            "chunks_affected": stats["chunks_affected"],
            "chunks_new": stats["chunks_new"],
            "rows_deleted": stats["rows_deleted"],
            "surgical_wall_s": round(surgical_w, 2),
            "naive_rewrite_wall_s": round(naive_w, 2),
            "speedup": round(naive_w / surgical_w, 2),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/takedown_scale_latest.json", "w") as f:
        json.dump(result, f, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
