"""Profile the encode pipeline at two core counts, phase by phase.

Phases per config:
  shuffle  — repartition+sort only, materialized via noop sink w/ passthrough
  encode   — full encode_pages -> noop sink (no parquet write)
  sink     — full encode_pages -> parquet sink (write_encoded)
  decode   — colocated decode of the sink -> noop

Usage: PYTHONPATH=. python tools/profile_encode.py [n_docs] [cores ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SHM = "/dev/shm"


def run(cores: int, pages_path: str, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from hadoop_etl_udfs_spark.operators.encode import (
        decode_chunks_colocated,
        encode_pages,
        salted_partitioning,
    )
    from hadoop_etl_udfs_spark.plans.lineage import (
        read_encoded_colocated,
        write_encoded,
    )
    from hadoop_etl_udfs_spark.session import get_spark

    spark = get_spark(
        app_name=f"prof_{cores}",
        cores=cores,
        shuffle_partitions=max(32, cores),
        chunk_rows=16384,
        extra_conf={"spark.local.dir": os.path.join(_SHM, "spark_prof_local")},
    )
    out = {}
    try:
        pages = spark.read.parquet(pages_path).cache()
        pages.count()
        # warm python workers
        warm = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
        encode_pages(warm, salt_buckets=8).write.format("noop").mode(
            "overwrite"
        ).save()

        t0 = time.time()
        salted_partitioning(pages, 8).write.format("noop").mode("overwrite").save()
        out["shuffle_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        encode_pages(pages, salt_buckets=8).write.format("noop").mode(
            "overwrite"
        ).save()
        out["encode_noop_s"] = round(time.time() - t0, 2)

        sink = os.path.join(workdir, f"enc_{cores}")
        t0 = time.time()
        enc = encode_pages(pages, salt_buckets=8)
        write_encoded(enc, sink, mode="overwrite")
        out["encode_sink_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        encr = read_encoded_colocated(spark, sink)
        decode_chunks_colocated(encr).write.format("noop").mode("overwrite").save()
        out["decode_s"] = round(time.time() - t0, 2)
        out["cores"] = cores
    finally:
        spark.stop()
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 450_000
    core_list = [int(c) for c in sys.argv[2:]] or [8, 32]
    workdir = os.path.join(_SHM, "prof_work")
    os.makedirs(workdir, exist_ok=True)
    try:
        from hadoop_etl_udfs_spark.session import get_spark
        from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

        pages_path = os.path.join(workdir, "pages")
        if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
            spark = get_spark(app_name="prof_gen", cores=32)
            synthesize_pages(spark, n_docs, seed=42).write.mode(
                "overwrite"
            ).parquet(pages_path)
            spark.stop()
        for c in core_list:
            print(json.dumps(run(c, pages_path, workdir)), flush=True)
    finally:
        shutil.rmtree(os.path.join(_SHM, "spark_prof_local"), ignore_errors=True)


if __name__ == "__main__":
    main()
