"""Decompose the encode pipeline's 8->32 scaling gap into stages (round-6
verdict item 5).

BENCH_r05 measured full-pipeline 8->32 efficiency 0.271 against a
kernel-only stage of 0.581 on the same input — the gap is everything the
kernel-only run strips out: the salted host shuffle, the parquet sink
write, and per-job scheduling. This tool measures the SAME input through
three nested configurations at 8 and 32 cores:

  kernel        pre-partitioned(64) cached input, shuffle=False, noop sink
  kernel+shuffle  cached input, salt_buckets=8, shuffle=True, noop sink
  full            cached input, salt_buckets=8, shuffle=True, write_encoded

so that (kernel+shuffle) - kernel attributes the shuffle and
full - (kernel+shuffle) attributes the sink write, per core count.

Methodology mirrors bench.py (this host throttles CPU in minute-scale
windows, inflating identical runs up to 8x): >=3 passes, each pass runs
ALL SIX (config, cores) cells in one interleaved sweep, per-cell minima
across passes are the reported walls. One fresh session per cell — the
cell pays JVM start, but an untimed warm encode pass runs first so the
timed number is steady-state.

Output: compact JSON on stdout (last line) + full per-draw evidence in
BENCH/profile_stages_latest.json. The BENCH/BASELINE.md attribution table
is produced from this file.

Usage:
    PYTHONPATH=. python tools/profile_pipeline_stages.py
    # smaller/faster: SPARK_GRAFT_BENCH_DOCS=200000 ... (docs count)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: _session, _pages, N_DOCS)

CONFIGS = ("kernel", "kernel_shuffle", "full")
CORE_PAIR = (
    int(os.environ.get("SPARK_GRAFT_MID_CORES", "8")),
    int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
)
PASSES = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "3"))


def run_cell(config: str, cores: int, pages_path: str, workdir: str) -> float:
    """One timed encode of the pages table under `config` at `cores`."""
    from pyspark.sql import functions as F

    from hadoop_etl_udfs_spark.operators.encode import encode_pages
    from hadoop_etl_udfs_spark.plans.lineage import write_encoded

    spark = bench._session(cores, shuffle_partitions=max(32, cores))
    try:
        pages = bench._pages(spark, pages_path)
        if config == "kernel":
            # identical chunking at every core count, no host shuffle in
            # the timed run (bench.py's kernel_only leg)
            pages = pages.repartition(64)
        pages = pages.cache()
        pages.count()
        warm = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
        shuffle = config != "kernel"
        encode_pages(warm, salt_buckets=8, shuffle=shuffle).write.format(
            "noop"
        ).mode("overwrite").save()
        t0 = time.time()
        if config == "full":
            out = os.path.join(workdir, f"enc_{cores}")
            write_encoded(
                encode_pages(pages, salt_buckets=8), out, mode="overwrite"
            )
        else:
            encode_pages(pages, salt_buckets=8, shuffle=shuffle).write.format(
                "noop"
            ).mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        spark.stop()


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="profile_", dir=bench._SHM)
    try:
        spark = bench._session(CORE_PAIR[1], shuffle_partitions=32)
        from hadoop_etl_udfs_spark.sources.iceberg_lite import (
            write_iceberg_table,
        )
        from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

        pages_path = os.path.join(workdir, "pages")
        write_iceberg_table(
            synthesize_pages(spark, bench.N_DOCS, seed=42), pages_path,
            mode="overwrite", stats_col="warc_ts",
        )
        spark.stop()

        draws: dict[tuple[str, int], list[float]] = {
            (cfg, c): [] for cfg in CONFIGS for c in CORE_PAIR
        }
        for _ in range(PASSES):
            # one interleaved sweep per pass: every cell's draws are spread
            # across the host's minute-scale throttle windows
            for cfg in CONFIGS:
                for cores in CORE_PAIR:
                    w = run_cell(cfg, cores, pages_path, workdir)
                    draws[(cfg, cores)].append(w)
                    print(f"pass draw: {cfg}@{cores} = {w}s", flush=True)

        lo, hi = CORE_PAIR
        walls = {k: min(v) for k, v in draws.items()}
        cells = {
            cfg: {str(c): walls[(cfg, c)] for c in CORE_PAIR} for cfg in CONFIGS
        }
        # stage attribution per core count, from the nested minima
        attribution = {
            str(c): {
                "kernel_s": walls[("kernel", c)],
                "shuffle_s": round(
                    walls[("kernel_shuffle", c)] - walls[("kernel", c)], 3
                ),
                "sink_write_s": round(
                    walls[("full", c)] - walls[("kernel_shuffle", c)], 3
                ),
            }
            for c in CORE_PAIR
        }
        eff = {
            cfg: round(walls[(cfg, lo)] / walls[(cfg, hi)] / (hi / lo), 3)
            for cfg in CONFIGS
        }
        result = {
            "n_docs": bench.N_DOCS,
            "core_pair": list(CORE_PAIR),
            "passes": PASSES,
            "walls_s": cells,
            "draws_s": {f"{cfg}@{c}": v for (cfg, c), v in draws.items()},
            "stage_attribution_s": attribution,
            "efficiency": eff,
        }
        repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        os.makedirs(os.path.join(repo_dir, "BENCH"), exist_ok=True)
        with open(
            os.path.join(repo_dir, "BENCH", "profile_stages_latest.json"), "w"
        ) as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: result[k] for k in
                          ("walls_s", "stage_attribution_s", "efficiency")}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
