"""Interleaved-minima measurement of the PIPELINE bench entries
(r8 verdict item 3): bench.py's dedup_pipeline / dedup_pipeline_scale /
curate_pipeline are single-pass, and on a host with documented 5x
throttle windows a single pass cannot distinguish regression from
weather (the r8 round was mis-read exactly this way). bench.py is FROZEN
for driver measurement, so the interleaved methodology lives here:
>= PASSES full sweeps over all three entries, per-stage MINIMA across
passes, all draws reported.

Reuses bench.py's own entry functions verbatim — same corpus
construction, same stage boundaries, same materialization discipline —
so the minima are directly comparable to the driver's single-pass
numbers.

Output: compact JSON on stdout (last line) +
BENCH/bench_extra_pipelines_latest.json.

Usage:
    python bench_extra.py            # 3 passes
    SPARK_GRAFT_EXTRA_PASSES=2 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402

PASSES = int(os.environ.get("SPARK_GRAFT_EXTRA_PASSES", "3"))


def _min_merge(best: dict | None, run: dict) -> dict:
    """Per-stage and total minima across passes (walls only; counts and
    flags are asserted identical across passes — a drifting count would
    mean non-determinism, which is a bug, not weather)."""
    if best is None:
        return {
            **run,
            "stage_walls_s": dict(run["stage_walls_s"]),
            "wall_draws_s": [run["wall_s"]],
        }
    for k in run["stage_walls_s"]:
        best["stage_walls_s"][k] = min(
            best["stage_walls_s"][k], run["stage_walls_s"][k]
        )
    best["wall_draws_s"].append(run["wall_s"])
    best["wall_s"] = min(best["wall_s"], run["wall_s"])
    for k, v in run.items():
        if k in ("wall_s", "stage_walls_s"):
            continue
        assert best.get(k) == v, (k, best.get(k), v)
    return best


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="bench_extra_", dir=bench._SHM)
    try:
        from hadoop_etl_udfs_spark.sources.iceberg_lite import (
            write_iceberg_table,
        )
        from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

        spark = bench._session(bench.CPUS, shuffle_partitions=max(32, bench.CPUS))
        pages_path = os.path.join(workdir, "pages")
        write_iceberg_table(
            synthesize_pages(spark, bench.N_DOCS, seed=42), pages_path,
            mode="overwrite", stats_col="warc_ts",
        )
        spark.stop()

        scale_docs = int(os.environ.get(
            "SPARK_GRAFT_DEDUP_SCALE_DOCS", str(bench.N_DOCS // 2)
        ))
        best: dict[str, dict | None] = {
            "dedup_pipeline": None,
            "dedup_pipeline_scale": None,
            "curate_pipeline": None,
        }
        for p in range(PASSES):
            best["dedup_pipeline"] = _min_merge(
                best["dedup_pipeline"],
                bench.run_dedup_pipeline(pages_path, bench.DEDUP_DOCS),
            )
            best["dedup_pipeline_scale"] = _min_merge(
                best["dedup_pipeline_scale"],
                bench.run_dedup_pipeline(pages_path, scale_docs),
            )
            # run_curate_pipeline writes its sink with errorifexists-free
            # overwrite into workdir/curated_sink — safe to repeat
            best["curate_pipeline"] = _min_merge(
                best["curate_pipeline"],
                bench.run_curate_pipeline(pages_path, workdir),
            )
            sys.stderr.write(f"pass {p + 1}/{PASSES} done\n")
        result = {"passes": PASSES, "n_docs": bench.N_DOCS, **best}
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/bench_extra_pipelines_latest.json", "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        shutil.rmtree(
            os.path.join(bench._SHM, "spark_bench_local"), ignore_errors=True
        )


if __name__ == "__main__":
    main()
