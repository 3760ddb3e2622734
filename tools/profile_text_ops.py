"""Scale probe for the round-7/8 text-cleanup and packing operators
(boilerplate removal, unigram- and bigram-LM scoring, per-source quota
cap, Gopher repetition signals, fixed-length sequence packing).

The driver-gate documents table is fixed at 500 rows, so the gate proves
VALUES; this probe proves the SHAPE — the same operators over the
synthesized pages corpus at two doc counts (4x apart), reporting walls and
the docs-scaling ratio. The source column for the quota cap is the
Zipf-skewed host distribution (sources/pages.py::skew_hosts — head host
~37% of all rows), i.e. exactly the hot-domain input the two-phase salted
top-k exists for: the naive single-window plan would drag ~37% of the
corpus into ONE task.

Methodology mirrors tools/profile_pipeline_stages.py: this host throttles
CPU in minute-scale windows, so >=2 interleaved passes over all cells and
per-cell minima. One cached docs DataFrame per doc count; an untimed warm
pass per op first.

Output: compact JSON on stdout (last line) + BENCH/text_ops_scale_latest.json.

Usage:
    PYTHONPATH=. python tools/profile_text_ops.py
    # smaller/faster: SPARK_GRAFT_TEXT_PROBE_DOCS=50000 (the LOW point)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LOW_DOCS = int(os.environ.get("SPARK_GRAFT_TEXT_PROBE_DOCS", "200000"))
SCALE = 4
PASSES = int(os.environ.get("SPARK_GRAFT_TEXT_PROBE_PASSES", "2"))


def _ops():
    from pyspark.sql import functions as F

    from hadoop_etl_udfs_spark.operators.curation import (
        pack_token_sequences_df,
        source_quota_cap_df,
    )
    from hadoop_etl_udfs_spark.operators.textstats import (
        boilerplate_removal_df,
        lm_bigram_scores_df,
        lm_perplexity_scores_df,
        repetition_signals_df,
    )

    # each op is forced with a cheap full-result aggregate (count + one
    # value column summed) — the whole plan runs, nothing big collects
    return {
        "boilerplate_removal": lambda docs: boilerplate_removal_df(docs)
        .agg(F.count("*"), F.sum("n_boiler_segs"))
        .collect(),
        "lm_perplexity_scores": lambda docs: lm_perplexity_scores_df(docs)
        .agg(F.count("*"), F.sum("sum_lp_micro"))
        .collect(),
        "lm_bigram_scores": lambda docs: lm_bigram_scores_df(docs)
        .agg(F.count("*"), F.sum("sum_lp2_micro"))
        .collect(),
        "source_quota_cap": lambda docs: source_quota_cap_df(docs)
        .agg(F.count("*"), F.sum("rk"))
        .collect(),
        "repetition_signals": lambda docs: repetition_signals_df(docs)
        .agg(F.count("*"), F.sum(F.col("repetition_flag").cast("long")))
        .collect(),
        "pack_token_sequences": lambda docs: pack_token_sequences_df(docs)
        .agg(F.count("*"), F.sum("span_tokens"))
        .collect(),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_etl_udfs_spark.sources.pages import skew_hosts, synthesize_pages

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench._session(cores, shuffle_partitions=max(32, cores))
    counts = (LOW_DOCS, LOW_DOCS * SCALE)
    cached = {}
    for n in counts:
        docs = skew_hosts(synthesize_pages(spark, n)).select(
            F.xxhash64("url").alias("doc_id"),
            "text",
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("source"),
        )
        cached[n] = docs.cache()
        cached[n].count()

    ops = _ops()
    walls: dict[str, dict[int, float]] = {k: {} for k in ops}
    for op, run in ops.items():  # warm: one untimed pass at the low point
        run(cached[LOW_DOCS])
    for _ in range(PASSES):
        for n in counts:
            for op, run in ops.items():
                t0 = time.time()
                run(cached[n])
                w = time.time() - t0
                if n not in walls[op] or w < walls[op][n]:
                    walls[op][n] = w

    lo, hi = counts
    result = {
        "n_docs": {"low": lo, "high": hi},
        "passes": PASSES,
        "cores": cores,
        "walls_s": {
            op: {str(n): round(w, 2) for n, w in per.items()}
            for op, per in walls.items()
        },
        # wall growth per 4x docs; ~<= SCALE means at-worst-linear in docs
        "wall_ratio_at_4x_docs": {
            op: round(per[hi] / per[lo], 2) for op, per in walls.items()
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/text_ops_scale_latest.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
