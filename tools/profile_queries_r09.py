"""Round-9 measurement harness (guide §1): per-query noop-sink timing +
.explain("formatted") capture for every headline query.

Separate from bench.py (frozen for measurement): this is the isolation
harness whose numbers OPTIMIZATION_r09.md cites. Plans go to
plans/r09/<query>_<tag>.txt.

Usage: python tools/profile_queries_r09.py [tag] [query ...]
  tag defaults to "before"; with no query names, all headline queries run.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "3"))

HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "metrics_rollup",
    "window_user_sessions",
    "broadcast_join_enrich",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash64",
    "cosine_topk",
    "text_stats",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE_QUERIES

    from hadoop_etl_udfs_spark.session import get_spark

    spark = get_spark(
        app_name="profile_r09", cores=CPUS,
        shuffle_partitions=max(32, CPUS),
        chunk_rows=16384,
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    plans_dir = os.path.join(REPO, "plans", "r09")
    os.makedirs(plans_dir, exist_ok=True)

    times: dict[str, list[float]] = {n: [] for n in names}
    # interleaved passes, per-query minima (CLAUDE.md throttle rule)
    for p in range(PASSES):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
            if p == 0:
                with open(
                    os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
    spark.sparkContext.setJobDescription(None)
    out = {
        "tag": tag,
        "minima": {n: min(t) for n, t in times.items()},
        "draws": times,
    }
    print(json.dumps(out, indent=1))
    with open(
        os.path.join(REPO, "BENCH", f"profile_queries_r09_{tag}.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
