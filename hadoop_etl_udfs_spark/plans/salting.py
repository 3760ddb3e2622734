"""Adaptive skew salting: per-host salt fan-out from a host histogram.

The reference balances work by round-robin file assignment
(HCatTableFiles.java:128 ``i % parallelism``) — blind to skew inside files.
Here the Zipf head of url hosts is measured first (one aggregate, cheap
relative to encode) and only genuinely hot hosts are split:

    salt(url) = pmod(xxhash64(url), S_host),
    S_host    = ceil(host_rows / target_rows_per_chunk)   (1 for cold hosts)

Cold hosts keep S=1 so their pages stay co-located (better chunk-local
dictionaries); hot hosts fan out just enough to bound any single partition.
The mapping ships as a broadcast join (no extra shuffle).

At 10^12 docs the histogram pass uses the same plan — a hash aggregate over
the host column with map-side combine; cap the collected map with
``max_hot_hosts`` (everything below the cap is cold by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-z]+://([^/]+)"


def host_histogram(df: DataFrame, max_hot_hosts: int = 100_000) -> DataFrame:
    return (
        df.groupBy(F.regexp_extract("url", HOST_RE, 1).alias("host"))
        .count()
        .orderBy(F.desc("count"))
        .limit(max_hot_hosts)
    )


def salt_plan(
    df: DataFrame,
    target_rows_per_chunk: int = 65536,
    max_hot_hosts: int = 100_000,
) -> DataFrame:
    """(host, s) for hosts that need splitting (s >= 2); cold hosts absent."""
    hist = host_histogram(df, max_hot_hosts)
    return hist.filter(F.col("count") > target_rows_per_chunk).select(
        "host",
        F.ceil(F.col("count") / target_rows_per_chunk).cast("int").alias("s"),
    )


def partition_histogram(df: DataFrame) -> dict:
    """Realized partition-size stats of a (salted) plan: rows per physical
    partition after the shuffle actually runs. ``spread`` = max/mean — 1.0 is
    perfectly balanced; the straggler wall-clock multiplier for a CPU-bound
    stage downstream of this shuffle is ~``spread`` when partitions >> cores
    doesn't hold. Used by the bench's skew-salting evidence and the
    histogram tests; one count aggregate, no collect of data rows."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.count("*").alias("n_partitions"),
            F.max("count").alias("max_rows"),
            F.avg("count").alias("mean_rows"),
        )
        .collect()[0]
    )
    if rows["n_partitions"] == 0:
        raise ValueError(
            "partition_histogram: the plan produced no partitions with rows "
            "(empty input?) — spread statistics are undefined"
        )
    return {
        "n_partitions": int(rows["n_partitions"]),
        "max_rows": int(rows["max_rows"]),
        "mean_rows": round(float(rows["mean_rows"]), 1),
        "spread": round(rows["max_rows"] / rows["mean_rows"], 2),
    }


def salted_partitioning_adaptive(
    df: DataFrame,
    target_rows_per_chunk: int = 65536,
    num_partitions: int | None = None,
) -> DataFrame:
    """Histogram pass -> broadcast salt map -> shuffle + in-partition sort."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    plan = salt_plan(df, target_rows_per_chunk)
    host = F.regexp_extract("url", HOST_RE, 1)
    salted = (
        df.withColumn("_host", host)
        .join(F.broadcast(plan), F.col("_host") == F.col("host"), "left")
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64("url"), F.coalesce(F.col("s"), F.lit(1))),
        )
        .repartition(num_partitions, F.col("_host"), F.col("_salt"))
        .sortWithinPartitions("lang", "url")
        .drop("_host", "_salt", "host", "s")
    )
    return salted
