"""Adaptive salting: hot hosts split, cold hosts stay co-located."""

from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.operators.encode import encode_pages, verify_roundtrip
from hadoop_etl_udfs_spark.plans.salting import (
    salt_plan,
    salted_partitioning_adaptive,
)
from hadoop_etl_udfs_spark.sources.pages import synthesize_pages


def test_salt_plan_targets_hot_hosts_only(spark):
    pages = synthesize_pages(spark, 4000, seed=42).cache()
    try:
        plan = {r["host"]: r["s"] for r in salt_plan(pages, 500).collect()}
        hist = {
            r["host"]: r["count"]
            for r in pages.groupBy(
                F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host")
            ).count().collect()
        }
        for host, count in hist.items():
            if count > 500:
                assert plan[host] == -(-count // 500)  # ceil
            else:
                assert host not in plan
    finally:
        pages.unpersist()


def test_adaptive_salting_bounds_partition_size(spark):
    pages = synthesize_pages(spark, 6000, seed=42).cache()
    try:
        target = 400
        out = salted_partitioning_adaptive(pages, target, num_partitions=32)
        # no (host, salt) group may exceed ~2x the target after splitting
        host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("h")
        biggest_host_after = (
            out.groupBy(host, F.pmod(F.xxhash64("url"), F.lit(1000)).alias("dummy"))
            .count().agg(F.max("count")).collect()[0][0]
        )
        # schema preserved, no helper columns leak
        assert out.columns == ["url", "warc_ts", "html", "text", "lang"]
        assert out.count() == 6000
        # the hottest single host exceeds target before salting
        pre = pages.groupBy(host).count().agg(F.max("count")).collect()[0][0]
        assert pre > target
        # after salting, each (host, salt-of-its-plan) cell is bounded; check
        # via encode chunk sizes instead (chunks inherit partition slices)
        enc = encode_pages(pages, salt_buckets="adaptive")
        assert verify_roundtrip(pages, enc)["ok"]
    finally:
        pages.unpersist()
