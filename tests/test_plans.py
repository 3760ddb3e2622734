"""Physical-plan assertions: the optimizations the engine relies on must
actually appear in the executed plan (a scan reading all columns for a
2-column projection is wrong even if results match)."""

import pytest
from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.operators import relational

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_eq_in_predicates_push_to_scan(spark):
    plan = plan_of(relational.pushdown_eq_in(spark, SF))
    pushed = plan.split("PushedFilters:")[1][:250]
    assert "c_mktsegment" in pushed and "In(c_nationkey" in pushed


def test_projection_prunes_scan_columns(spark):
    plan = plan_of(relational.projection_reorder_duplicate(spark, SF))
    read = plan.split("ReadSchema:")[1][:250]
    # only the three source columns, not all 11 lineitem columns
    assert "l_quantity" in read and "l_orderkey" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_small_dims_broadcast(spark):
    plan = plan_of(relational.broadcast_join_enrich(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(relational.global_top_k(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_aggregate_has_partial_combine(spark):
    plan = plan_of(relational.q1_pricing_summary(spark, SF))
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_relational_ops(spark):
    df = relational.q1_pricing_summary(spark, SF)
    df.collect()  # AQE finalizes the plan only after execution
    plan = plan_of(df)
    # "*(n)" prefixes mark whole-stage-codegen spans in the final plan
    assert "*(" in plan
    # no python UDFs anywhere in the relational path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_encode_pipeline_plan_shape(spark):
    from hadoop_etl_udfs_spark.operators.encode import encode_pages
    from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 200, seed=1)
    plan = plan_of(encode_pages(pages))
    # exactly one shuffle (the salted repartition), then the Arrow kernel
    assert plan.count("Exchange hashpartitioning") == 1
    assert "MapInArrow" in plan or "mapInArrow" in plan.lower()
    assert "Sort" in plan  # sortWithinPartitions before encode
