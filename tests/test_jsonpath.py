"""JsonPath parser + applier tests (reference family: jsonpath/JsonPathTest.java
and the import-walk path tests HdfsSerDeImportServiceTest.java:114-127)."""

from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.functions.jsonpath import (
    json_path_col,
    json_path_str,
    json_path_str_expr,
    parse_json_path,
)


def test_parse_reference_spec():
    # the reference's own spec test: JsonPathTest.java:23
    assert parse_json_path('f1.f2[0]."f3.x".f4[1][2]') == [
        "f1", "f2", 0, "f3.x", "f4", 1, 2,
    ]


def test_parse_families():
    assert parse_json_path("a") == ["a"]
    assert parse_json_path("a.b.c") == ["a", "b", "c"]
    assert parse_json_path("a[10][2]") == ["a", 10, 2]
    assert parse_json_path('"with space"') == ["with space"]
    assert parse_json_path('"a.b"."c[0]x"') == ["a.b", "c[0]x"]
    assert parse_json_path('""') == [""]


def test_json_path_str_expr_compilation():
    assert json_path_str_expr("a.b[1]") == "$.a.b[1]"
    assert json_path_str_expr('"a.b"') == "$['a.b']"
    assert json_path_str_expr('"with space".inner[0]') == "$['with space'].inner[0]"


def test_native_walk_and_string_walk_agree(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.struct(
            (F.col("id") * 10).alias("a.b"),
            F.array(F.lit("x"), F.lit("y")).alias("arr"),
            F.struct(F.lit("deep").alias("inner.key")).alias("with space"),
        ).alias("s"),
    )
    out = df.select(
        "id",
        json_path_col(F.col("s"), '"a.b"').alias("ab"),
        json_path_col(F.col("s"), "arr[1]").alias("arr1"),
        json_path_col(F.col("s"), "arr[9]").alias("oob"),  # -> NULL, not throw
        json_path_col(F.col("s"), '"with space"."inner.key"').alias("deep"),
        json_path_str(F.to_json(F.col("s")), '"a.b"').cast("long").alias("j_ab"),
        json_path_str(F.to_json(F.col("s")), '"with space"."inner.key"').alias(
            "j_deep"
        ),
        json_path_str(F.to_json(F.col("s")), '"no.such"').alias("j_missing"),
    ).collect()
    for r in out:
        assert r["ab"] == r["id"] * 10 == r["j_ab"]
        assert r["arr1"] == "y"
        assert r["oob"] is None
        assert r["deep"] == "deep" == r["j_deep"]
        assert r["j_missing"] is None
