"""Source/sink format breadth: the engine standardizes on Parquet
(SURVEY.md §2.1 — the reference's only storage was Kudu), but the Spark
file-source layer gives CSV/JSON for free; these tests pin the
round-trip contracts so the claim is backed by evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _sample(spark):
    return (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") < 50)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_csv")
    df.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(df.schema).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_json")
    df.write.json(path)
    back = spark.read.schema(df.schema).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_predicate_pushdown_roundtrip(spark, tmp_path):
    """Written-out engine tables keep pushdown working on re-read."""
    from hivekudu_handler_spark.plans.checks import pushed_filters

    df = _sample(spark)
    path = str(tmp_path / "orders_parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_totalprice") > 100000)
    assert "o_totalprice" in pushed_filters(back)
