"""Set operations (SURVEY.md §2.7 — Hive 1.1 rewrites, Spark native)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


def _cust_nations(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp_nations(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_union_all",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "UNION ALL SELECT s_nationkey FROM supplier"
    ),
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no shuffle (plain concatenation of
    partitions)."""
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))


@query(
    "set_union",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "UNION SELECT s_nationkey FROM supplier"
    ),
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + hash dedup."""
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
    )


@query(
    "set_intersect",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "INTERSECT SELECT s_nationkey FROM supplier"
    ),
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics in both engines)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set_except",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "EXCEPT SELECT s_nationkey FROM supplier"
    ),
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS (distinct semantics)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@query(
    "set_except_all",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "EXCEPT ALL SELECT s_nationkey FROM supplier"
    ),
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (beyond Hive 1.1; Spark + DuckDB
    both support it natively)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


@query(
    "dedup_exact",
    oracle=(
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
    ),
    tags=("setop", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — exact dedup by hash aggregation (map-side
    partial dedup before the shuffle)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )
