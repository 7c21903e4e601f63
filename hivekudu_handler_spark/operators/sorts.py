"""Sorts, limits, top-k (SURVEY.md §2.6).

Hive 1.1's ORDER BY funnels through a single reducer; Spark's ``orderBy``
range-partitions the sort (sampled boundaries) so a 100 TB global sort
stays parallel.  Top-k compiles to ``TakeOrderedAndProject`` — a per-
partition heap + driver merge of k rows, never a full sort.

LIMIT without ORDER BY is nondeterministic, so every limit here is
anchored to a total order with a unique tiebreaker — otherwise the
differential check (and any user) would see arbitrary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "sort_global",
    oracle=(
        "SELECT o_orderkey, o_totalprice, "
        "       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos "
        "FROM orders"
    ),
    tags=("sort",),
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY.  The order itself is made hash-checkable by
    materializing the rank of each row under the total order (a value
    hash is order-insensitive, so the position column carries the
    ordering information)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("pos"))
    )


@query(
    "sort_partition",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem"
    ),
    tags=("sort",),
)
def sort_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT BY / DISTRIBUTE BY (Hive): repartition on a key + sort within
    partitions.  Per-partition order is not part of the result *set*, so
    the oracle is the plain projection — the operator's contract is
    layout, asserted in tests via ``sortWithinPartitions`` plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "limit_n",
    oracle=(
        "SELECT o_orderkey, o_orderdate FROM orders "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    tags=("sort",),
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT anchored to a total order for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_orderdate").limit(100)


@query(
    "topk",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    tags=("sort",),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → ``TakeOrderedAndProject`` (per-partition heap,
    no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle=(
        "SELECT * FROM ("
        "  SELECT c_mktsegment, c_custkey, c_acctbal, "
        "         ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
        "                            ORDER BY c_acctbal DESC, c_custkey) AS rn "
        "  FROM customer) t WHERE rn <= 3"
    ),
    tags=("sort",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: windowed row_number + filter (the windowed idiom
    Hive 1.1 used; Spark pushes the rank filter into the window via
    ``WindowGroupLimit`` so each partition keeps only k rows)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@query(
    "sort_nulls_order",
    oracle=(
        "SELECT o_orderkey, pri, "
        "       CAST(ROW_NUMBER() OVER (ORDER BY pri ASC NULLS FIRST, "
        "                               o_orderkey) AS INT) AS pos "
        "FROM (SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri "
        "      FROM orders) t"
    ),
    tags=("sort",),
)
def sort_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (NULLS FIRST against Spark's
    ASC default of nulls-first and DuckDB's default of NULLS LAST — the
    cross-engine trap this key pins down by SAYING the placement).  The
    fixture has no NULLs by construction, so the sort key synthesizes
    them with NULLIF in both engines; position is materialized so the
    order itself is value-hashed."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pri"),
    )
    w = Window.orderBy(F.col("pri").asc_nulls_first(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "pri",
        F.row_number().over(w).cast("int").alias("pos"),
    )
