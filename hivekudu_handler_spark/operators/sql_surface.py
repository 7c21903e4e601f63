"""SQL-API surface: the engine's queries are equally expressible through
``spark.sql`` over registered views — the exact contract the reference
served ("arbitrary Hive SQL over handler tables", ``README.md:4-7``,
Hive engine dep ``pom.xml:28-32``).  These keys exercise subqueries,
CTEs, and multi-join analytical shapes through the SQL front-end so the
parser/analyzer path is covered, not just the DataFrame builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "filter_pushdown",
    oracle=(
        "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem "
        "WHERE l_quantity >= 30 AND l_discount > 0.04 AND l_returnflag <> 'A'"
    ),
    tags=("filter",),
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown as a first-class key (SURVEY.md §2.2
    ``filter_pushdown``): the reference stubbed decomposePredicate
    (``KuduStorageHandler.java:187-193``) so nothing was pushed; here a
    compound predicate reaches the Parquet scan as PushedFilters
    (asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_discount") > 0.04)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_partkey", "l_quantity")


@query(
    "subquery_in",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer "
        "                    WHERE c_mktsegment = 'BUILDING') "
        "  AND o_orderstatus = 'F'"
    ),
    tags=("sql",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (decorrelates to a left-semi join)."""
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'F'
        """
    )


@query(
    "subquery_scalar",
    oracle=(
        "SELECT c_custkey, c_acctbal, "
        "       c_acctbal - (SELECT AVG(c_acctbal) FROM customer) AS bal_vs_avg "
        "FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)"
    ),
    tags=("sql",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (computed once, broadcast into the filter)."""
    _register(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               c_acctbal - (SELECT AVG(c_acctbal) FROM customer) AS bal_vs_avg
        FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


@query(
    "subquery_correlated",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o "
        "WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders o2 "
        "                      WHERE o2.o_custkey = o.o_custkey)"
    ),
    tags=("sql",),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join — Hive 1.1 could not run this shape at all)."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "cte_agg",
    oracle=(
        "WITH seg AS (SELECT c_mktsegment, c_custkey FROM customer), "
        "     spend AS (SELECT o_custkey, SUM(o_totalprice) AS total "
        "               FROM orders GROUP BY o_custkey) "
        "SELECT seg.c_mktsegment, COUNT(*) AS n_customers, "
        "       ROUND(SUM(COALESCE(spend.total, 0)), 2) AS segment_spend "
        "FROM seg LEFT JOIN spend ON seg.c_custkey = spend.o_custkey "
        "GROUP BY seg.c_mktsegment"
    ),
    tags=("sql",),
)
def cte_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE pipeline: per-customer aggregate joined back per segment."""
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH seg AS (SELECT c_mktsegment, c_custkey FROM customer),
             spend AS (SELECT o_custkey, SUM(o_totalprice) AS total
                       FROM orders GROUP BY o_custkey)
        SELECT seg.c_mktsegment, COUNT(*) AS n_customers,
               ROUND(SUM(COALESCE(spend.total, 0)), 2) AS segment_spend
        FROM seg LEFT JOIN spend ON seg.c_custkey = spend.o_custkey
        GROUP BY seg.c_mktsegment
        """
    )


_Q3_SQL = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1996-06-30'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("sql_q3_shipping_priority", oracle=_Q3_SQL, tags=("sql", "tpch"))
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority) adapted to the fixture schema:
    3-way join, filter on both fact and dims, aggregate, global top-10.
    Scale path: customer is broadcast, orders⋈lineitem shuffles on the
    order key, top-10 via TakeOrderedAndProject."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3_SQL)


_Q5_SQL = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n.n_name
"""


@query("sql_q5_local_volume", oracle=_Q5_SQL, tags=("sql", "tpch"))
def sql_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (volume by nation): 5-way star join — every
    dimension broadcasts, the single shuffle is the final group-by."""
    _register(spark, sf_dir, "region", "nation", "customer", "orders", "lineitem")
    return spark.sql(_Q5_SQL)


@query(
    "sort_distribute_sql",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_quantity > 45"
    ),
    tags=("sql", "sort"),
)
def sort_distribute_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's DISTRIBUTE BY / SORT BY through the SQL front-end (Spark
    SQL keeps both clauses): repartition on the key + per-partition sort.
    The result *set* equals the plain filter (per-partition order is a
    layout property, not a row-set property — same contract as
    ``sort_partition``)."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity > 45
        DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber
        """
    )
