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
        "       ROUND(c_acctbal - (SELECT AVG(c_acctbal) FROM customer), 2) "
        "         AS bal_vs_avg "
        "FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)"
    ),
    tags=("sql",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (computed once, broadcast into the filter).

    ``bal_vs_avg`` is rounded post-aggregation (repo float discipline):
    AVG depends on summation order, which differs between Spark's partial
    aggregation and DuckDB, so the raw double would flake the value hash
    at other partitionings."""
    _register(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               ROUND(c_acctbal - (SELECT AVG(c_acctbal) FROM customer), 2)
                 AS bal_vs_avg
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


_Q4_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@query("sql_q4_order_priority", oracle=_Q4_SQL, tags=("sql", "tpch"))
def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS
    decorrelated by Catalyst into a left-semi join on the order key.
    Scale path: the semi-join shuffles once on l_orderkey/o_orderkey and
    drops lineitem payload columns before the shuffle."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("sql_q6_forecast_revenue", oracle=_Q6_SQL, tags=("sql", "tpch"))
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan→filter→agg with
    every predicate pushed to the Parquet scan (range + BETWEEN), zero
    joins, partial+final aggregation — the cheapest possible plan and the
    canonical pushdown benchmark at 100 TB (reads ~3 columns of one
    row-group-pruned table)."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("sql_q10_returned_items", oracle=_Q10_SQL, tags=("sql", "tpch"))
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): fact⋈fact shuffle join
    (orders⋈lineitem) with broadcast dims (customer, nation), group by
    customer, global top-20 via TakeOrderedAndProject — no full sort."""
    _register(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


_Q14_SQL = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""


@query("sql_q14_promo_effect", oracle=_Q14_SQL, tags=("sql", "tpch"))
def sql_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): broadcast join to part,
    conditional aggregation (CASE inside SUM), single global aggregate.
    The month filter is pushed to the scan so only ~1/12 of lineitem's
    row groups are read."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14_SQL)


_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("sql_q18_large_volume", oracle=_Q18_SQL, tags=("sql", "tpch"))
def sql_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customer): IN over a grouped HAVING
    subquery (left-semi join against a pre-aggregated fact), then the
    3-way join + group-by.  l_quantity is integer-valued, so SUM over
    doubles is exact and the >300 threshold is engine-stable.  Scale
    path: the HAVING subquery and the outer join reuse the same
    l_orderkey hash partitioning; AQE plans the semi-join side."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_SQL)


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
