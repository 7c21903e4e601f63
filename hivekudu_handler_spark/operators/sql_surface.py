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


_CTE_RECURSIVE_SQL = """
WITH RECURSIVE chain (suppkey, root, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier WHERE s_suppkey < 10
  UNION ALL
  SELECT s.s_suppkey, c.root, c.depth + 1
  FROM supplier s JOIN chain c
    ON CAST(FLOOR(s.s_suppkey / 10) AS BIGINT) = c.suppkey
  WHERE s.s_suppkey >= 10
)
SELECT root, depth, COUNT(*) AS n_members,
       MIN(suppkey) AS min_suppkey, MAX(suppkey) AS max_suppkey
FROM chain
GROUP BY root, depth
ORDER BY root, depth
"""


@query("cte_recursive", oracle=_CTE_RECURSIVE_SQL, tags=("sql",))
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE``): hierarchy walk over a
    supplier forest where node k's parent is FLOOR(k/10), roots are
    k < 10.  The reference's Hive front-end gained recursive CTEs only
    via repeated-UNION rewrites; Spark 4 executes the ANSI form natively
    as an iterative UnionLoop — each step is one equi-join of the
    frontier against ``supplier``, so depth-d resolution costs d joins
    over frontier-sized inputs, never a transitive-closure cross join.
    Scale: the frontier shrinks geometrically here (10k -> 1k -> ...);
    at 100 TB the per-step join shuffles only the live frontier, and the
    step count is bounded by the hierarchy depth (log_10 n), not rows.
    The identical statement runs on DuckDB as the oracle."""
    _register(spark, sf_dir, "supplier")
    return spark.sql(_CTE_RECURSIVE_SQL)


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


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("sql_q7_volume_shipping", oracle=_Q7_SQL, tags=("sql", "tpch"))
def sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): lineitem
    joins orders (fact⋈fact shuffle) while supplier/customer/nation×2
    broadcast; the nation-pair disjunction is applied after the two
    nation lookups.  Scale path: the only large shuffle is
    orders⋈lineitem on the order key; everything else rides broadcasts
    and the final group-by is 3 low-NDV columns."""
    _register(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_Q7_SQL)


_Q8_SQL = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@query("sql_q8_market_share", oracle=_Q8_SQL, tags=("sql", "tpch"))
def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the widest join tree in
    the suite — 8 relations.  part is the selective gate (p_type filter
    broadcast-semi-reduces lineitem before the fact⋈fact shuffle);
    conditional share = SUM(CASE)/SUM rounded post-aggregation (float
    discipline).  At 100 TB the join order matters enormously and is
    exactly what Catalyst's CBO + AQE reorder; nothing here pins it."""
    _register(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )
    return spark.sql(_Q8_SQL)


# The fixture lineitem has no l_shipmode/l_commitdate/l_receiptdate and
# orders has no o_comment/c_phone (TESTDATA.md), so Q12/Q13/Q17/Q19/Q21/
# Q22 below keep the reference query's PLAN SHAPE (the part that matters
# at scale) with the selective predicates adapted to existing columns;
# each docstring names the substitution.

_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
"""


@query("sql_q12_ship_priority", oracle=_Q12_SQL, tags=("sql", "tpch"))
def sql_q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes vs priority): fact⋈fact join with
    a date-window pushdown and dual conditional counts per category
    (l_returnflag stands in for the absent l_shipmode).  One shuffle for
    the join, one for the 3-group aggregate; SUM(CASE) stays integer
    (cast pins DuckDB's HUGEINT to BIGINT)."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("sql_q13_customer_distribution", oracle=_Q13_SQL, tags=("sql", "tpch"))
def sql_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with an ON-clause filter (customers with zero qualifying orders
    must survive with c_count=0 — the semantics that distinguish ON from
    WHERE on an outer join), double aggregation (per-customer count →
    histogram of counts).  The o_orderpriority predicate stands in for
    the absent o_comment NOT LIKE filter."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("sql_q15_top_supplier", oracle=_Q15_SQL, tags=("sql", "tpch"))
def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a CTE referenced twice — once
    joined, once inside a scalar MAX subquery.  Spark evaluates the CTE
    branches independently (both are one-shuffle aggregates over the same
    pushdown scan); the argmax-by-equality survives cross-engine because
    the within-engine comparison is self-consistent and only the emitted
    revenue is rounded."""
    _register(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_size < 15
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@query("sql_q17_small_quantity", oracle=_Q17_SQL, tags=("sql", "tpch"))
def sql_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    AVG over the same fact table, decorrelated by Catalyst into a
    per-partkey aggregate re-joined to lineitem (p_size stands in for
    the absent p_container).  The threshold comparison is engine-stable:
    l_quantity is integer-valued, so the per-part sums (hence AVG) are
    IEEE-exact in any summation order."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


_Q19_SQL = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("sql_q19_discounted_revenue", oracle=_Q19_SQL, tags=("sql", "tpch"))
def sql_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a 3-arm disjunction mixing
    both sides of the join (part attrs AND lineitem attrs per arm — the
    classic predicate that can't fully push to either scan).  Spark
    extracts the common p_partkey equi-key so the join stays hash-based
    with the disjunction as a post-join filter; per-side IN/range
    fragments still prune row groups."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19_SQL)


_Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("sql_q21_waiting_supplier", oracle=_Q21_SQL, tags=("sql", "tpch"))
def sql_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept others waiting): the
    EXISTS + NOT EXISTS pair over the same fact table — a left-semi and
    a left-anti join both keyed on l_orderkey, sharing the fact shuffle
    partitioning (l_returnflag='R' stands in for the absent
    receipt-after-commit predicate).  Top-100 via
    TakeOrderedAndProject."""
    _register(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM (
  SELECT CAST(c.c_nationkey % 10 AS INT) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey % 5 = 0
    AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
"""


@query("sql_q22_sales_opportunity", oracle=_Q22_SQL, tags=("sql", "tpch"))
def sql_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): uncorrelated scalar
    AVG subquery + NOT EXISTS anti-join against orders, grouped by a
    derived country code (nation-key bucket stands in for the absent
    phone prefix; "no urgent order" for "no order", since every fixture
    customer has orders).  The anti-join needs only two orders columns —
    pruning drops the rest before the shuffle."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


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


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand, ps.supplycost
FROM ps
JOIN part p     ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_type = 'SMALL' AND r.r_name = 'ASIA'
  AND ps.supplycost = (
    SELECT MIN(ps2.supplycost) FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("sql_q2_min_cost_supplier", oracle=_Q2_SQL, tags=("sql", "tpch"))
def sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a part-supplier cost CTE
    (the fixture has no partsupp, so unit cost = MIN(price/qty) from
    lineitem) referenced twice — once in the outer 5-way join, once in a
    correlated MIN subquery Catalyst decorrelates into a per-part
    aggregate joined back.  The cost equality is engine-stable because
    both sides MIN over the identical IEEE division results; nothing is
    rounded pre-comparison.  Dimension tables broadcast; top-100 via
    TakeOrderedAndProject."""
    _register(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


_Q9_SQL = """
SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity) * 10000) AS BIGINT))
            AS BIGINT) / CAST(10000 AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%e%'
GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
"""


@query("sql_q9_product_profit", oracle=_Q9_SQL, tags=("sql", "tpch"))
def sql_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the
    5-relation join tree with a fact⋈fact edge (lineitem⋈orders) plus
    three broadcast dims, grouped on (nation, year).  Supply cost is
    derived from p_retailprice (no partsupp in the fixture).  The profit
    summand carries exactly 4 decimal digits (2dp price × 2dp discount),
    so it is summed as a ×10⁴-scaled BIGINT — an exact sum in any order,
    immune to the ROUND half-boundary flake a double sum hit here —
    then divided back once."""
    _register(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    return spark.sql(_Q9_SQL)


_Q11_SQL = """
WITH val AS (
  SELECT l.l_partkey, SUM(l.l_extendedprice * l.l_quantity) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l.l_partkey
)
SELECT l_partkey, ROUND(value, 2) AS value
FROM val
WHERE value > (SELECT 0.002 * SUM(value) FROM val)
"""


@query("sql_q11_important_stock", oracle=_Q11_SQL, tags=("sql", "tpch"))
def sql_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): a grouped value
    CTE filtered against a scalar fraction of its own global sum — the
    same aggregate evaluated at two granularities.  Spark runs the CTE
    branches as two one-shuffle aggregates over the shared pushdown
    scan; value is rounded only in the emitted column, the threshold
    compares full-precision sums."""
    _register(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("sql_q16_parts_suppliers", oracle=_Q16_SQL, tags=("sql", "tpch"))
def sql_q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    part-supplier pairs (lineitem stands in for partsupp) with a NOT IN
    exclusion subquery (suppliers in deficit stand in for complaint
    comments) and a COUNT(DISTINCT) over three grouping columns.
    NOT IN over a non-nullable key column decorrelates to a null-aware
    anti-join; the distinct pair projection collapses the fact before
    the expensive join."""
    _register(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey)
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT sh.l_suppkey
  FROM shipped sh
  JOIN tot t ON t.l_partkey = sh.l_partkey
  WHERE sh.qty > 0.3 * t.total_qty
    AND sh.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'))
"""


@query("sql_q20_excess_stock", oracle=_Q20_SQL, tags=("sql", "tpch"))
def sql_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): nested IN chain —
    suppliers whose shipped share of a 'red' part exceeds 30% of that
    part's total (share-of-total stands in for partsupp availqty).  The
    share comparison is exact: l_quantity is integer-valued, so both
    sums are IEEE-exact in any order.  Two grouped CTEs share one
    date-pushdown scan; the IN chains decorrelate to semi-joins."""
    _register(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q20_SQL)
