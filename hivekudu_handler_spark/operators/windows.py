"""Window functions (SURVEY.md §2.5 — Hive 1.1 windowing surface,
``pom.xml:28-32``).

Determinism discipline for differential testing: every ORDER BY inside a
window ends with a unique tiebreaker column so ROW_NUMBER/NTILE/frames are
well-defined in both engines.

Scale: a window = one shuffle on its partition key + a local sort; the
partition keys here (mktsegment, user_id) are the same keys the data
would be bucketed by at 100 TB, so the sort is the only added cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "win_rank",
    oracle=(
        "SELECT c_custkey, c_mktsegment, c_acctbal, "
        "       ROW_NUMBER() OVER w AS rn, "
        "       RANK() OVER w AS rnk, "
        "       DENSE_RANK() OVER w AS drnk, "
        "       NTILE(4) OVER w AS quartile "
        "FROM customer "
        "WINDOW w AS (PARTITION BY c_mktsegment "
        "             ORDER BY c_acctbal DESC, c_custkey)"
    ),
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER / RANK / DENSE_RANK / NTILE."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_cume_dist",
    oracle=(
        "SELECT c_custkey, c_mktsegment, "
        "       PERCENT_RANK() OVER w AS pct_rank, "
        "       CUME_DIST() OVER w AS cume "
        "FROM customer "
        "WINDOW w AS (PARTITION BY c_mktsegment "
        "             ORDER BY c_acctbal, c_custkey)"
    ),
    tags=("window",),
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST — relative-position analytics.  Both are
    integer ratios ((rank-1)/(n-1), rank/n) evaluated as one IEEE
    division, so cross-engine values are bit-exact without rounding."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_analytic",
    oracle=(
        "SELECT event_id, user_id, value, "
        "       LAG(value) OVER w AS prev_value, "
        "       LEAD(value) OVER w AS next_value, "
        "       FIRST_VALUE(event_id) OVER w AS first_event, "
        "       LAST_VALUE(event_id) OVER "
        "         (PARTITION BY user_id ORDER BY ts, event_id "
        "          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "         AS last_event "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    tags=("window",),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / LEAD / FIRST_VALUE / LAST_VALUE (full-frame LAST_VALUE so
    both engines agree — default frames for LAST_VALUE are a classic
    cross-engine trap)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@query(
    "win_agg_frame",
    oracle=(
        "SELECT event_id, user_id, value, "
        "       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) "
        "         AS running_sum, "
        "       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) "
        "         AS moving_avg, "
        "       COUNT(*) OVER (PARTITION BY user_id) AS user_events "
        "FROM events"
    ),
    tags=("window",),
)
def win_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over ROWS frames: running sum, moving average, and a
    whole-partition count."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(
            F.sum("value").over(wo.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_sum"),
        F.round(F.avg("value").over(wo.rowsBetween(-3, 0)), 4).alias("moving_avg"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("user_events"),
    )


@query(
    "win_range_frame",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, "
        "       COUNT(*) OVER w AS n_in_band, "
        "       ROUND(SUM(o_totalprice) OVER w, 2) AS sum_band "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice "
        "             RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)"
    ),
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame — the VALUE-distance window, distinct from
    ``win_agg_frame``'s ROWS frames in two ways both engines must agree
    on: the band is defined by the ORDER expression's value (here
    "orders within $5000 below mine"), and ALL PEERS of the current row
    (exact price ties) join the frame regardless of physical position.
    Same execution shape as any window: one shuffle on the partition
    key, one sorted pass per partition with a sliding value-bounded
    accumulator."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_band"),
    )


@query(
    "win_ignore_nulls",
    oracle=(
        "SELECT o_orderkey, pri, "
        "       FIRST_VALUE(pri IGNORE NULLS) OVER w AS first_known, "
        "       LAST_VALUE(pri IGNORE NULLS) OVER w AS latest_known "
        "FROM (SELECT o_orderkey, o_orderstatus, "
        "             NULLIF(o_orderpriority, '3-MEDIUM') AS pri "
        "      FROM orders) t "
        "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey "
        "             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    ),
    tags=("window",),
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with IGNORE NULLS — the gap-carrying
    window (last observation carried forward / first known value), the
    idiom every sparse time-series fill uses.  NULLs synthesized via
    NULLIF in both engines; the running frame makes ``latest_known`` the
    classic LOCF column.  Plan shape: one shuffle on the partition key,
    one sorted pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pri"),
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "pri",
        F.first("pri", ignorenulls=True).over(w).alias("first_known"),
        F.last("pri", ignorenulls=True).over(w).alias("latest_known"),
    )
