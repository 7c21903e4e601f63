"""Join operators (SURVEY.md §2.3).

The reference implements no joins itself; every Hive join shape was enabled
over handler tables by feeding rows through the SerDe
(``HiveKuduSerDe.java:146-158``, Hive engine dep ``pom.xml:28-32``).  Hive
1.1 supported equi inner/outer/semi joins plus cross; our Spark surface
matches and exceeds it (native anti, theta via broadcast-nested-loop,
as-of via a sorted per-key merge).

Scale notes per operator are in the docstrings: small dimensions are
explicitly ``broadcast()`` so the 100 TB fact table never shuffles for a
dimension join; AQE's skew-join splitting covers key skew on the
shuffle-based ones.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "join_inner",
    oracle=(
        "SELECT o.o_orderkey, c.c_name, o.o_totalprice "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_orderstatus = 'O'"
    ),
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (Hive shuffle/sort-merge ≈ Spark SMJ/SHJ; Catalyst
    + AQE pick the physical strategy at runtime)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
    )


@query(
    "join_broadcast",
    oracle=(
        "SELECT p.p_brand, COUNT(*) AS n_lines, "
        "       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "GROUP BY p.p_brand"
    ),
    tags=("join",),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join ≈ Hive mapjoin: the dimension is broadcast so the
    fact table is joined without any shuffle — the essential pattern for
    a 100 TB ``lineitem``."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_left",
    oracle=(
        "SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_custkey, c.c_name"
    ),
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; COUNT(col) counts only matches, preserving
    zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right",
    oracle=(
        "SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment "
        "FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@query(
    "join_full",
    oracle=(
        "WITH cust AS (SELECT c_nationkey AS nk, "
        "              ROUND(SUM(c_acctbal), 2) AS cust_bal "
        "              FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey), "
        "     supp AS (SELECT s_nationkey AS nk, "
        "              ROUND(SUM(s_acctbal), 2) AS supp_bal "
        "              FROM supplier GROUP BY s_nationkey) "
        "SELECT COALESCE(cust.nk, supp.nk) AS nationkey, cust_bal, supp_bal "
        "FROM cust FULL JOIN supp ON cust.nk = supp.nk"
    ),
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (unmatched sides on both ends)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    supp = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.round(F.sum("s_acctbal"), 2).alias("supp_bal")
    )
    return (
        cust.join(supp, cust.nk == supp.nk, "full")
        .select(
            F.coalesce(cust.nk, supp.nk).alias("nationkey"),
            "cust_bal",
            "supp_bal",
        )
    )


@query(
    "join_semi",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "              AND o.o_totalprice > 400000)"
    ),
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (Hive's EXISTS idiom) — emits each match once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS (a rewrite in Hive 1.1, native in Spark)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    oracle=(
        "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n"
    ),
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (bounded to dimension tables; Spark executes as
    broadcast nested loop)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta",
    oracle=(
        "SELECT r1.r_name AS r_low, r2.r_name AS r_high "
        "FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey"
    ),
    tags=("join",),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality join — Hive 1.1 required cross+filter; Spark plans
    a broadcast nested loop with the predicate applied inline."""
    r1 = load_table(spark, sf_dir, "region").alias("r1")
    r2 = load_table(spark, sf_dir, "region").alias("r2")
    return r1.join(
        r2, F.col("r1.r_regionkey") < F.col("r2.r_regionkey")
    ).select(F.col("r1.r_name").alias("r_low"), F.col("r2.r_name").alias("r_high"))


@query(
    "join_range",
    oracle=(
        "SELECT o.o_orderpriority, COUNT(*) AS n_lines, "
        "       ROUND(SUM(l.l_extendedprice), 2) AS sum_price "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "  AND l.l_shipdate >= o.o_orderdate "
        "  AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY "
        "GROUP BY o.o_orderpriority"
    ),
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range join: equi key + time-band predicate.  The equi
    component keeps it a hash/SMJ join (the band is a post-join filter),
    so it scales like a normal key join — no nested loop."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


_ASOF_SCHEMA = (
    "purchase_id bigint, user_id bigint, view_id bigint, gap_us bigint"
)


_EMPTY_ASOF = pd.DataFrame(
    {
        "purchase_id": pd.Series(dtype="int64"),
        "user_id": pd.Series(dtype="int64"),
        "view_id": pd.Series(dtype="int64"),
        "gap_us": pd.Series(dtype="int64"),
    }
)


def _asof_merge(pdf: pd.DataFrame) -> pd.DataFrame:
    """Bucket-level sorted as-of merge: one ``pandas.merge_asof`` call
    with ``by='user_id'`` handles every user in the bucket (far cheaper
    than one Python call per user)."""
    left = (
        pdf[pdf["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        .sort_values("ts", kind="stable")
        .rename(columns={"event_id": "purchase_id"})
    )
    right = (
        pdf[pdf["event_type"] == "view"][["event_id", "user_id", "ts"]]
        .sort_values("ts", kind="stable")
        .rename(columns={"event_id": "view_id", "ts": "view_ts"})
    )
    if left.empty or right.empty:
        return _EMPTY_ASOF
    merged = pd.merge_asof(
        left,
        right,
        left_on="ts",
        right_on="view_ts",
        by="user_id",
        direction="backward",
    )
    merged = merged.dropna(subset=["view_id"])
    merged["gap_us"] = (
        (merged["ts"] - merged["view_ts"]).astype("timedelta64[us]").astype("int64")
    )
    merged["view_id"] = merged["view_id"].astype("int64")
    return merged[["purchase_id", "user_id", "view_id", "gap_us"]]


@query(
    "join_asof",
    # explicit ROW_NUMBER formulation, not DuckDB ASOF JOIN: ASOF
    # tie-selection among equal right-side timestamps is unspecified,
    # while the Spark side deterministically picks the MAX event_id
    # among equal-ts prior views — the oracle must encode the same
    # total order (r7 ADVICE; join_asof_nearest precedent)
    oracle=(
        "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT * FROM events WHERE event_type = 'view'), "
        "pairs AS ("
        "  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id, "
        "         date_diff('microsecond', v.ts, p.ts) AS gap_us, "
        "         ROW_NUMBER() OVER (PARTITION BY p.event_id "
        "           ORDER BY v.ts DESC, v.event_id DESC) AS rn "
        "  FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts) "
        "SELECT purchase_id, user_id, view_id, gap_us FROM pairs WHERE rn = 1"
    ),
    tags=("join", "custom"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent prior view.

    No single built-in Spark join expresses this (SURVEY.md §2.3
    ``join_asof``), but it IS expressible as union + running window —
    100% JVM, whole-stage-codegen'd, no Python in the path: interleave
    both event kinds, sort per user by (ts, views-first), and carry the
    last non-null view id/ts forward with an incremental
    UnboundedPreceding→CurrentRow frame.  One shuffle on ``user_id`` +
    one local sort — the same cost as any windowed aggregate, with no
    per-group Python invocation.  ``asof_join_pandas`` keeps the
    ``merge_asof`` formulation as the custom-operator escape hatch;
    tests assert both produce identical results.

    Ordering detail: views sort before purchases at equal ``ts`` so a
    same-instant view qualifies (``v.ts <= p.ts``), with ``event_id`` as
    the final deterministic tiebreaker.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("event_id", "user_id", "ts", "event_type")
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", is_purchase, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_id", F.last(view_id, ignorenulls=True).over(w))
        .withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_view_id").alias("view_id"),
            (
                F.unix_micros("ts") - F.unix_micros("last_view_ts")
            ).alias("gap_us"),
        )
    )


_ASOF_TOL_US = 7 * 86_400_000_000  # 7 days


@query(
    "join_asof_tolerance",
    # same deterministic ROW_NUMBER formulation as join_asof's oracle
    oracle=(
        "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT * FROM events WHERE event_type = 'view'), "
        "pairs AS ("
        "  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id, "
        "         date_diff('microsecond', v.ts, p.ts) AS gap_us, "
        "         ROW_NUMBER() OVER (PARTITION BY p.event_id "
        "           ORDER BY v.ts DESC, v.event_id DESC) AS rn "
        "  FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts) "
        "SELECT purchase_id, user_id, view_id, gap_us FROM pairs "
        f"WHERE rn = 1 AND gap_us <= {_ASOF_TOL_US}"
    ),
    tags=("join", "custom"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance window: the most recent prior view,
    kept only when it happened within 7 days of the purchase — the
    standard guard against stale matches in feature joins
    (``pandas.merge_asof(tolerance=...)`` semantics: nearest first,
    THEN the cutoff, so a purchase whose nearest view is older than the
    tolerance matches nothing rather than a farther-back view).  Pure
    post-filter over the windowed as-of — same one-shuffle plan."""
    return join_asof(spark, sf_dir).filter(F.col("gap_us") <= _ASOF_TOL_US)


@query(
    "join_asof_forward",
    # explicit ROW_NUMBER oracle: the Spark side picks the MIN event_id
    # among equal-ts later views; DuckDB ASOF tie-selection is
    # unspecified, so encode the exact order (r7 ADVICE)
    oracle=(
        "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT * FROM events WHERE event_type = 'view'), "
        "pairs AS ("
        "  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id, "
        "         date_diff('microsecond', p.ts, v.ts) AS gap_us, "
        "         ROW_NUMBER() OVER (PARTITION BY p.event_id "
        "           ORDER BY v.ts ASC, v.event_id ASC) AS rn "
        "  FROM p JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts) "
        "SELECT purchase_id, user_id, view_id, gap_us FROM pairs WHERE rn = 1"
    ),
    tags=("join", "custom"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the user's EARLIEST view
    at-or-after it (the "next touchpoint" direction — attribution and
    follow-up analyses need it as much as the backward form).  Exactly
    the ``join_asof`` machinery mirrored: per-user descending-ts scan
    carrying the next view backward with an incremental frame; views
    order before purchases at equal ``ts`` so a same-instant view
    qualifies (``v.ts >= p.ts``).  One shuffle + one local sort, all
    JVM."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("event_id", "user_id", "ts", "event_type")
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), is_purchase, F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("next_view_id", F.last(view_id, ignorenulls=True).over(w))
        .withColumn("next_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("next_view_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("next_view_id").alias("view_id"),
            (
                F.unix_micros("next_view_ts") - F.unix_micros("ts")
            ).alias("gap_us"),
        )
    )


@query(
    "join_asof_nearest",
    oracle=(
        "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT * FROM events WHERE event_type = 'view'), "
        "pairs AS ("
        "  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id, "
        "         abs(date_diff('microsecond', v.ts, p.ts)) AS abs_gap_us, "
        "         CASE WHEN v.ts <= p.ts THEN 'backward' ELSE 'forward' END "
        "           AS direction, "
        "         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY "
        "           abs(date_diff('microsecond', v.ts, p.ts)), "
        "           CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END, "
        "           CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END"
        "         ) AS rn "
        "  FROM p JOIN v ON p.user_id = v.user_id) "
        "SELECT purchase_id, user_id, view_id, abs_gap_us, direction "
        "FROM pairs WHERE rn = 1"
    ),
    tags=("join", "custom"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: for each purchase, the view closest in time in
    EITHER direction (``pandas.merge_asof(direction='nearest')``), ties
    broken toward the prior view.

    Composed from the two directional scans over ONE shuffle: the same
    per-user ``(ts, views-first, event_id)`` sort feeds a
    preceding-frame ``last`` (nearest prior view — ``join_asof``'s
    carry) AND a following-frame ``first`` (nearest later view), then a
    row-local comparator picks the smaller gap.  Both window frames
    share the partitioning and ordering, so Catalyst plans a single
    exchange + sort — the naive form (full-outer-joining the backward
    and forward results on purchase_id) pays a second shuffle for the
    same answer.  Same-instant views land in the preceding frame
    (views-first ordering) with gap 0, which wins every tie, so the
    following frame correctly sees only strictly-later views.
    Tiebreakers mirror the directional keys: latest (max event_id)
    among equal-gap prior views, earliest (min event_id) among
    equal-gap later views — the oracle encodes the same order with a
    signed event_id sort term.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("event_id", "user_id", "ts", "event_type")
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    asc = Window.partitionBy("user_id").orderBy("ts", is_purchase, "event_id")
    w_back = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    scanned = (
        ev.withColumn("back_id", F.last(view_id, ignorenulls=True).over(w_back))
        .withColumn("back_ts", F.last(view_ts, ignorenulls=True).over(w_back))
        .withColumn("fwd_id", F.first(view_id, ignorenulls=True).over(w_fwd))
        .withColumn("fwd_ts", F.first(view_ts, ignorenulls=True).over(w_fwd))
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("back_id").isNotNull() | F.col("fwd_id").isNotNull())
        )
    )
    gap_b = F.unix_micros("ts") - F.unix_micros("back_ts")
    gap_f = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    use_back = F.col("back_id").isNotNull() & (
        F.col("fwd_id").isNull() | (gap_b <= gap_f)
    )
    return scanned.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(use_back, F.col("back_id")).otherwise(F.col("fwd_id"))
        .alias("view_id"),
        F.when(use_back, gap_b).otherwise(gap_f).alias("abs_gap_us"),
        F.when(use_back, F.lit("backward")).otherwise(F.lit("forward"))
        .alias("direction"),
    )


def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``applyInPandas`` + ``pandas.merge_asof`` formulation of
    ``join_asof`` — kept as the template for as-of logic Spark
    expressions can't reach (e.g. tolerance windows with interpolation).
    One shuffle on a coarse user bucket; one merge_asof per bucket."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("event_id", "user_id", "ts", "event_type")
    ev = ev.withColumn("bucket", F.pmod(F.col("user_id"), F.lit(32)))
    return (
        ev.groupBy("bucket")
        .applyInPandas(
            lambda pdf: _asof_merge(pdf.drop(columns=["bucket"])),
            schema=_ASOF_SCHEMA,
        )
    )


@query(
    "join_salted",
    oracle=(
        "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, "
        "       o.o_orderdate, o.o_totalprice "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus = 'F'"
    ),
    tags=("join", "scale"),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted shuffle join — the skew-mitigation pattern for when
    AQE's runtime skew splitting isn't available (e.g. a deliberately
    partitioned stage, or a key so hot one partition OOMs).  The skewed
    (fact) side gets a deterministic salt (l_linenumber % SALT); the other
    side is replicated SALT times via explode; the join key becomes
    (key, salt), spreading one hot key over SALT reducers.  Result set is
    IDENTICAL to the plain equi-join (the oracle), which is the point:
    salting is a physical rewrite, not a semantic one.  At 100 TB choose
    SALT ≈ ceil(hottest-key rows / target-partition rows)."""
    salt_n = 8
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("_salt", (F.col("l_linenumber") % salt_n).cast("int"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    )
    joined = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"]) & (li["_salt"] == o["_salt"]),
        "inner",
    )
    return joined.select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderdate", "o_totalprice"
    )


def skew_join_raw(
    spark: SparkSession, sf_dir: str, mappers: int | None = None
) -> DataFrame:
    """The raw skewed shuffle join behind ``join_skew_aqe``: the fact
    side is DELIBERATELY skewed by remapping 7/8 of lineitem's join
    keys onto the single hot key 1 (deterministic, ``% 8``), then
    equi-joined to orders — one shuffle partition carries ~87 % of the
    fact table, the textbook case AQE's ``OptimizeSkewedJoin`` exists
    for: at runtime it splits the oversized partition into
    advisory-sized chunks and replicates the matching build-side
    partition, no manual salt needed.
    ``tests/test_plans.py::test_skew_join_aqe_rewrite_fires`` executes
    this under production-shaped thresholds (SMJ forced, skew threshold
    scaled to the fixture) and pins the ``skewed`` AQEShuffleRead in the
    final adaptive plan.  ``join_salted`` is the manual twin for engines
    or stages where runtime splitting isn't available.

    ``mappers``: skew splitting works at MAP-OUTPUT granularity — a
    skewed reducer partition is split into ranges of mapper ids, so a
    shuffle written by ONE mapper cannot be split at all
    (``ShufflePartitionsUtil.createSkewPartitionSpecs`` returns None
    and the rule reports 0 skewed partitions).  Two fixture-scale paths
    collapse the scan to one mapper: a single-row-group parquet file is
    unsplittable however small ``maxPartitionBytes`` goes (row groups
    are the split floor), and MANY SMALL files bin-pack into one scan
    task (both observed while building the r15 smoke).  A 100 TB fact
    table has thousands of mappers and never hits either.  The test and
    the SCALE.md smoke pass ``mappers=16``/``32`` to restore production
    mapper granularity on fixtures; production callers leave it None."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 8 != 0, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .cast("long")
        .alias("hot_key"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    )
    if mappers:
        li = li.repartition(mappers)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return li.join(o, li["hot_key"] == o["o_orderkey"], "inner")


@query(
    "join_skew_aqe",
    oracle=(
        "SELECT CASE WHEN l_orderkey % 8 <> 0 THEN 1 "
        "            ELSE l_orderkey END AS hot_key, "
        "       COUNT(*) AS n_rows, "
        "       ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "       ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "       ROUND(MAX(o_totalprice), 2) AS max_total "
        "FROM lineitem l JOIN orders o "
        "  ON o.o_orderkey = CASE WHEN l_orderkey % 8 <> 0 THEN 1 "
        "                         ELSE l_orderkey END "
        "GROUP BY 1"
    ),
    tags=("join", "scale"),
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant shuffle join, AQE edition (r12–r14 carried item):
    semantics are the plain equi-join the oracle states — skew handling
    is a PHYSICAL rewrite Spark applies at runtime, which is exactly the
    point of letting AQE do it instead of hand-salting (``join_salted``).
    The registered form aggregates the joined rows per key so the
    driver-hashed output stays compact; the skew itself lives in the
    join stage (``skew_join_raw`` above), whose runtime
    ``OptimizeSkewedJoin`` split is plan-pinned in tests/test_plans.py.
    At 100 TB: leave ``spark.sql.adaptive.skewJoin.enabled`` on and size
    ``skewedPartitionThresholdInBytes``/``advisoryPartitionSizeInBytes``
    to the executor memory budget; AQE then bounds every reducer's input
    regardless of key distribution, with no semantic rewrite risk."""
    joined = skew_join_raw(spark, sf_dir)
    return joined.groupBy("hot_key").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_total"),
    )


@query(
    "join_runtime_bloom",
    oracle=(
        "SELECT l.l_returnflag, COUNT(*) AS n_lines, "
        "       ROUND(SUM(l.l_extendedprice), 2) AS revenue "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderpriority = '1-URGENT' "
        "GROUP BY l.l_returnflag"
    ),
    tags=("join", "scale"),
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join pushdown (Spark 3.3+
    ``InjectRuntimeFilter``; enabled repo-wide in ``session.py``): when
    a shuffle join's creation side carries a selective filter (here
    orders at ~20 % selectivity on ``o_orderpriority``), Spark builds a
    bloom filter of the surviving join keys as a tiny pre-aggregate and
    injects ``might_contain`` into the fact scan — at 100 TB the fact
    side drops ~80 % of its rows BEFORE the shuffle instead of after
    the join, the same I/O-side pruning the reference stubbed in
    ``decomposePredicate`` (``KuduStorageHandler.java:187-193``) but
    computed from runtime data, not static predicates.  Semantics are
    the plain join the oracle states (bloom false positives are
    re-checked by the join itself — the filter is sound by
    construction).  The injection is plan-pinned in
    ``tests/test_plans.py::test_runtime_bloom_filter_injected`` under
    fixture-scaled thresholds (the production defaults gate on a 10 GB
    application side, which is exactly right at cluster scale)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def bucketed_join_parts(spark: SparkSession, sf_dir: str):
    """Write per-invocation bucketed tables and build the co-located join.

    Returns ``(joined, cleanup)`` — the caller must invoke ``cleanup()``
    once the join result is consumed (or checkpointed): it drops the two
    scratch catalog tables and removes the scratch directory, so repeated
    or concurrent runs never race on a shared path and nothing leaks into
    the session catalog (the per-invocation uuid tag guarantees isolation
    meanwhile)."""
    import shutil
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    base = f"{tempfile.gettempdir()}/hkh_bucketed_{tag}"
    specs = {
        f"hkh_orders_b_{tag}": (
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_totalprice"
            ),
            "o_orderkey",
        ),
        f"hkh_lineitem_b_{tag}": (
            load_table(spark, sf_dir, "lineitem")
            .filter(F.col("l_returnflag") == "R")
            .select("l_orderkey", "l_linenumber", "l_quantity"),
            "l_orderkey",
        ),
    }
    for name, (df, key) in specs.items():
        (
            df.write.bucketBy(16, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    o = spark.table(f"hkh_orders_b_{tag}")
    li = spark.table(f"hkh_lineitem_b_{tag}")
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )

    def cleanup() -> None:
        for name in specs:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(base, ignore_errors=True)

    return joined, cleanup


@query(
    "join_bucketed",
    oracle=(
        "SELECT o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_quantity "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_returnflag = 'R'"
    ),
    tags=("join", "scale"),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over bucketed tables — the zero-shuffle scale path.

    Both sides are written ``bucketBy(16, join_key)`` + ``sortBy`` (the
    Spark analogue of the reference's hash-partitioned Kudu tablets,
    ``HiveKuduTableInputFormat.java:166-217``); a join on the bucket key
    then needs NO Exchange on either side (asserted in
    tests/test_plans.py via ``bucketed_join_parts``) — at 100 TB this
    converts the dominant fact⋈fact shuffle into a local per-bucket
    merge.  The one-time bucketed write is the amortized cost, paid once
    per table, not per query.  The result is materialized with
    ``localCheckpoint`` (executor-side, never the driver) so the scratch
    tables and files can be dropped before returning."""
    joined, cleanup = bucketed_join_parts(spark, sf_dir)
    try:
        return joined.localCheckpoint(eager=True)
    finally:
        cleanup()


@query(
    "join_null_safe",
    oracle=(
        "WITH l AS (SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri "
        "           FROM orders WHERE o_orderkey <= 200), "
        "r AS (SELECT NULLIF(priority, '3-MEDIUM') AS pri, rank FROM ("
        "      VALUES ('1-URGENT', 1), ('3-MEDIUM', 3), ('5-LOW', 5)) "
        "      AS t(priority, rank)) "
        "SELECT l.o_orderkey, l.pri, r.rank "
        "FROM l JOIN r ON l.pri IS NOT DISTINCT FROM r.pri"
    ),
    tags=("join",),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics a
    dimension join needs when "unknown" is itself a category.  Spark
    plans ``eqNullSafe`` as an ordinary hash-join key (NULLs hash like
    any value under null-safe equality), so the shape stays a one-shuffle
    equi-join — no fallback to a nested-loop theta join.  NULLs are
    synthesized with NULLIF identically in both engines (the fixtures
    are NULL-free by construction)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pri"),
        )
    )
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("3-MEDIUM", 3), ("5-LOW", 5)], "priority string, rank int"
    ).select(F.nullif("priority", F.lit("3-MEDIUM")).alias("pri"), "rank")
    return o.join(dim, o["pri"].eqNullSafe(dim["pri"])).select(
        "o_orderkey", o["pri"].alias("pri"), "rank"
    )
