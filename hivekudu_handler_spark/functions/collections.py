"""Map- and struct-typed column surface (north-star complex-type lift).

The reference's type bridge rejected every complex category outright —
LIST, MAP, STRUCT and UNION all throw ``SerDeException`` at
``HiveKuduBridgeUtils.java:101-111`` — so Hive queries over Kudu tables
never saw a nested value.  The ArrayType half of the lift lives in
``functions/scalar.py`` (``fn_array``) and powers the similarity stack;
this module adds the MapType and StructType halves, because a modern
training-data pipeline leans on both (typed metadata structs next to
binary payloads, per-key feature maps, repeated groups packed as
array<struct>).

Everything here is JVM-side Catalyst expressions (``map_from_entries``,
``element_at``, ``inline``, higher-order folds) — no Python in the loop,
whole-stage codegen applies.  Outputs are flat scalar columns: map and
struct cells don't survive the driver's pandas canonicalizer (same
discipline as ``fn_array``'s exploded head), and each oracle recomputes
the semantics relationally, which is exactly the differential check we
want for complex-type plumbing — build nested, consume nested, land on
the same flat relation the direct relational plan produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "fn_map",
    oracle=(
        "SELECT user_id, "
        "       CAST(COUNT(DISTINCT event_type) AS INT) AS n_types, "
        "       NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) "
        "         AS n_click, "
        "       NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) "
        "         AS n_view, "
        "       MAX(event_type = 'purchase') AS has_purchase, "
        "       COUNT(*) AS n_total "
        "FROM events GROUP BY user_id"
    ),
    tags=("fn", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip per user: build ``map<event_type, count>`` with
    ``map_from_entries(collect_list(struct(...)))``, then consume it with
    the full map API — ``size``, ``element_at`` (typed NULL on a missing
    key, mirrored by the oracle's NULLIF-over-conditional-count),
    ``map_contains_key``, and a higher-order fold over ``map_values``
    that must re-derive the user's total event count.

    One shuffle total: the (user_id, event_type) pre-aggregate; the map
    build regroups map-side on user_id (entries per user = #event types,
    bounded) — grouped state never exceeds the type-cardinality, so the
    shape holds at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "view").alias("n_view"),
        F.map_contains_key(F.col("m"), "purchase").alias("has_purchase"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("n_total"),
    )


@query(
    "fn_struct",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        "       MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty, "
        "       CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS INT) "
        "         AS n_lines "
        "FROM lineitem"
    ),
    tags=("fn", "struct"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``array<struct>`` pack → consume → unpack round-trip: lineitem
    rows pack into one sorted ``array<struct<linenumber, qty, price>>``
    per order (``sort_array`` orders struct elements field-by-field;
    ``l_linenumber`` is unique per order, so the order is total),
    per-array scalars are extracted with a higher-order ``transform`` +
    ``array_max`` while still nested, then ``inline`` explodes the array
    back to columns.  The oracle never nests — plain windowed MAX/COUNT
    over the flat table — so the differential check certifies that the
    nested round-trip loses nothing.

    One shuffle (the l_orderkey regroup); pack state per key is one
    order's lines, bounded by the data model, so executor memory holds at
    any table size."""
    li = load_table(spark, sf_dir, "lineitem")
    packed = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice")
            )
        ).alias("lines")
    )
    enriched = packed.select(
        "l_orderkey",
        "lines",
        F.array_max(
            F.transform("lines", lambda s: s["l_quantity"])
        ).alias("max_qty"),
        F.size("lines").alias("n_lines"),
    )
    return enriched.select(
        "l_orderkey", "max_qty", "n_lines", F.inline("lines")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "max_qty",
        "n_lines",
    )
