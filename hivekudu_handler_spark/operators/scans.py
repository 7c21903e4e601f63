"""Scan / projection / filter operators (SURVEY.md §2.1–§2.2).

The reference ships these as conf-driven projection lists and base64 range
predicates handed to the Kudu scanner (``HiveKuduTableInputFormat.java:
80-88,303-323,465-469``) with the Hive-side decomposition left as a stub
(``KuduStorageHandler.java:187-193``).  Spark-natively, each of these is a
declarative ``select``/``filter`` whose pushdown Catalyst performs for real:
``plans/checks.py`` asserts ``PushedFilters`` / pruned ``ReadSchema`` on the
physical plan, closing the reference's TODO (``doc/DesignDocument.md:10,40``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "scan_full",
    oracle="SELECT * FROM lineitem",
    tags=("scan",),
)
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (``HiveKuduTableInputFormat.java:149-223,491-572``):
    one Spark input split per Parquet row-group replaces one split per
    tablet; vectorized reader replaces the RowResult batch loop."""
    return load_table(spark, sf_dir, "lineitem")


@query(
    "project_pushdown",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    tags=("scan",),
)
def project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-projection pushdown (``HiveKuduTableInputFormat.java:80-88,
    303-320``): Catalyst ColumnPruning shrinks ReadSchema to 2 of 11 cols."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@query(
    "filter_eq",
    oracle=(
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'"
    ),
    tags=("filter",),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter + projection — the reference demo's
    ``SELECT id FROM test_drop WHERE name = 'a'`` (``README.md:39,161-180``)
    over the star schema."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_linenumber")


@query(
    "filter_range",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "  AND l_shipdate <  TIMESTAMP '1998-01-01' "
        "  AND l_quantity BETWEEN 10 AND 40"
    ),
    tags=("filter",),
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates — the storage contract of the reference is
    column *range* predicates (``HiveKuduTableInputFormat.java:76-78``);
    here they push into Parquet min/max + row-group pruning."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_quantity").between(10, 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "filter_in_like_null",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders "
        "WHERE o_orderstatus IN ('F', 'P') "
        "  AND o_orderpriority LIKE '%URGENT%' "
        "  AND o_totalprice IS NOT NULL "
        "  AND NOT (o_custkey IS NULL)"
    ),
    tags=("filter",),
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / IS NULL / boolean combinators — the Hive predicate
    surface enabled over handler tables (SURVEY.md §2.2, prov H)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_totalprice").isNotNull()
        & ~F.col("o_custkey").isNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "project_expr",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "       l_extendedprice * (1 - l_discount) AS revenue, "
        "       CAST(l_linenumber AS BIGINT) AS line_no_big, "
        "       CASE WHEN l_returnflag = 'R' THEN 'returned' "
        "            WHEN l_quantity > 45 THEN 'bulk' "
        "            ELSE 'normal' END AS line_class "
        "FROM lineitem"
    ),
    tags=("project",),
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection: arithmetic, CASE WHEN, casts (SURVEY.md §2.2
    ``project_expr``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE product: per-row double arithmetic is bit-exact across
        # engines, whereas per-row ROUND boundary semantics are not
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("l_linenumber").cast("bigint").alias("line_no_big"),
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_quantity") > 45, "bulk")
        .otherwise("normal")
        .alias("line_class"),
    )


# --- file-format sources (SURVEY.md §2.1 "file formats") -------------------

_FMT_ORACLE = (
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
    "WHERE o_orderkey < 500"
)


def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Write a sample through ``fmt`` and read it back: the oracle checks
    the roundtripped values against the Parquet originals, so any
    format-layer lossiness (quoting, float text round-trip, schema drift)
    breaks the hash.  Scratch is per-invocation and removed after the
    result is checkpointed executor-side."""
    import shutil
    import tempfile
    import uuid

    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = f"{tempfile.gettempdir()}/hkh_fmt_{fmt}_{uuid.uuid4().hex[:8]}"
    try:
        writer = src.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.format(fmt).save(path)
        reader = spark.read.schema(src.schema)
        if fmt == "csv":
            reader = reader.option("header", True)
        return reader.format(fmt).load(path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query("source_csv", oracle=_FMT_ORACLE, tags=("scan", "format"))
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink roundtrip (SURVEY §2.1 file formats — free from
    Spark's file-source layer; the reference supported only Kudu).
    Doubles survive because Spark writes shortest-roundtrip decimal
    text."""
    return _format_roundtrip(spark, sf_dir, "csv")


@query("source_orc", oracle=_FMT_ORACLE, tags=("scan", "format"))
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink roundtrip — the second columnar format (the one
    Hive deployments the reference targeted actually used).  Columnar,
    binary, and predicate-pushdown-capable like Parquet, so it rides the
    same vectorized reader path; the roundtrip oracle catches any
    type-mapping drift."""
    return _format_roundtrip(spark, sf_dir, "orc")


@query("source_json", oracle=_FMT_ORACLE, tags=("scan", "format"))
def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink roundtrip (schema supplied on read: at
    100 TB you never pay schema inference's extra pass)."""
    return _format_roundtrip(spark, sf_dir, "json")


@query(
    "scan_keyed_lookup",
    oracle=(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal "
        "FROM customer WHERE c_custkey = 42"
    ),
    tags=("scan", "ddl"),
)
def scan_keyed_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key point-lookup through the managed bucket layout — the
    read-path analogue of the reference's tablet pruning
    (``HiveKuduTableInputFormat.java:166-217``, key-range bounds at
    ``:466-467``): the key's hash bucket is constant-folded into the
    scan's PartitionFilters, so only one ``kb=`` directory is opened
    (plan-asserted in ``tests/test_plans.py``) and the key equality
    itself lands in PushedFilters inside that bucket."""
    import shutil

    from hivekudu_handler_spark.operators.ddl import _materialize, _scratch_store

    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    store, d = _scratch_store(spark)
    try:
        store.create_table("customer_pk", src.schema, ["c_custkey"])
        store.insert("customer_pk", src)
        return _materialize(spark, store.lookup("customer_pk", {"c_custkey": 42}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "scan_keyed_lookup_batch",
    oracle=(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal "
        "FROM customer WHERE c_custkey IN (42, 101, 500) "
        "UNION ALL "
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal "
        "FROM customer WHERE c_custkey IN (7, 250)"
    ),
    tags=("scan",),
)
def scan_keyed_lookup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched primary-key lookup: the key batch's hash buckets are
    constant-folded into a ``kb IN (...)`` PartitionFilter (at most
    |batch| of B bucket directories opened) — the multi-key form of the
    reference's tablet pruning (``HiveKuduTableInputFormat.java:166-217``),
    which prunes for ANY key shape.  Exercised both ways: a scalar batch
    on a single-column key (ids push down as a Parquet ``In`` filter) and
    a dict batch on a composite (custkey, nationkey) key (one struct-IN
    match inside the pruned buckets)."""
    import shutil

    from hivekudu_handler_spark.operators.ddl import _materialize, _scratch_store

    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    store, d = _scratch_store(spark)
    try:
        store.create_table("customer_pk", src.schema, ["c_custkey"])
        store.insert("customer_pk", src)
        single = store.lookup_many("customer_pk", [42, 101, 500])
        comp_keys = [
            {"c_custkey": r["c_custkey"], "c_nationkey": r["c_nationkey"]}
            for r in src.filter(F.col("c_custkey").isin(7, 250))
            .select("c_custkey", "c_nationkey")
            .collect()
        ]
        store.create_table(
            "customer_comp", src.schema, ["c_custkey", "c_nationkey"]
        )
        store.insert("customer_comp", src)
        composite = store.lookup_many("customer_comp", comp_keys)
        return _materialize(spark, single.unionByName(composite))
    finally:
        shutil.rmtree(d, ignore_errors=True)
