"""Key-range table layout operators (SURVEY.md §2.1 partitioning).

Kudu tablets come in two partitioning schemes; the reference declared
partitioning a design goal it never built (``doc/DesignDocument.md:8``,
TODO at ``KuduStorageHandler.java:266``).  The managed layer implements
both: hash buckets (``kb=`` dirs — uniform writes, point-lookup pruning)
since r2, and ordered key-range partitions (``kr=`` dirs) as of r6 —
the layout a *range* predicate can prune, which hash buckets
structurally cannot (a time-range scan over a hash layout opens every
bucket).

Scale design: split points live in the table's JSON meta (bounded,
driver-side); an interval scan bisects them to the surviving directory
ids, so a range query reads |intersected ranges|/N of the table's files
regardless of cluster size, with per-directory key ordering making
Parquet row-group min/max skipping effective inside survivors
(:meth:`TableStore.scan_range`; plan-asserted in tests/test_plans.py).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from hivekudu_handler_spark.operators.ddl import _scratch_store
from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

_SPLITS = [3000, 6000, 9000, 12000]  # 5 ranges over o_orderkey at sf0.01
_LO, _HI = 3500, 9100                # intersects ranges 1..3, prunes 0 and 4


@query(
    "scan_range_pruned",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
        f"FROM orders WHERE o_orderkey >= {_LO} AND o_orderkey < {_HI}"
    ),
    tags=("scan", "ddl"),
)
def scan_range_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan over a range-partitioned keyed table, pruned to only
    the key-range directories the interval [lower, upper) intersects —
    the range-tablet analogue of ``scan_keyed_lookup``'s hash-bucket
    pruning (the reference shipped key-range scan bounds to its scanner
    at ``HiveKuduTableInputFormat.java:466-467``).  The ``kr`` bound is
    computed by bisecting the split list driver-side and lands in the
    scan's PartitionFilters; the exact bounds on the range key push into
    the Parquet scan inside the surviving directories."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    store, d = _scratch_store(spark)
    try:
        store.create_table(
            "orders_ranged", src.schema, ["o_orderkey"], range_splits=_SPLITS
        )
        store.insert("orders_ranged", src)
        return store.scan_range("orders_ranged", _LO, _HI).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "scan_range_composite",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice "
        f"FROM orders WHERE o_orderkey >= {_LO} AND o_orderkey < {_HI} "
        "UNION ALL "
        "SELECT o_orderkey, o_custkey, o_totalprice "
        "FROM orders WHERE o_orderkey = 42"
    ),
    tags=("scan", "ddl"),
)
def scan_range_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kudu's composite hash×range tablet scheme end-to-end: the same
    orders table laid out as ``kr=<i>/kb=<j>`` leaves (3 hash buckets in
    each of 5 key ranges).  Exercises BOTH pruned read paths against one
    oracle: the interval scan prunes on the range level alone, and a
    point lookup folds both levels to constants so exactly one leaf of
    (N+1)·H opens (lifecycle + plan assertions in
    tests/test_table_layer.py)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    store, d = _scratch_store(spark)
    try:
        store.create_table(
            "orders_hr",
            src.schema,
            ["o_orderkey"],
            range_splits=_SPLITS,
            hash_in_range=3,
        )
        store.insert("orders_hr", src)
        ranged = store.scan_range("orders_hr", _LO, _HI)
        point = store.lookup("orders_hr", {"o_orderkey": 42})
        return ranged.unionByName(point).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
