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

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


def with_global_position(
    df: DataFrame,
    sort_cols: list[Column],
    pos_col: str = "pos",
    return_pre_checkpoint: bool = False,
):
    """Materialize each row's 1-based rank under a total order WITHOUT an
    unpartitioned WindowExec.

    ``row_number().over(Window.orderBy(...))`` funnels the entire table
    through one task — the classic 100 TB single-executor OOM (r6
    verdict's two flagged scale-killers).  Here the range-partitioned
    sort Spark already does for ORDER BY carries the heavy lifting:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` — partition i
       holds a contiguous, sorted slice of the total order (the exact
       machinery behind a plain ``orderBy``), materialized via
       ``localCheckpoint`` so both passes see one copy.  Checkpoint, not
       ``persist``: a persisted plan lives in the CacheManager until
       someone unpersists it — and no caller can, because the result is
       lazy (r7 ADVICE: every caller pinned a sorted copy of its table
       for the session lifetime, accumulating across bench sweeps).
       Checkpoint blocks are freed by the ContextCleaner as soon as the
       returned DataFrame is dropped;
    2. per-partition row counts — a ≤``shuffle.partitions``-row
       aggregate — become cumulative offsets, closure-shipped (KBs);
    3. an Arrow-batched ``mapInPandas`` adds ``offset + local cumcount``
       per partition, order-preserving and embarrassingly parallel.

    Total cost: the one range shuffle ORDER BY needs anyway + a tiny
    count job.  Every partition stays executor-sized at any scale."""
    s_pre = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    s = s_pre.localCheckpoint(eager=True)
    counts = s.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]

    out_schema = T.StructType(
        list(s.schema.fields) + [T.StructField(pos_col, T.LongType())]
    )

    def add_pos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        base = offsets.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[pos_col] = np.arange(
                base + seen + 1, base + seen + 1 + len(pdf), dtype=np.int64
            )
            seen += len(pdf)
            yield pdf

    out = s.mapInPandas(add_pos, out_schema)
    if return_pre_checkpoint:
        # The eager checkpoint truncates the returned plan at
        # ExistingRDD, hiding the range-partitioned sort that ALREADY
        # RAN from plan inspection.  Callers that need to assert on the
        # physical plan the checkpoint job executed opt into receiving
        # that stage's DataFrame explicitly (logical-plan reference
        # only — no data pinned); a dynamic attribute on ``out`` would
        # silently vanish through any further transformation (r8
        # ADVICE).
        return out, s_pre
    return out


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
    ordering information).  Rank comes from ``with_global_position`` —
    range-partitioned, never a single-partition window."""
    o = load_table(spark, sf_dir, "orders")
    ranked = with_global_position(
        o.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return ranked.select("o_orderkey", "o_totalprice", "pos")


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
    order itself is value-hashed (via ``with_global_position`` — the
    range partitioner honors NULLS FIRST, no single-partition
    window)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pri"),
    )
    ranked = with_global_position(
        o, [F.col("pri").asc_nulls_first(), F.col("o_orderkey")]
    )
    return ranked.select("o_orderkey", "pri", F.col("pos").cast("int").alias("pos"))
