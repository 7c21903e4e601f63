"""Z-order (Morton-curve) file clustering for multi-column data skipping
(SURVEY.md §2.1 partitioning, scale extension).

The ``kr=`` range layout (operators/range_layout.py) prunes on ONE key
dimension; a predicate box over TWO columns — ``user BETWEEN a AND b AND
value BETWEEN x AND y`` — defeats any single-column sort (sorting by user
scatters value across every file and vice versa).  The lakehouse answer
(Delta ``OPTIMIZE ZORDER BY``, Iceberg ``sort_order`` z-columns) is to
cluster files along a space-filling curve: interleave the bits of both
columns into one Morton code and range-partition on it, so each file
covers a small RECTANGLE of the 2-D space and a box predicate overlaps
few rectangles.

Everything is JVM-side integer arithmetic:

* each column is scaled to 8 bits against its min/max (the bounds ride
  along from a 1-row aggregate via cross join — no driver collect, no
  RNG; at 100 TB the bounds pass is a cheap column-stats read);
* the 16-bit Morton code is a sum of shift/mask terms — whole-stage
  codegen, no UDF;
* ``repartitionByRange`` on the code gives each output file a contiguous
  curve segment ≈ one rectangle; ordering *within* files by the code
  keeps Parquet row-group min/max stats tight as well.

The payoff is automatic: Spark's Parquet reader consults per-file and
per-row-group min/max stats for the RAW columns, so a box predicate
skips every file whose rectangle misses the box — no query-side changes,
no index service.  ``tests/test_plans.py::test_zorder_files_cover_small_
rectangles`` measures it directly: the fraction of files whose
(user, value) bounding box overlaps the query box must be far smaller
for the z-ordered layout than for a single-column sort of the same data.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.operators.ddl import _SCRATCH_ROOT, _materialize
from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_events

_BITS = 8  # per-dimension resolution: 256 cells/axis, 16-bit Morton code


def _scale8(col: Column, lo: Column, hi: Column) -> Column:
    """col linearly scaled to [0, 255] against [lo, hi] as a long."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    return F.least(
        F.lit(255), F.greatest(F.lit(0), F.floor(frac * 256).cast("int"))
    ).cast("long")


def _morton16(a: Column, b: Column) -> Column:
    """Interleave two 8-bit values into a 16-bit Morton code: a's bit i
    lands at 2i+1, b's at 2i.  Pure shift/mask sum — codegen'd."""
    out = F.lit(0).cast("long")
    for i in range(_BITS):
        out = out + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        out = out + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i
        )
    return out


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_dir: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    (col_a, col_b) Morton curve.  The z column is layout-only and is
    dropped before writing — readers see the original schema and rely on
    the (now tight) per-file column stats."""
    bounds = df.agg(
        F.min(F.col(col_a).cast("double")).alias("alo"),
        F.max(F.col(col_a).cast("double")).alias("ahi"),
        F.min(F.col(col_b).cast("double")).alias("blo"),
        F.max(F.col(col_b).cast("double")).alias("bhi"),
    )
    z = _morton16(
        _scale8(F.col(col_a), F.col("alo"), F.col("ahi")),
        _scale8(F.col(col_b), F.col("blo"), F.col("bhi")),
    )
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "alo", "ahi", "blo", "bhi")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


@query(
    "zorder_cluster_prune",
    oracle=(
        "SELECT event_id, user_id, value FROM events "
        "WHERE user_id BETWEEN 10 AND 19 AND value BETWEEN 5.0 AND 15.0"
    ),
    tags=("scan", "scale"),
)
def zorder_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering round trip: land ``events`` Morton-clustered on
    (user_id, value), read back a 2-D box predicate.  The oracle filters
    the unclustered source — identical rows prove the layout is lossless;
    the plan-quality evidence (few files overlap the box) lives in
    tests/test_plans.py, and the box filter itself pushes into the
    Parquet scan where the tight per-file stats make it a skip."""
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="zorder_", dir=_SCRATCH_ROOT))
    try:
        ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
        zorder_write(ev, "user_id", "value", str(d / "ev_z"))
        back = spark.read.parquet(str(d / "ev_z")).filter(
            F.col("user_id").between(10, 19) & F.col("value").between(5.0, 15.0)
        )
        return _materialize(spark, back)
    finally:
        shutil.rmtree(d, ignore_errors=True)
