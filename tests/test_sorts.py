"""Property tests for the window-free global-position helper
(operators/sorts.py `with_global_position`): the scale-safe scheme
(range sort + broadcast offsets + partition-local cumcount) must agree
with a single-node rank on arbitrary data — duplicates, nulls, skew,
empty partitions — because the r6 scale fix is only a fix if it is
value-identical to the `row_number()` window it replaced."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hivekudu_handler_spark.operators.sorts import with_global_position


def _expected_positions(rows):
    """(id -> pos) under (val ASC NULLS FIRST, id ASC)."""
    key = lambda r: (0 if r[1] is None else 1, r[1] if r[1] is not None else 0, r[0])
    return {rid: i + 1 for i, (rid, _) in enumerate(sorted(rows, key=key))}


@pytest.mark.usefixtures("spark")
def test_global_position_matches_single_node_rank(spark):
    vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
    rows_strategy = st.lists(vals, min_size=1, max_size=60)

    @settings(max_examples=12, deadline=None)
    @given(rows_strategy)
    def check(values):
        rows = [(i, v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "id long, val int")
        out = with_global_position(
            df, [F.col("val").asc_nulls_first(), F.col("id")]
        ).collect()
        got = {r["id"]: r["pos"] for r in out}
        assert got == _expected_positions(rows)
        assert sorted(r["pos"] for r in out) == list(range(1, len(rows) + 1))

    check()


def test_global_position_heavy_duplicates_and_skew(spark):
    """One dominant key value (range partitioner puts it all in one
    partition) plus a long unique tail: positions stay a permutation of
    1..n and respect the total order."""
    n = 5_000
    df = spark.range(n).select(
        "id", F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id")).alias("val")
    )
    out = with_global_position(
        df, [F.col("val"), F.col("id")]
    ).select("id", "val", "pos").collect()
    assert sorted(r["pos"] for r in out) == list(range(1, n + 1))
    by_pos = sorted(out, key=lambda r: r["pos"])
    for a, b in zip(by_pos, by_pos[1:]):
        assert (a["val"], a["id"]) < (b["val"], b["id"])
