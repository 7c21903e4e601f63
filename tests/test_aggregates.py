"""Aggregate-specific invariants not covered by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import load_all
from hivekudu_handler_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    """approx_count_distinct at rsd=0.02 must land within 5% of the exact
    NDV per group (the sketch's documented bound with margin)."""
    approx = {
        r["l_returnflag"]: r["approx_ndv_part"]
        for r in load_all()["agg_approx_distinct"].fn(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r["ndv"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("ndv"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err <= 0.05, f"{flag}: est={est} exact={exact[flag]}"


def test_approx_percentile_error_bound(spark):
    """percentile_approx at accuracy=1000 must land within 2% relative
    error of the exact per-group percentile (GK sketch guarantees 1/1000
    rank error; 2% value margin is generous for this distribution)."""
    approx = {
        r["l_returnflag"]: r["approx_p50_p95"]
        for r in load_all()["agg_approx_percentile"].fn(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact_p"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact_p"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        for got, want in zip(est, exact[flag]):
            assert abs(got - want) / want <= 0.02, f"{flag}: {got} vs {want}"


def test_session_tz_pinned_by_queries(spark):
    """Queries must pin UTC themselves — the driver's session may not."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_all()["fn_date"].fn(spark, SF)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        row = df.filter(F.col("o_orderkey") == 1).collect()[0]
        # unix_ts of a midnight-UTC timestamp must be second-aligned and
        # consistent with the UTC reading, not the local-tz reading
        assert row["unix_ts"] % 86400 == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
