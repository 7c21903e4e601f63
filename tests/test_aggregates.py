"""Aggregate-specific invariants not covered by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import load_all
from hivekudu_handler_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    """The sketch-only key's HLL++ estimate (rsd=0.02) lands within 5% of
    the exact NDV per group, and the oracle-backed exact key agrees with
    an independent computation — the pytest half of the split that keeps
    the registered sketch key free of the exact-distinct shuffle."""
    specs = load_all()
    approx = {
        r["l_returnflag"]: r["approx_ndv_part"]
        for r in specs["agg_approx_distinct"].fn(spark, SF).collect()
    }
    exact_key = {
        r["l_returnflag"]: r["exact_ndv_part"]
        for r in specs["agg_ndv_exact"].fn(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r["ndv"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("ndv"))
        .collect()
    }
    assert set(approx) == set(exact) == set(exact_key)
    for flag, ndv in exact.items():
        assert exact_key[flag] == ndv, f"{flag}: {exact_key[flag]} != {ndv}"
        rel_err = abs(approx[flag] - ndv) / ndv
        assert rel_err <= 0.05, f"{flag}: est={approx[flag]} exact={ndv}"


def test_approx_distinct_raw_estimate_bound(spark):
    """Raw HLL++ estimate itself stays within 5% of exact per group."""
    li = load_table(spark, SF, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("est"),
            F.countDistinct("l_partkey").alias("ndv"),
        )
        .collect()
    )
    for r in rows:
        rel_err = abs(r["est"] - r["ndv"]) / r["ndv"]
        assert rel_err <= 0.05, f"{r['l_returnflag']}: est={r['est']} exact={r['ndv']}"


def test_approx_percentile_error_bound(spark):
    """percentile_approx at accuracy=1000 must land within 2% relative
    error of the exact per-group percentile (GK sketch guarantees 1/1000
    rank error; 2% value margin is generous for this distribution)."""
    approx = {
        r["l_returnflag"]: (r["approx_p50"], r["approx_p95"])
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


def test_mode_is_true_max_and_partitioning_invariant(spark):
    """The modal value per group carries the group's true max count,
    and the answer is identical under a different input partitioning
    (the failure mode of Spark's built-in tie-arbitrary mode())."""
    q = load_all()["agg_mode"]
    base = {r["o_orderstatus"]: (r["modal_priority"], r["modal_count"])
            for r in q.fn(spark, SF).collect()}
    counts = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .count()
        .collect()
    )
    best = {}
    for r in counts:
        k = r["o_orderstatus"]
        cand = (-r["count"], r["o_orderpriority"])
        if k not in best or cand < best[k]:
            best[k] = cand
    assert {k: (v[1], -v[0]) for k, v in best.items()} == base
