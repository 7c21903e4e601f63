"""Aggregate-specific invariants not covered by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import load_all
from hivekudu_handler_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    """The production sketch-only form's HLL++ estimate (rsd=0.02)
    lands within 5% of the exact NDV per group; the registered
    exact-bounds key (r15 promotion) reports the same exact NDVs with
    every in-band boolean TRUE; and the oracle-backed exact key agrees
    with an independent computation."""
    from hivekudu_handler_spark.operators.aggregates import (
        approx_ndv_sketch_only,
    )

    specs = load_all()
    approx = {
        r["l_returnflag"]: r["approx_ndv_part"]
        for r in approx_ndv_sketch_only(spark, SF).collect()
    }
    registered = {
        r["l_returnflag"]: r
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
    assert set(approx) == set(exact) == set(exact_key) == set(registered)
    for flag, ndv in exact.items():
        assert exact_key[flag] == ndv, f"{flag}: {exact_key[flag]} != {ndv}"
        assert registered[flag]["exact_ndv_part"] == ndv
        assert registered[flag]["ndv_in_band"] is True
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
    """The key's in-band booleans must hold (the ±2ε exact rank band the
    r9 oracle promotion certifies officially), its exact_p columns must
    equal an independent exact percentile computation, and the raw
    sketch estimate stays within 2% relative value error."""
    rows = {
        r["l_returnflag"]: r
        for r in load_all()["agg_approx_percentile"].fn(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact_p"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("ap50"),
            F.percentile_approx("l_extendedprice", 0.95, 1000).alias("ap95"),
        )
        .collect()
    }
    assert set(rows) == set(ref)
    for flag, row in rows.items():
        assert row["p50_in_band"] and row["p95_in_band"], (flag, row)
        assert row["exact_p50"] == ref[flag]["exact_p"][0], flag
        assert row["exact_p95"] == ref[flag]["exact_p"][1], flag
        for got, want in (
            (ref[flag]["ap50"], row["exact_p50"]),
            (ref[flag]["ap95"], row["exact_p95"]),
        ):
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
