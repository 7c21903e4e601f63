"""Physical-plan shape tests (SURVEY.md §7 M3): verify via explain() that
pushdowns, pruning, broadcasts and top-k shortcuts actually happen — the
optimizations the reference stubbed or delegated (SURVEY.md §4)."""

from __future__ import annotations

from hivekudu_handler_spark.plans import checks
from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    """Closes the reference's decomposePredicate TODO
    (KuduStorageHandler.java:187-193): range predicates land in
    PushedFilters, not as residual-only filters."""
    q = load_all()["filter_range"]
    df = q.fn(spark, SF)
    checks.assert_filter_pushed(df, "l_shipdate")
    checks.assert_filter_pushed(df, "l_quantity")


def test_eq_filter_pushdown(spark):
    df = load_all()["filter_eq"].fn(spark, SF)
    checks.assert_filter_pushed(df, "l_returnflag")


def test_projection_prunes_read_schema(spark):
    """Column pruning reaches the Parquet scan: an 11-column table read
    with a 2-column projection must not read the other 9
    (HiveKuduTableInputFormat.java:80-88 made this a manual contract;
    Catalyst does it for real)."""
    df = load_all()["project_pushdown"].fn(spark, SF)
    checks.assert_column_pruned(df, "l_comment")
    checks.assert_column_pruned(df, "l_shipdate")
    checks.assert_column_pruned(df, "l_quantity")


def test_dimension_join_broadcasts(spark):
    """The fact-side must never shuffle for a dimension join."""
    df = load_all()["join_broadcast"].fn(spark, SF)
    checks.assert_broadcast_join(df)
    checks.assert_no_shuffle_join(df)


def test_topk_uses_take_ordered(spark):
    df = load_all()["topk"].fn(spark, SF)
    checks.assert_top_k(df)


def test_q1_single_shuffle(spark):
    """The flagship aggregation needs exactly one exchange (partial agg
    map-side, final after one shuffle on the group key)."""
    df = load_all()["q1_pricing_summary"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)


def test_bucketed_join_no_shuffle(spark):
    """Co-located bucketed join: both sides bucketed on the join key
    means zero Exchange nodes in the whole plan — the 100 TB fact⋈fact
    path (bucketing ≈ the reference's hash-partitioned tablets)."""
    from hivekudu_handler_spark.operators.joins import bucketed_join_parts

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    cleanup = None
    try:
        df, cleanup = bucketed_join_parts(spark, SF)
        assert checks.count_shuffles(df) == 0, checks.plan_string(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if cleanup is not None:
            cleanup()


def test_asof_join_is_jvm_only_and_matches_pandas_path(spark):
    """join_asof must stay whole-stage JVM (no Python eval nodes in the
    plan) and agree row-for-row with the merge_asof formulation."""
    from hivekudu_handler_spark.operators.joins import asof_join_pandas

    df = load_all()["join_asof"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan
    jvm = sorted(tuple(r) for r in df.collect())
    py = sorted(tuple(r) for r in asof_join_pandas(spark, SF).collect())
    assert jvm == py


def test_text_ops_normalize_once(spark):
    """The regex-normalize+split chain must appear exactly once per row
    in the optimized plan of every text operator — the derived features
    read a materialized token column, they don't re-run the regex
    (VERDICT r1 #5: ~9× recomputation showed up as ~20 s/query)."""
    for key in ("text_tokens", "text_quality", "text_langid", "text_fingerprint"):
        df = load_all()[key].fn(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n = plan.count("regexp_replace(lower(text")
        # text_quality has a second, different regex (punct_ratio) that
        # does not contain this needle, so 1 means "normalize ran once"
        assert n == 1, f"{key}: normalize chain appears {n}× in plan"


def test_salted_join_spreads_partitions(spark):
    """Salted join result equals the plain join (semantic no-op) — the
    physical effect is the compound (key, salt) shuffle key."""
    df = load_all()["join_salted"].fn(spark, SF)
    plain = load_all()["join_inner"]  # smoke: both run on same fixtures
    assert df.count() > 0 and plain.fn(spark, SF).count() > 0
    plan = checks.plan_string(df)
    assert "_salt" in plan


def test_pivot_single_aggregate(spark):
    """Pivot with an explicit value list must compile to ONE aggregate
    over the input (no per-value scans, no value-discovery job)."""
    df = load_all()["agg_pivot"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)
