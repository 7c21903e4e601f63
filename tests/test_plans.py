"""Physical-plan shape tests (SURVEY.md §7 M3): verify via explain() that
pushdowns, pruning, broadcasts and top-k shortcuts actually happen — the
optimizations the reference stubbed or delegated (SURVEY.md §4)."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from hivekudu_handler_spark.plans import checks
from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def tuned_confs(spark, confs: dict):
    """Set session confs for a runtime-gated plan test, restoring prior
    values (or unsetting) afterwards — shared by every test that scales
    production thresholds down to fixture size."""
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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


def test_salting_spreads_a_100_to_1_hot_key(spark):
    """Skew evidence on actually-skewed data (r5 verdict stretch item):
    one key carries 100× the rows of every other key.  Partition sizes
    are MEASURED (spark_partition_id after an explicit hash repartition,
    the same partitioning a shuffle join's reducer side sees): keyed on
    the bare key, the hot key's rows all land in one reducer — max
    partition ≈ hot-key rows however many reducers exist; keyed on
    (key, salt), the hot key spreads over SALT reducers and the max
    partition shrinks by ≈ SALT×."""
    import pandas as pd

    salt_n = 8
    n_parts = 16
    hot = pd.DataFrame({"k": [0] * 10_000, "v": range(10_000)})
    cold = pd.DataFrame(
        {"k": [1 + i // 100 for i in range(9_900)], "v": range(9_900)}
    )
    df = spark.createDataFrame(pd.concat((hot, cold))).withColumn(
        "_salt", (F.col("v") % salt_n).cast("int")
    )

    def max_partition(parted):
        sizes = (
            parted.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes)

    plain = max_partition(df.repartition(n_parts, F.col("k")))
    salted = max_partition(df.repartition(n_parts, F.col("k"), F.col("_salt")))
    # bare key: the hot key is indivisible — one reducer gets all 10k rows
    assert plain >= 10_000, plain
    # (key, salt): the hot key spreads over salt_n reducers; allow slack
    # for cold keys hashing into the same reducers
    assert salted <= 10_000 / salt_n + 2_500, (plain, salted)
    assert plain / salted >= 3, (plain, salted)


def test_pivot_single_aggregate(spark):
    """Pivot with an explicit value list must compile to ONE aggregate
    over the input (no per-value scans, no value-discovery job)."""
    df = load_all()["agg_pivot"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)


def test_topk_cosine_two_phase_plan(spark):
    """sim_topk_cosine must keep the two-phase top-k shape: the global
    window's shuffle reads the MapInPandas partition-local fold's output
    (bounded at k·P·|queries| rows), never the full scored corpus — the
    r2 verdict's one flagged 100×-scale bottleneck was the single-phase
    Window.partitionBy(query_id) funneling the whole corpus into
    |queries| reducers.  Fails if brute_force_topk reverts to
    _rank_topk(scored, k) directly."""
    df = load_all()["sim_topk_cosine"].fn(spark, SF)
    lines = checks.plan_string(df, mode="simple").splitlines()

    def first(needle):
        return next(i for i, l in enumerate(lines) if needle in l)

    win = first("Window")
    fold = first("MapInPandas")
    join = first("Join")
    # simple-mode explain prints the root first, inputs below: the fold
    # must sit between the window and the scoring join, so the window's
    # exchange consumes the folded candidates, not corpus-sized input
    assert win < fold < join, "\n".join(lines)
    assert not any("Join" in l for l in lines[win:fold]), "\n".join(lines)


def test_approx_distinct_is_sketch_only(spark):
    """The PRODUCTION form (approx_ndv_sketch_only) must not pay the
    exact-distinct path: no count(distinct ...) expansion in the
    optimized plan, one shuffle (partial/final HLL register merge) —
    the r3 ADVICE concern, preserved through the r15 oracle promotion
    of the registered key."""
    from hivekudu_handler_spark.operators.aggregates import (
        approx_ndv_sketch_only,
    )

    df = approx_ndv_sketch_only(spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_count_distinct" in optimized, optimized
    assert "count(distinct" not in optimized.lower(), optimized
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)


def test_winnow_fingerprint_single_shuffle_pruned_scan(spark):
    """Winnowing's plan shape (r16): the position explode + per-window
    min + distinct compile to ONE exchange — the distinct's grouping
    keys include doc_id, so the final aggregate reuses the window's
    doc_id hash-partitioning — and the parquet scan reads only
    (doc_id, text) with the short-doc filter pushed to the scan node."""
    from hivekudu_handler_spark.pipeline.text import text_winnow_fingerprint

    df = text_winnow_fingerprint(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)
    schema = checks.read_schema(df)
    assert "doc_id" in schema and "text" in schema, schema
    assert "n_chars" not in schema, schema


def test_sketch_mergeable_rollup_is_sketch_only(spark):
    """The PRODUCTION form of the mergeable rollup
    (ndv_sketch_rollup_only) must not pay the exact path anywhere: no
    count(distinct ...) expansion in the optimized plan, hll_sketch_agg
    building the per-year sketches and hll_union_agg folding them —
    the registered agg_sketch_mergeable key carries exact columns only
    as its verification certificate (r16 advice fix)."""
    from hivekudu_handler_spark.operators.aggregates import (
        ndv_sketch_rollup_only,
    )

    df = ndv_sketch_rollup_only(spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    low = optimized.lower()
    assert "hll_sketch_agg" in low, optimized
    assert "hll_union_agg" in low, optimized
    assert "count(distinct" not in low, optimized
    # sanity: the union output has per-year rows plus the ALL rollup
    rows = {r["scope"] for r in df.collect()}
    assert "ALL" in rows and len(rows) > 2, rows


def test_approx_distinct_registered_single_aggregate(spark):
    """The REGISTERED exact-bounds form (r15 promotion, percentile
    precedent): sketch and exact NDV live in ONE logical Aggregate —
    one pass over lineitem, not two branches — and both expressions
    are present so the in-band boolean certifies the real sketch."""
    import re

    df = load_all()["agg_approx_distinct"].fn(spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    aggs = re.findall(r"Aggregate \[.*", optimized)
    assert len(aggs) == 1, optimized
    assert "approx_count_distinct" in optimized, optimized
    assert "count(distinct" in optimized.lower(), optimized


def test_ivf_assignment_is_scan_shaped(spark):
    """Corpus→centroid assignment must not shuffle the corpus: the only
    Exchange in the plan is the k-row centroid fold (SinglePartition);
    there is no hashpartitioning exchange (the old vec_id window's
    signature) and the centroid list arrives via a broadcast join."""
    from pyspark.sql import functions as F

    from hivekudu_handler_spark.pipeline.similarity import _as_double, _ivf_assign

    e = _as_double(spark.read.parquet(f"{SF}/embeddings.parquet"))
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    plan = checks.plan_string(_ivf_assign(e, cents))
    assert "hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_new_tpch_shapes_have_no_cartesian(spark):
    """Q2/Q9/Q16/Q20: correlated/nested subqueries must decorrelate to
    joins (never CartesianProduct), dimensions broadcast, and Q2's
    top-100 must short-circuit via TakeOrderedAndProject."""
    specs = load_all()
    for key in (
        "sql_q2_min_cost_supplier",
        "sql_q9_product_profit",
        "sql_q16_parts_suppliers",
        "sql_q20_excess_stock",
    ):
        plan = checks.plan_string(specs[key].fn(spark, SF))
        assert "CartesianProduct" not in plan, key
        assert "BroadcastHashJoin" in plan, key
    q2 = checks.plan_string(specs["sql_q2_min_cost_supplier"].fn(spark, SF))
    assert "TakeOrderedAndProject" in q2


def test_curate_end2end_gate_below_dedup_shuffle(spark):
    """The quality gate must filter BELOW the fingerprint exchange so
    rejected docs never shuffle (the plan's only data-sized exchange is
    the dedup window's)."""
    import re

    df = load_all()["pipeline_curate_end2end"].fn(spark, SF)
    plan = checks.plan_string(df)
    # formatted mode assigns operator ids bottom-up (leaves lowest): the
    # length-gate Filter's id must be below every Exchange's id
    gate_ids = [
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) Filter\n[^\n]*\nCondition[^\n]*length", plan)
    ]
    exch_ids = [int(m.group(1)) for m in re.finditer(r"Exchange \((\d+)\)", plan)]
    assert gate_ids and exch_ids, plan
    assert min(gate_ids) < min(exch_ids), plan


def test_events_anomaly_stats_join_broadcasts(spark):
    """The per-type stats table must come back as a broadcast — the
    event scan itself never shuffles for the join."""
    df = load_all()["events_anomaly"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_partitioned_sink_scan_prunes_directories(spark, tmp_path):
    """A filter on the hive-partition column must resolve to
    PartitionFilters (directory pruning) — not a data filter re-checked
    per row, and not a full-layout scan."""
    from hivekudu_handler_spark.operators.ddl import partitioned_events_scan

    df = partitioned_events_scan(spark, SF, str(tmp_path / "ev"), "click")
    plan = checks.plan_string(df)
    pf = "\n".join(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf, plan
    # the predicate is fully consumed by pruning: no residual event_type
    # filter remains in PushedFilters (data-file level)
    pushed = checks.pushed_filters(df)
    assert "event_type" not in pushed, plan
    # and only the matching partition's rows come back
    types = [r["event_type"] for r in df.select("event_type").distinct().collect()]
    assert types == ["click"]


def test_kmeans_assignment_is_scan_shaped(spark):
    """Lloyd assignment embeds centroids as literals: the corpus is never
    shuffled and never joined — zero Exchange below the final stats agg."""
    from hivekudu_handler_spark.pipeline.clustering import _assign
    from hivekudu_handler_spark.pipeline.similarity import _as_double
    from hivekudu_handler_spark.tables import load_table

    e = _as_double(load_table(spark, SF, "embeddings"))
    cents = [(i, [float(i)] * 8) for i in range(4)]
    df = _assign(e.withColumn("v", F.slice("v", 1, 8)), cents)
    assert checks.count_shuffles(df) == 0, checks.plan_string(df)
    assert "Join" not in checks.plan_string(df)


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    """Morton clustering must localize a 2-D box: the fraction of files
    whose (user_id, value) bounding box overlaps the query box is far
    smaller than under a single-column sort of the same rows (where the
    un-sorted dimension spans every file and only the sorted one prunes).
    Parquet min/max stats make overlap count ≈ files actually read."""
    import glob

    import pyarrow.parquet as pq

    from hivekudu_handler_spark.operators.zorder import zorder_write
    from hivekudu_handler_spark.tables import load_events

    ev = load_events(spark, SF).select("event_id", "user_id", "value")
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(ev, "user_id", "value", zdir, n_files=16)
    # control: same file count, clustered on user_id only
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def overlap_fraction(d: str, ulo, uhi, vlo, vhi) -> float:
        files = glob.glob(f"{d}/part-*.parquet")
        assert len(files) >= 8, files
        hits = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            umin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
            umax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
            vmin = min(md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups))
            vmax = max(md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups))
            if umax >= ulo and umin <= uhi and vmax >= vlo and vmin <= vhi:
                hits += 1
        return hits / len(files)

    # a box ~1/5 of each axis
    z_frac = overlap_fraction(zdir, 10, 19, 5.0, 15.0)
    s_frac = overlap_fraction(sdir, 10, 19, 5.0, 15.0)
    # single-column sort prunes only the user axis: every surviving file
    # still spans all values; z-order must strictly beat it
    assert z_frac < s_frac, (z_frac, s_frac)
    assert z_frac <= 0.5, z_frac


def test_stats_driven_join_broadcasts_without_size_estimates(spark, tmp_path):
    """With Spark's own size-estimate broadcasting disabled, the
    stats-driven join must STILL broadcast the 25-row nation side — the
    decision provably comes from the ANALYZE profile, not file sizes."""
    from hivekudu_handler_spark.operators.ddl import stats_driven_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = stats_driven_join(spark, SF, tmp_path / "cbo")
        plan = checks.plan_string(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.catalog.dropTempView("cust_src")
        spark.catalog.dropTempView("nat_src")


def test_morton_code_is_bijective(spark):
    """Property: the 16-bit Morton interleave is a bijection of the two
    8-bit inputs (decodable back), so range-partitioning on it can never
    collide distinct cells into one code."""
    from hypothesis import given, settings, strategies as st

    from hivekudu_handler_spark.operators.zorder import _morton16

    pairs = st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=64, unique=True,
    )

    @settings(max_examples=10, deadline=None)
    @given(pairs)
    def check(ps):
        df = spark.createDataFrame(ps, "a long, b long")
        rows = df.select("a", "b", _morton16(F.col("a"), F.col("b")).alias("z")).collect()
        for r in rows:
            assert 0 <= r["z"] < 1 << 16
            a = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
            b = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
            assert (a, b) == (r["a"], r["b"])

    check()


def test_null_safe_join_is_hash_not_nested_loop(spark):
    """eqNullSafe must plan as a hash/equi join (NULLs hash like values
    under null-safe equality) — never BroadcastNestedLoopJoin, which is
    what a naive OR-of-isnull rewrite degenerates to."""
    df = load_all()["join_null_safe"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "NestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or (
        "ShuffledHashJoin" in plan
    ), plan


def test_range_frame_single_window_pass(spark):
    """The RANGE frame plans exactly one exchange (the partition-key
    shuffle); both band aggregates share one Window node."""
    df = load_all()["win_range_frame"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)
    plan = checks.plan_string(df, mode="simple")
    assert plan.count("Window") == 1, plan


def test_global_sort_position_has_no_window(spark):
    """sort_global / sort_nulls_order materialize the global rank via
    range-partitioned sort + broadcast offsets + partition-local
    cumcount (operators/sorts.py with_global_position) — the plan must
    contain NO WindowExec at all (an unpartitioned row_number window
    funnels the whole table through one task; r6 verdict's two flagged
    scale-killers) and the sort must be the parallel range-partitioned
    one.  Since the r7-ADVICE localCheckpoint fix the returned plan is
    truncated at ExistingRDD, so the range sort is asserted on the
    pre-checkpoint stage the checkpoint job executed (returned
    explicitly via ``return_pre_checkpoint=True`` since r9 — the r8
    dynamic-attribute seam vanished through transformations)."""
    from hivekudu_handler_spark.operators.sorts import with_global_position
    from hivekudu_handler_spark.tables import load_table

    for key in ("sort_global", "sort_nulls_order"):
        df = load_all()[key].fn(spark, SF)
        plan = checks.plan_string(df, mode="simple")
        assert "Window" not in plan, (key, plan)
        assert "SinglePartition" not in plan, (key, plan)

    _, pre_checkpoint = with_global_position(
        load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        return_pre_checkpoint=True,
    )
    sorted_plan = checks.plan_string(pre_checkpoint, mode="simple")
    assert "rangepartitioning" in sorted_plan.lower(), sorted_plan
    assert "Window" not in sorted_plan, sorted_plan
    assert "SinglePartition" not in sorted_plan, sorted_plan


def test_incremental_dedup_is_inverted_index_shaped(spark):
    """dedup_incremental must pair through the shingle equi-join (hash
    or sort-merge on the shingle key) — never a cartesian/nested-loop
    over docs — and the batch filter must sit below the join so the
    left side is delta-sized."""
    df = load_all()["dedup_incremental"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "is_batch" in plan, plan  # the batch gate exists in-plan


def test_banded_pairing_keys_have_no_cartesian(spark):
    """dedup_incremental_minhash and mm_image_phash_dedup must pair
    through band/chunk equi-joins — never a cartesian or nested-loop
    over documents."""
    for key in ("dedup_incremental_minhash", "mm_image_phash_dedup"):
        df = load_all()[key].fn(spark, SF)
        plan = checks.plan_string(df)
        assert "CartesianProduct" not in plan, (key, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (key, plan)


def test_range_search_is_scan_shaped(spark):
    """Range search must have NO ranking stage at all: no Window (the
    top-k path's rank step), no hashpartitioning exchange of the corpus
    — just the broadcast query probe over one corpus scan."""
    plan = checks.plan_string(load_all()["sim_range_search"].fn(spark, SF))
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_containment_shares_inverted_index_shape(spark):
    """Containment pairs come from the same inverted-index join as
    Jaccard: a shingle-key equi-join (SortMergeJoin/ShuffledHashJoin on
    the hashed shingle), never a CartesianProduct over documents."""
    plan = checks.plan_string(load_all()["dedup_containment"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_nearest_single_exchange_and_directional_agreement(spark):
    """join_asof_nearest's dual-frame windows must share one exchange +
    sort (the full-outer composition of the two directional results
    would pay two), and its picks must agree with the directional keys:
    the chosen gap is the min of the backward/forward gaps wherever
    both directions matched."""
    specs = load_all()
    near = specs["join_asof_nearest"].fn(spark, SF)
    assert checks.count_shuffles(near) == 1
    assert "Python" not in checks.plan_string(near)
    picked = {r["purchase_id"]: r["abs_gap_us"] for r in near.collect()}
    back = {r["purchase_id"]: r["gap_us"] for r in specs["join_asof"].fn(spark, SF).collect()}
    fwd = {r["purchase_id"]: r["gap_us"] for r in specs["join_asof_forward"].fn(spark, SF).collect()}
    assert set(picked) == set(back) | set(fwd)
    big = 1 << 62
    for pid, gap in picked.items():
        assert gap == min(back.get(pid, big), fwd.get(pid, big)), pid


def test_approx_percentile_certification_single_aggregate(spark):
    """The exact-bounds certification inside agg_approx_percentile (the
    r9 oracle promotion, plan showcased in PLANS.md) must stay ONE
    partial/final aggregate over ONE shuffle: the GK sketches and the
    six exact percentiles (p50/p95 + the four ±2eps band edges) all fold
    in the same Aggregate, so certifying the sketch costs no extra pass
    over the fact table — the certification would be pointless if it
    doubled the scan or shuffle count it certifies."""
    df = load_all()["agg_approx_percentile"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in optimized, optimized
    # exact percentile and sketch live in the SAME aggregate node
    import re

    aggs = re.findall(r"Aggregate \[.*", optimized)
    assert len(aggs) == 1, optimized
    assert "percentile_approx" in aggs[0] and "percentile(" in aggs[0], aggs[0]


def test_pca_projection_is_scan_shaped(spark):
    """The production projection pass (pca_project_vectors) must be
    pure scan + Arrow map: the component matrix broadcasts, so nothing
    justifies an exchange — the r10 cleanup removed a cosmetic global
    sort that range-shuffled the whole corpus for row order the driver
    verifier ignores.  The REGISTERED exact-bounds wrapper (r15) is
    allowed exactly one extra exchange: the 1-row captured-variance
    fold, rejoined via broadcast (no corpus shuffle)."""
    from hivekudu_handler_spark.pipeline.pca import pca_project_vectors

    prod = pca_project_vectors(spark, SF)
    assert checks.count_shuffles(prod) == 0, checks.plan_string(prod)

    df = load_all()["emb_pca_project"].fn(spark, SF)
    assert checks.count_shuffles(df) == 1, checks.plan_string(df)
    assert "BroadcastNestedLoopJoin" in checks.plan_string(df)


def test_skew_join_aqe_rewrite_fires(spark):
    """AQE's OptimizeSkewedJoin must actually fire on skew_join_raw's
    deliberately skewed fact side (87% of rows on one hot key): the
    FINAL adaptive plan shows SortMergeJoin(skew=true) over a skewed
    AQEShuffleRead — the runtime split join_salted performs manually.
    Thresholds are scaled to the fixture (the production defaults are
    256 MB/64 MB); mappers=16 restores map-output granularity the
    single-row-group fixture parquet lacks (a 1-mapper shuffle cannot
    be skew-split — see skew_join_raw's docstring)."""
    from hivekudu_handler_spark.operators.joins import skew_join_raw

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    sf = "/root/testdata/sf0.01"  # sf0.001's hot partition is under the
    # 64KB threshold; this test needs real volume behind the hot key
    from hivekudu_handler_spark.tables import load_table

    # every lineitem row survives the inner join (orders is the full
    # key universe), so the expected count is the fixture's row count —
    # not a literal coupled to one generation of the sf0.01 parquet
    expected = load_table(spark, sf, "lineitem").count()
    with tuned_confs(spark, tuned):
        df = skew_join_raw(spark, sf, mappers=16)
        rows = df.collect()  # AQE finalizes the plan only on execution
        assert len(rows) == expected
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan


def test_dpp_prunes_fact_partitions(spark, tmp_path):
    """The fact scan of join_dpp's layout must carry a dynamicpruning#
    subquery in its PartitionFilters — directories are selected at
    RUNTIME from the dim's surviving keys (the dim predicate is an
    aggregate result, so no static filter can be inferred), and the
    executed plan reuses the join's broadcast for the pruning subquery."""
    from hivekudu_handler_spark.operators.ddl import dpp_fact_and_dim

    fact, dim = dpp_fact_and_dim(spark, SF, str(tmp_path / "ev"))
    df = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # the pruning subquery rides the join's broadcast, not a second scan
    assert "SubqueryAdaptiveBroadcast" in plan or "SubqueryBroadcast" in plan, plan


def test_runtime_bloom_filter_injected(spark):
    """Under fixture-scaled thresholds, the selective orders filter must
    inject a bloom filter into the lineitem side of join_runtime_bloom:
    the optimized plan builds bloom_filter_agg over the surviving keys
    and applies might_contain to the fact scan side — rows drop BEFORE
    the shuffle."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # bloom needs a shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    with tuned_confs(spark, tuned):
        df = load_all()["join_runtime_bloom"].fn(spark, SF)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        assert "might_contain" in opt, opt


def test_volume_anomaly_single_scan_pruned(spark):
    """events_volume_anomaly (r17): the corpus appears ONCE in the plan
    (med and MAD are chained window aggregates over the bounded daily
    frame, not separate group-bys joined back — the join form replanned
    the corpus aggregation 4×), the scan reads only (ts, event_type),
    and the whole plan carries at most 3 exchanges: corpus→daily cells,
    the per-type window, the final sort."""
    from hivekudu_handler_spark.operators.event_analytics import (
        events_volume_anomaly,
    )

    df = events_volume_anomaly(spark, SF)
    plan = checks.plan_string(df)
    assert plan.count("ReadSchema") == 1, plan
    schema = checks.read_schema(df)
    assert "event_type" in schema and "ts" in schema, schema
    assert "value" not in schema and "props" not in schema, schema
    assert checks.count_shuffles(df) <= 3, plan


def test_bloom_index_build_single_shuffle_with_partial_agg(spark, tmp_path):
    """scan_bloom_index (r17): the sidecar build is ONE shuffle whose
    map side already dedups positions (partial collect_set under an
    ObjectHashAggregate), so what crosses the wire per file per mapper
    is bounded by the filter width M, not the row count."""
    from hivekudu_handler_spark.operators.bloom_index import bloom_index_frame

    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    data = str(tmp_path / "ev")
    ev.repartitionByRange(4, "ts").write.parquet(data)
    idx = bloom_index_frame(spark, data, "event_id")
    plan = checks.plan_string(idx)
    assert checks.count_shuffles(idx) == 1, plan
    # partial aggregation below the exchange: two aggregate operators
    assert plan.count("Aggregate") >= 2, plan


def test_cte_recursive_is_union_loop_not_cartesian(spark):
    """cte_recursive (r17): Spark 4 executes WITH RECURSIVE as an
    iterative UnionLoop over the frontier — the plan must carry the
    loop operator and no cartesian/nested-loop join (a transitive
    closure by cross join would be the 100 TB disaster shape)."""
    from hivekudu_handler_spark.operators.sql_surface import cte_recursive

    df = cte_recursive(spark, SF)
    plan = checks.plan_string(df)  # physical: UnionLoopExec must be real
    assert "UnionLoop" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_join_view_delta_terms_are_broadcast(spark, tmp_path):
    """mview_join_incremental (r17): both delta-rule terms join a
    BROADCAST delta frame against a base scan — the counterpart bases
    must never shuffle for the delta join (the only shuffle-class joins
    allowed are the final delta-into-base full-outer merge and the
    group-by exchanges)."""
    from hivekudu_handler_spark.operators.ddl import _scratch_store
    from hivekudu_handler_spark.operators.snapshots import join_view_delta_refresh
    import shutil as _shutil

    store, d = _scratch_store(spark)
    try:
        store.create_table("l", "lid bigint, k bigint, m bigint", ["lid"])
        store.create_table("r", "k bigint, grp string", ["k"])
        store.insert_values("l", [(1, 1, 10), (2, 2, 20)])
        store.insert_values("r", [(1, "A"), (2, "B")])
        vl, vr = store.current_version("l"), store.current_version("r")
        base = spark.createDataFrame(
            [("A", 1, 10), ("B", 1, 20)], "grp string, n_rows bigint, sum_m bigint"
        )
        store.upsert("l", spark.createDataFrame([(1, 1, 30)], "lid bigint, k bigint, m bigint"))
        store.upsert("r", spark.createDataFrame([(2, "Z")], "k bigint, grp string"))
        out = join_view_delta_refresh(
            store, base, left="l", right="r", v_left=vl, v_right=vr,
            lkey="k", rkey="k", group_col="grp", measure_col="m",
        )
        plan = checks.plan_string(out)
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        _shutil.rmtree(d, ignore_errors=True)
