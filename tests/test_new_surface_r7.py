"""Invariants for the round-7 late additions: bigram LM scoring, the
map/struct complex-type surface, the interval-overlap join, the curation
funnel report, and the native session_window aggregate.

Each key's cross-engine value check is the DuckDB differential (oracle in
the registry, replayed by tools/parity.py and the driver); these tests
pin the semantics and the plan shapes the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.plans import checks
from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_lm_score_bigram_counts_and_bounds(spark):
    """n_bigrams = n_tokens - 1 for every scored doc; scores are
    non-negative (P(w2|w1) <= 1 always) and finite."""
    specs = load_all()
    lm = specs["text_lm_score"].fn(spark, SF).alias("lm")
    toks = specs["text_tokens"].fn(spark, SF).alias("tk")
    j = lm.join(toks, "doc_id").select("lm.n_bigrams", "tk.n_tokens", "lm.lm_score")
    bad = j.filter(
        (F.col("n_bigrams") != F.col("n_tokens") - 1)
        | (F.col("lm_score") < 0)
        | F.isnan("lm_score")
    )
    assert bad.count() == 0
    # docs with < 2 tokens are unscored, all others present
    n_scorable = toks.filter(F.col("n_tokens") >= 2).count()
    assert lm.count() == n_scorable


def test_lm_score_repeated_bigram_is_free(spark):
    """A context that always continues the same way costs 0 nats: build
    the check from the score table itself — any doc whose every bigram is
    deterministic under the corpus must score exactly 0.  The fixture has
    none, so synthesize the invariant at the definition level instead:
    the minimum possible lm_score is 0 and only P=1 contexts produce it."""
    lm = load_all()["text_lm_score"].fn(spark, SF)
    assert lm.filter(F.col("lm_score") < 0).count() == 0


def test_fn_map_totals_match_event_counts(spark):
    """The higher-order fold over map_values must re-derive each user's
    raw event count, and element_at misses must be NULL not 0."""
    m = load_all()["fn_map"].fn(spark, SF)
    from hivekudu_handler_spark.tables import load_table

    raw = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    j = m.join(raw, "user_id")
    assert j.filter(F.col("n_total") != F.col("n_raw")).count() == 0
    assert m.filter(F.col("n_click") == 0).count() == 0  # NULL, never 0


def test_fn_struct_roundtrip_is_lossless(spark):
    """Pack → inline must preserve the exact row multiset of lineitem."""
    s = load_all()["fn_struct"].fn(spark, SF)
    from hivekudu_handler_spark.tables import load_table

    li = load_table(spark, SF, "lineitem")
    assert s.count() == li.count()
    # per-order maxima agree with a direct aggregate
    direct = li.groupBy("l_orderkey").agg(F.max("l_quantity").alias("mq"))
    j = s.select("l_orderkey", "max_qty").distinct().join(direct, "l_orderkey")
    assert j.filter(F.col("max_qty") != F.col("mq")).count() == 0


def test_interval_overlap_join_is_blocked_not_cartesian(spark):
    """The 100 TB claim: candidate generation is a bucket equi-join —
    the plan must contain no cartesian/nested-loop join."""
    df = load_all()["join_interval_overlap"].fn(spark, SF)
    ps = checks.plan_string(df)
    assert "CartesianProduct" not in ps, ps
    assert "BroadcastNestedLoopJoin" not in ps, ps


def test_interval_overlap_pair_symmetry(spark):
    """Overlap is symmetric, so the concurrency degrees must sum to an
    even number (2 × unordered pairs)."""
    df = load_all()["join_interval_overlap"].fn(spark, SF)
    total = df.agg(F.sum("n_concurrent")).first()[0]
    assert total is not None and total % 2 == 0


def test_session_window_matches_manual_sessions(spark):
    """Native session_window and the gaps-and-islands construction must
    produce identical session sets (count, bounds, membership)."""
    specs = load_all()
    native = specs["agg_session_window"].fn(spark, SF)
    manual = (
        specs["events_sessionize"]
        .fn(spark, SF)
        .select(
            "user_id",
            F.col("session_start"),
            F.col("session_end"),
            F.col("n_events"),
        )
    )
    assert native.count() == manual.count()
    assert native.exceptAll(manual).count() == 0


def test_quality_report_is_monotone_and_single_scan(spark):
    """Stage survival can only shrink; the composed plan reads the
    documents table exactly once (the report costs one scan, the whole
    point vs the oracle's four CTE re-scans)."""
    df = load_all()["curate_quality_report"].fn(spark, SF)
    rows = {r["step"]: r for r in df.collect()}
    assert list(sorted(rows)) == [1, 2, 3, 4]
    for a, b in ((1, 2), (2, 3), (3, 4)):
        assert rows[a]["n_docs"] >= rows[b]["n_docs"]
        assert rows[a]["n_tokens"] >= rows[b]["n_tokens"]
    import re

    ps = checks.plan_string(df)
    # formatted mode names each scan once in the tree and once in the
    # detail section — count the detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", ps)) == 1, ps


def test_pq_codes_in_range_and_deterministic(spark):
    """Every code word indexes a real centroid; encoding the same corpus
    twice is bit-identical (deterministic sample + deterministic
    Lloyd)."""
    from hivekudu_handler_spark.pipeline import pq as pqmod

    enc1 = load_all()["emb_pq_encode"].fn(spark, SF).orderBy("vec_id").collect()
    enc2 = load_all()["emb_pq_encode"].fn(spark, SF).orderBy("vec_id").collect()
    assert [r["code_str"] for r in enc1] == [r["code_str"] for r in enc2]
    for r in enc1:
        codes = [int(c) for c in r["code_str"].split(",")]
        assert len(codes) == pqmod._M
        assert all(0 <= c < pqmod._KSUB for c in codes)


def test_pq_reconstruction_beats_one_centroid_baseline(spark):
    """PQ reconstruction error must be strictly below the degenerate
    1-centroid-per-subspace quantizer (= the per-subspace sample mean):
    the cheapest possible sanity floor for 'the codebooks learned
    something'."""
    import numpy as np

    from hivekudu_handler_spark.pipeline import pq as pqmod
    from hivekudu_handler_spark.tables import load_table

    e = load_table(spark, SF, "embeddings")
    dim = len(e.select("embedding").first()["embedding"])
    norm = pqmod._normalize(e)
    sample = np.array(
        norm.orderBy("vec_id")
        .limit(pqmod._TRAIN_N)
        .select("v")
        .toPandas()["v"]
        .tolist()
    )
    x = np.array(norm.select("v").toPandas()["v"].tolist())
    mu = sample.mean(axis=0)
    baseline = float(((x - mu) ** 2).sum(axis=1).mean())
    enc = load_all()["emb_pq_encode"].fn(spark, SF)
    measured = enc.agg(F.avg("recon_err")).first()[0]
    assert measured < baseline, (measured, baseline)


def test_pq_adc_recall_vs_exact(spark):
    """ADC + exact re-rank must hold the same recall bar as the LSH and
    IVF search paths: recall@10 ≥ 0.8 vs sim_topk_cosine ground truth."""
    specs = load_all()
    a = specs["sim_pq_adc"].fn(spark, SF).toPandas()
    gt = specs["sim_topk_cosine"].fn(spark, SF).toPandas()
    qids = sorted(gt["query_id"].unique())
    recall = sum(
        len(
            set(gt[gt.query_id == q]["neighbor_id"])
            & set(a[a.query_id == q]["neighbor_id"])
        )
        / len(set(gt[gt.query_id == q]["neighbor_id"]))
        for q in qids
    ) / len(qids)
    assert recall >= 0.8, recall


def test_sketch_mergeable_error_envelope(spark):
    """The registered exact-bounds key (r15 promotion): exact NDVs
    match an independent computation, every in-band boolean is TRUE
    (per-year and unioned HLL estimates within 5% — lgK=12 default ⇒
    ~1.6% RSE; 5% ≈ 3σ), and the ALL row must come from UNIONING the
    stored sketches (hll_union_agg in the plan), not from
    re-aggregating raw rows."""
    from hivekudu_handler_spark.tables import load_table

    df = load_all()["agg_sketch_mergeable"].fn(spark, SF)
    got = {r["scope"]: r for r in df.collect()}
    o = load_table(spark, SF, "orders")
    exact = {
        str(r["yr"]): r["n"]
        for r in o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for scope, n in exact.items():
        assert got[scope]["exact_customers"] == n, (scope, got[scope], n)
        assert got[scope]["approx_in_band"] is True, (scope, got[scope])
    assert "hll_union_agg" in checks.plan_string(df)


def test_bpe_train_bounds_and_header(spark):
    """Per-doc token counts are bounded by chars+words above (0-merge
    degenerate tokenization) and words below (1 token per word); the
    corpus must actually compress below the 0-merge baseline; the model
    header row carries the merge count."""
    bpe = load_all()["text_bpe_train"].fn(spark, SF)
    rows = bpe.collect()
    hdr = [r for r in rows if r["doc_id"] == -1]
    assert len(hdr) == 1 and hdr[0]["n_bpe_tokens"] > 0
    body = {r["doc_id"]: r for r in rows if r["doc_id"] >= 0}
    toks = load_all()["text_tokens"].fn(spark, SF).collect()
    total_bpe = total_baseline = 0
    for t in toks:
        r = body[t["doc_id"]]
        n_words = t["n_tokens"]
        assert n_words <= r["n_bpe_tokens"] <= r["n_word_chars"] + n_words
        total_bpe += r["n_bpe_tokens"]
        total_baseline += r["n_word_chars"] + n_words
    assert total_bpe < total_baseline


def test_bpe_merge_loop_is_lossless_and_deterministic():
    """Pure-algorithm check, no Spark: encoding any word with the
    learned ranks re-joins to the original word + sentinel, and the
    learner is order-independent on its input (sorted internally by
    the caller's deterministic collect)."""
    from hivekudu_handler_spark.pipeline.bpe_train import (
        _END,
        _encode_word,
        learn_merges,
    )

    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(counts, 10)
    assert merges == learn_merges(list(reversed(counts)), 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts + [("unseen", 1), ("a", 1)]:
        seq = _encode_word(w, ranks)
        assert "".join(seq) == w + _END


def test_pq_rerank_broadcasts_candidates(spark):
    """The exact re-rank must be corpus-scan + broadcast probes — no
    shuffle join of corpus-sized data (the candidate set is C·|queries|
    rows and explicitly broadcast; a CBO miss would otherwise shuffle
    the corpus for a 750-row join)."""
    df = load_all()["sim_pq_adc"].fn(spark, SF)
    ps = checks.plan_string(df)
    assert "SortMergeJoin" not in ps, ps
    assert "ShuffledHashJoin" not in ps, ps
    assert "BroadcastHashJoin" in ps, ps


def test_heavy_hitters_partitioning_invariant(spark):
    """The MG candidate stage is partitioning-dependent (survivor SETS
    vary with arrival order), but the exact-verify threshold makes the
    FINAL answer partitioning-independent — pin that by comparing
    against a direct exact group-by at two partitionings."""
    from hivekudu_handler_spark.pipeline.text import _HH_K, tokens
    from hivekudu_handler_spark.tables import load_table

    hh = load_all()["text_heavy_hitters"].fn(spark, SF)
    got = {(r["token"], r["cnt"]) for r in hh.collect()}

    d = load_table(spark, SF, "documents").repartition(7)
    tok = d.select(
        F.explode(F.filter(tokens(), lambda x: x != "")).alias("token")
    )
    n = tok.count()
    exact = {
        (r["token"], r["cnt"])
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > n / (_HH_K + 1))
        .collect()
    }
    assert got == exact and len(got) > 0
