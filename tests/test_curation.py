"""Tests for the corpus-curation operators (pipeline/curation.py):
deterministic shuffle, per-language quota, decontamination, PII scrub."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline import curation
from hivekudu_handler_spark.plans import checks
from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_global_shuffle_is_range_partitioned(spark, specs):
    """The shuffle must materialize as ONE RangePartitioning exchange —
    never a single-task global sort/row_number (the non-scalable way to
    permute a corpus)."""
    df = specs["sample_global_shuffle"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan
    assert "Window" not in plan, plan


def test_global_shuffle_is_permutation_and_deterministic(spark, specs):
    df = specs["sample_global_shuffle"].fn(spark, SF)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs  # permutation: no dup/drop
    assert all(r["shard"] == r["shuffle_key"][:2] for r in rows)
    again = {
        (r["doc_id"], r["shuffle_key"])
        for r in specs["sample_global_shuffle"].fn(spark, SF).collect()
    }
    assert again == {(r["doc_id"], r["shuffle_key"]) for r in rows}


def test_per_lang_quota_two_phase_plan(spark, specs):
    """Same invariant as sim_topk_cosine: the per-lang window must consume
    the MapInPandas fold's bounded candidates, not the whole corpus."""
    df = specs["sample_per_lang_quota"].fn(spark, SF)
    lines = checks.plan_string(df, mode="simple").splitlines()

    def first(needle):
        return next(i for i, l in enumerate(lines) if needle in l)

    assert first("Window") < first("MapInPandas"), "\n".join(lines)


def test_per_lang_quota_matches_single_phase(spark, specs):
    """Lossless truncation: the fold+window result equals a plain window
    over the full corpus under the same (hash, doc_id) order."""
    from pyspark.sql import Window

    two_phase = {
        (r["lang"], r["doc_id"], r["rk"])
        for r in specs["sample_per_lang_quota"].fn(spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    w = Window.partitionBy("lang").orderBy("sort_key", "doc_id")
    single = (
        d.select("lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("sort_key"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= curation._LANG_QUOTA)
    )
    assert two_phase == {(r["lang"], r["doc_id"], r["rk"]) for r in single.collect()}
    # every language is capped at the quota
    per_lang = {}
    for lang, _, _ in two_phase:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert all(v <= curation._LANG_QUOTA for v in per_lang.values())


def test_decontaminate_broadcasts_eval_set(spark, specs):
    """The eval shingle vocabulary must broadcast: the corpus side of the
    contamination join is never shuffled."""
    df = specs["text_decontaminate"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_flags_only_real_overlap(spark, specs):
    """Every flagged doc must actually share >= T distinct shingles with
    the eval set, and no eval doc may flag itself."""
    from hivekudu_handler_spark.pipeline.dedup import doc_shingles

    flagged = {
        r["doc_id"]: r["n_shared"]
        for r in specs["text_decontaminate"].fn(spark, SF).collect()
    }
    assert flagged, "fixture should contain planted near-dups of eval docs"
    sh = {
        r["doc_id"]: set(r["shingles"])
        for r in doc_shingles(spark, SF).collect()
    }
    eval_vocab = set().union(
        *(s for d, s in sh.items() if d % curation._EVAL_MOD == 0)
    )
    for doc, n in flagged.items():
        assert doc % curation._EVAL_MOD != 0
        assert len(sh[doc] & eval_vocab) == n >= curation._DECONTAM_MIN_SHARED


def test_pii_scrub_counts_and_redacts(spark, specs):
    """Planted emails are counted (1 at %7, 2 at %21) and the scrubbed
    text no longer matches the email regex."""
    df = specs["text_pii_scrub"].fn(spark, SF)
    counts = {r["doc_id"]: r["n_pii"] for r in df.collect()}
    for doc, n in counts.items():
        expect = 2 if doc % 21 == 0 else 1 if doc % 7 == 0 else 0
        assert n == expect, (doc, n, expect)
    # no UDF, no shuffle: a pure scan-side transform
    plan = checks.plan_string(df)
    assert checks.count_shuffles(df) == 0, plan
    assert "Python" not in plan, plan


def test_quantize_reconstruction_error_bounded(spark, specs):
    """SQ8 guarantee: |v_i - q_i*scale| <= scale/2 for every component,
    checked by recomputing the quantization in numpy from the raw
    embeddings and matching the operator's digest and checksum."""
    import hashlib

    import numpy as np

    out = {r["vec_id"]: r for r in specs["emb_quantize_int8"].fn(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    assert len(out) == len(emb)
    for r in emb:
        v = np.asarray(r["embedding"], dtype=np.float64)
        scale = float(np.max(np.abs(v))) / 127.0
        q = (
            np.zeros(len(v), dtype=np.int64)
            if scale == 0
            else np.floor(v / scale + 0.5).astype(np.int64)
        )
        got = out[r["vec_id"]]
        assert abs(got["scale"] - scale) < 1e-15
        assert got["q_sum"] == int(q.sum())
        digest = hashlib.md5(",".join(str(int(x)) for x in q).encode()).hexdigest()
        assert got["q_md5"] == digest
        if scale:
            assert np.max(np.abs(v - q * scale)) <= scale / 2 + 1e-12
            assert np.max(np.abs(q)) <= 127


def test_pack_sequences_invariants(spark, specs):
    """Exactly-once coverage, budget compliance, contiguous offsets in
    hash order, and greedy minimality (a doc opens a new sequence only
    when it would not fit in the previous one)."""
    import collections

    rows = specs["doc_pack_sequences"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    assert len({r["doc_id"] for r in rows}) == len(docs)  # exactly once
    n_tok = {
        d["doc_id"]: len(d["text"].split(" ")) for d in docs
    }
    by_seq = collections.defaultdict(list)
    for r in rows:
        assert r["n_tokens"] == n_tok[r["doc_id"]]
        assert r["truncated"] == (r["n_tokens"] > curation._PACK_BUDGET)
        by_seq[r["seq_id"]].append(r)
    for seq in by_seq.values():
        seq.sort(key=lambda r: r["offset"])
        fill = 0
        for r in seq:
            assert r["offset"] == fill  # contiguous
            fill += r["n_tokens"]
        assert fill <= curation._PACK_BUDGET or (
            len(seq) == 1 and seq[0]["truncated"]
        )
    # greedy: within a bucket, consecutive sequence ids mean the first
    # doc of seq k+1 did not fit in seq k
    bucket_of = lambda s: s >> 40
    fills = {s: sum(r["n_tokens"] for r in rs) for s, rs in by_seq.items()}
    for s, rs in by_seq.items():
        nxt = s + 1
        if nxt in by_seq and bucket_of(nxt) == bucket_of(s):
            first_next = min(by_seq[nxt], key=lambda r: r["offset"])
            assert fills[s] + first_next["n_tokens"] > curation._PACK_BUDGET


def test_pack_sequences_partitioning_independent(spark, specs):
    """The packing must be a pure function of the corpus, not of input
    partitioning: groupBy(bucket) re-shuffles everything to one task per
    bucket regardless of upstream splits."""
    base = {
        (r["doc_id"], r["seq_id"], r["offset"])
        for r in specs["doc_pack_sequences"].fn(spark, SF).collect()
    }
    again = {
        (r["doc_id"], r["seq_id"], r["offset"])
        for r in specs["doc_pack_sequences"].fn(spark, SF).collect()
    }
    assert base == again


def test_pack_sequences_oversized_docs_truncate(spark):
    """Synthetic corpus with docs over the budget (the fixture has none):
    oversized docs must become singleton truncated sequences and normal
    docs must still pack greedily around them."""
    from hivekudu_handler_spark.pipeline.curation import _PACK_BUDGET, doc_pack_sequences
    import hivekudu_handler_spark.pipeline.curation as cur

    words = lambda n: " ".join(["w"] * n)
    rows = [(i, words(300 if i % 5 == 0 else 40)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import unittest.mock as mock

    with mock.patch.object(cur, "load_table", lambda s, sf, name: df):
        out = doc_pack_sequences(spark, "ignored").collect()

    assert len(out) == 50
    assert {r["doc_id"] for r in out} == set(range(50))
    import collections

    by_seq = collections.defaultdict(list)
    for r in out:
        by_seq[r["seq_id"]].append(r)
    for r in out:
        if r["doc_id"] % 5 == 0:
            assert r["truncated"] and r["offset"] == 0
            assert len(by_seq[r["seq_id"]]) == 1  # singleton
        else:
            assert not r["truncated"]
    for seq in by_seq.values():
        total = sum(r["n_tokens"] for r in seq)
        assert total <= _PACK_BUDGET or (len(seq) == 1 and seq[0]["truncated"])


def test_decontaminate_filters_before_shingling(spark, specs):
    """The eval/train split predicates must sit directly on the scans,
    below the (expensive) tokenize+shingle projection: at 100 TB the eval
    branch must shingle only the benchmark docs, not re-shingle the
    corpus. Catalyst pushes the modulo filter through the repartition and
    projection; this pins that it keeps doing so."""
    df = specs["text_decontaminate"].fn(spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = [l for l in opt.splitlines() if l.strip()]
    rel_idx = [i for i, l in enumerate(lines) if "Relation" in l and "parquet" in l]
    assert len(rel_idx) == 2, opt
    for i in rel_idx:
        assert "Filter" in lines[i - 1] and "% 97" in lines[i - 1], opt


def test_export_shards_balanced_and_contiguous(spark):
    """curate_export_shards: shard sizes within +-1, shards contiguous in
    the global order, every position distinct 1..n."""
    from hivekudu_handler_spark.registry import load_all

    out = load_all()["curate_export_shards"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(out)
    assert sorted(r["pos"] for r in out) == list(range(1, n + 1))
    sizes = {}
    bounds = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
        lo, hi = bounds.get(r["shard"], (r["pos"], r["pos"]))
        bounds[r["shard"]] = (min(lo, r["pos"]), max(hi, r["pos"]))
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    # contiguity: each shard's position range is exactly its size
    for s, (lo, hi) in bounds.items():
        assert hi - lo + 1 == sizes[s], (s, lo, hi, sizes[s])
    # shards ordered: shard k's max < shard k+1's min
    for s in sorted(bounds)[:-1]:
        assert bounds[s][1] < bounds[s + 1][0]


def test_mixture_sample_hits_target_shares(spark):
    """curate_mixture_sample: the derived rates must land the output
    near the configured mixture (binomial noise only), membership must
    be deterministic, and no unconfigured language may leak through."""
    from hivekudu_handler_spark.pipeline.curation import (
        _MIXTURE_BUDGET,
        _MIXTURE_SHARES,
    )
    from hivekudu_handler_spark.registry import load_all

    SFD = "/root/testdata/sf0.001"
    fn = load_all()["curate_mixture_sample"].fn
    out = fn(spark, SFD).collect()
    again = fn(spark, SFD).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}
    assert {r["lang"] for r in out} <= set(_MIXTURE_SHARES)
    n_corpus = spark.read.parquet(f"{SFD}/documents.parquet").count()
    budget = _MIXTURE_BUDGET * n_corpus
    got = {}
    for r in out:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    for lang, share in _MIXTURE_SHARES.items():
        target = budget * share
        # 4 sigma of binomial noise at these counts
        tol = 4 * (target ** 0.5) + 1
        assert abs(got.get(lang, 0) - target) <= tol, (lang, got.get(lang), target)
