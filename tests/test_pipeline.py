"""Tests for the LLM-pipeline operators: dedup recall/precision,
similarity-search recall, multimodal plumbing (SURVEY.md §7 M4)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline import dedup, multimodal, similarity
from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_matches_exact_pairs(spark, specs):
    """Exact-verified LSH: precision 1.0 by construction; and since r8
    the key is ORACLE-backed on the premise that the deterministic band
    probe has recall exactly 1.0 on the fixtures — so this pins full
    set equality, not a recall floor (a fixture change that introduced
    an LSH miss must fail here before it fails the driver gate)."""
    exact = _pairs(dedup.ngram_jaccard_pairs(spark, SF, 0.5))
    mh = _pairs(specs["dedup_minhash"].fn(spark, SF))
    assert exact, "fixture must contain near-dup pairs"
    assert mh == exact, (
        f"missed: {exact - mh}, spurious: {mh - exact}"
    )


def test_incremental_minhash_equals_exact_incremental(spark, specs):
    """dedup_incremental_minhash and dedup_signature_store share
    dedup_incremental's oracle (r8 promotion) — valid iff all three
    emit the identical batch-vs-corpus pair set."""
    rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    exact = rows(specs["dedup_incremental"].fn(spark, SF))
    lsh = rows(specs["dedup_incremental_minhash"].fn(spark, SF))
    stored = rows(specs["dedup_signature_store"].fn(spark, SF))
    assert exact
    assert lsh == exact
    assert stored == exact


def test_simhash_pairs_are_near_duplicates(spark, specs):
    """Every emitted pair must verify: hamming <= 3 is checked inside the
    operator; here we check determinism and symmetry invariants."""
    a = specs["dedup_simhash"].fn(spark, SF)
    rows1 = sorted(tuple(r) for r in a.collect())
    rows2 = sorted(tuple(r) for r in specs["dedup_simhash"].fn(spark, SF).collect())
    assert rows1 == rows2  # deterministic
    for doc_a, doc_b, hamming in rows1:
        assert doc_a < doc_b and 0 <= hamming <= 3


def test_ann_verified_pairs_vs_exact(spark, specs):
    """The composed 100 TB near-dup path (LSH candidates → exact verify):
    (a) precision 1.0 — every emitted pair is in the exact all-pairs
    output with the identical cosine; (b) recall ≥ 0.8 vs the exact
    operator at fixture scale; (c) the plan scores candidates only —
    every join is an equi-join (band/bucket or pair id), no cartesian of
    the corpus against itself anywhere."""
    from hivekudu_handler_spark.plans.checks import plan_string

    ann_df = specs["dedup_ann_verified"].fn(spark, SF)
    plan = plan_string(ann_df)
    assert "CartesianProduct" not in plan, plan
    # exact all-pairs baseline at the key's threshold (500 vectors: the
    # brute-force join is trivially affordable in a test)
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", dot / (nrm(F.col("va")) * nrm(F.col("vb"))))
        .filter(F.col("cos") >= 0.42)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
        .collect()
    }
    ann = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in ann_df.collect()}
    assert set(ann) <= set(exact), sorted(set(ann) - set(exact))[:5]
    for pair, cos in ann.items():
        assert cos == pytest.approx(exact[pair], abs=1e-4)
    assert exact, "fixture must contain near-dup pairs for recall to mean anything"
    recall = len(set(ann) & set(exact)) / len(exact)
    assert recall >= 0.8, f"ann recall {recall} over {len(exact)} exact pairs"
    # consistency tie to the registered exact operator: the ann pairs at
    # its 0.5 threshold are a subset of dedup_embedding's output
    emb = {
        (r["vec_a"], r["vec_b"])
        for r in specs["dedup_embedding"].fn(spark, SF).collect()
    }
    assert {p for p, c in ann.items() if c >= 0.5} <= emb


def test_exact_dedup_covers_all_docs(spark, specs):
    out = specs["dedup_exact_docs"].fn(spark, SF)
    total = out.agg(F.sum("n_copies")).collect()[0][0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs


def test_ann_lsh_recall_vs_bruteforce(spark, specs):
    """The registered LSH operating point (48 bits / 12 four-bit tables)
    must hold recall ≥ 0.8 vs the exact top-k — the same rigor as
    dedup_ann_verified's ≥ 0.8 pin (r6 verdict item 6).  Rows-only keys
    have no oracle, so this assertion IS their correctness story."""
    exact = specs["sim_topk_cosine"].fn(spark, SF)
    ann = specs["sim_ann_lsh"].fn(spark, SF)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"LSH recall {recall} over {len(e)} truth pairs"


def test_ivf_recall_vs_bruteforce(spark, specs):
    """sim_ivf at the registered (8 centroids, nprobe=2) point must hold
    recall ≥ 0.8 vs the exact top-k — the search-side mirror of the
    dedup recall pin."""
    exact = specs["sim_topk_cosine"].fn(spark, SF)
    ivf = specs["sim_ivf"].fn(spark, SF)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"IVF recall {recall} over {len(e)} truth pairs"


def test_ivf_kmeans_recall_vs_bruteforce(spark, specs):
    """The Lloyd-fitted quantizer (sim_ivf_kmeans) must hold the same
    ≥ 0.8 recall bar as the raw-seed IVF at the identical probe
    budget."""
    exact = specs["sim_topk_cosine"].fn(spark, SF)
    ivf = specs["sim_ivf_kmeans"].fn(spark, SF)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"IVF-kmeans recall {recall} over {len(e)} truth pairs"


def test_ann_lsh_recall_vs_bits(spark, specs):
    """The (bits, tables) knobs are real: widening the signature to 32
    bits while keeping 4-bit bands (8 tables) must not lose recall vs the
    default 16-bit/4-table config — that's the documented scale path for
    corpora where 2^16 buckets saturate."""
    exact = specs["sim_topk_cosine"].fn(spark, SF)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    r16 = similarity.ann_lsh_topk(spark, SF, bits=16, tables=4)
    r32 = similarity.ann_lsh_topk(spark, SF, bits=32, tables=8)
    rec16 = len({(r["query_id"], r["neighbor_id"]) for r in r16.collect()} & e) / len(e)
    rec32 = len({(r["query_id"], r["neighbor_id"]) for r in r32.collect()} & e) / len(e)
    assert rec32 >= rec16, f"32-bit recall {rec32} < 16-bit recall {rec16}"
    with pytest.raises(ValueError):
        similarity.ann_lsh_topk(spark, SF, bits=16, tables=3)


def test_incremental_dedup_equals_batch_restricted_full_pairing(spark, specs):
    """dedup_incremental (batch vs corpus + batch-internal, no
    corpus×corpus) must emit EXACTLY the full pairing's pairs that touch
    the batch — completeness and no phantom pairs — with the batch doc
    always on the left for corpus matches."""
    from hivekudu_handler_spark.pipeline.dedup import _BATCH_SOURCES

    batch_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("source").isin(*_BATCH_SOURCES))
        .collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): r["jaccard"]
        for r in specs["dedup_ngram_jaccard"].fn(spark, SF).collect()
        if r["doc_a"] in batch_ids or r["doc_b"] in batch_ids
    }
    inc = specs["dedup_incremental"].fn(spark, SF).collect()
    got = {frozenset((r["batch_doc"], r["other_doc"])): r["jaccard"] for r in inc}
    assert got == full
    for r in inc:
        assert r["batch_doc"] in batch_ids
        assert r["other_in_batch"] == (r["other_doc"] in batch_ids)
        if r["other_in_batch"]:
            assert r["batch_doc"] < r["other_doc"]


def test_incremental_minhash_recall_and_precision(spark, specs):
    """dedup_incremental_minhash: precision 1.0 by construction (exact
    verify) — every emitted pair must appear in the exact incremental
    operator with the identical jaccard — and recall ≥ 0.9 at J ≥ 0.5
    (32 bands × 2 rows ⇒ theoretical ≈ 0.9999)."""
    exact = {
        (r["batch_doc"], r["other_doc"]): (r["jaccard"], r["other_in_batch"])
        for r in specs["dedup_incremental"].fn(spark, SF).collect()
    }
    mh = specs["dedup_incremental_minhash"].fn(spark, SF).collect()
    got = {(r["batch_doc"], r["other_doc"]): (r["jaccard"], r["other_in_batch"]) for r in mh}
    assert set(got) <= set(exact), "LSH emitted a pair the exact operator lacks"
    for k, v in got.items():
        assert v == exact[k]
    assert exact, "fixture must contain batch-touching near-dup pairs"
    assert len(got) / len(exact) >= 0.9, f"recall {len(got)}/{len(exact)}"


def test_signature_store_scenario_matches_incremental_minhash(spark, specs):
    """dedup_signature_store (corpus signatures scanned back from the
    managed store, batch-only signature compute, post-probe upsert) must
    emit exactly dedup_incremental_minhash's pairs — storage round-trip
    and bucket layout must not change a single signature."""
    direct = {
        (r["batch_doc"], r["other_doc"]): (r["jaccard"], r["other_in_batch"])
        for r in specs["dedup_incremental_minhash"].fn(spark, SF).collect()
    }
    via_store = {
        (r["batch_doc"], r["other_doc"]): (r["jaccard"], r["other_in_batch"])
        for r in specs["dedup_signature_store"].fn(spark, SF).collect()
    }
    assert via_store == direct
    assert direct, "fixture must contain batch-touching near-dup pairs"


def test_shingle_df_cap_inert_on_fixture(spark):
    """The default hot-shingle cap is far above any fixture DF, so capped
    and effectively-uncapped runs must emit identical pairs (VERDICT r1
    #5 invariant)."""
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(spark, SF, 0.5).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            spark, SF, 0.5, shingle_df_cap=10**9
        ).collect()
    }
    assert capped == uncapped and capped


def test_shingle_df_cap_bounds_hot_shingle(spark, tmp_path):
    """Planted viral shingle: 40 documents sharing one boilerplate
    shingle would produce C(40,2)=780 candidate pairs through it; with
    the cap below 40 the hot shingle is excluded and only genuinely
    similar pairs (sharing non-hot shingles) survive."""
    hot = "copyright acme corporation"
    docs = [(i, f"{hot} unique{i} alpha{i} beta{i} gamma{i}") for i in range(40)]
    # two genuine near-dups sharing all their non-hot content
    docs.append((100, "real duplicate content here and more shared words"))
    docs.append((101, "real duplicate content here and more shared words extra"))
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    lo = dedup.ngram_jaccard_pairs(spark, sf, 0.1, shingle_df_cap=10)
    hi = dedup.ngram_jaccard_pairs(spark, sf, 0.1, shingle_df_cap=10**6)
    lo_pairs = _pairs(lo)
    hi_pairs = _pairs(hi)
    assert (100, 101) in lo_pairs
    # without the cap the hot shingle connects the 40 boilerplate docs
    assert len(hi_pairs) > len(lo_pairs)
    # with the cap, no pair is connected *only* through the hot shingle
    assert all(a >= 100 for a, _ in lo_pairs)


def test_cluster_keeper_invariants(spark, specs):
    """Connected-components clustering over the near-dup pair graph:
    every paired doc appears exactly once, its keeper is the component
    min, and both endpoints of every pair share a keeper."""
    pairs = _pairs(dedup.ngram_jaccard_pairs(spark, SF, 0.5))
    out = {r["doc_id"]: r["keeper_doc_id"] for r in specs["dedup_cluster"].fn(spark, SF).collect()}
    members = {d for p in pairs for d in p}
    assert set(out) == members
    for a, b in pairs:
        assert out[a] == out[b], f"pair ({a},{b}) split across clusters"
    for doc, keeper in out.items():
        assert keeper <= doc
        assert out[keeper] == keeper  # keeper is its own keeper


def test_stratified_sample_rates(spark, specs):
    """Per-stratum hash rates: 'en' sampled at ~4/16, others at ~8/16,
    and membership is the documented pure function of (doc_id, lang)."""
    import hashlib

    full = {(r["doc_id"], r["lang"]) for r in spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang").collect()}
    kept = {(r["doc_id"], r["lang"]) for r in specs["sample_stratified"].fn(spark, SF).collect()}
    assert kept <= full
    for doc_id, lang in full:
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        expect = b in "0123" if lang == "en" else b in "01234567"
        assert ((doc_id, lang) in kept) == expect


def test_ivf_recall_vs_bruteforce(spark, specs):
    exact = specs["sim_topk_cosine"].fn(spark, SF)
    ivf = specs["sim_ivf"].fn(spark, SF)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.2, f"IVF recall {recall}"


def test_bruteforce_topk_shape(spark, specs):
    out = specs["sim_topk_cosine"].fn(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, 11))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


# ---- multimodal -----------------------------------------------------------

def test_decode_media_dispatch_and_seam():
    """PPM and WAV decode natively; codec-library formats still raise at
    the documented seam."""
    import numpy as np

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out = multimodal.decode_media(multimodal.encode_ppm(img))
    assert out["kind"] == "image" and (out["pixels"] == img).all()
    aud = multimodal.decode_media(multimodal.encode_wav([1, -2, 3], 44100))
    assert aud["kind"] == "audio" and aud["sample_rate"] == 44100
    assert list(aud["samples"]) == [1, -2, 3]
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG")


def test_ppm_codec_golden_and_errors():
    """Decode a handcrafted spec-shaped header (comments + odd
    whitespace) and reject truncated/unsupported files."""
    import numpy as np

    blob = b"P6 # comment\n# another\n 2\t1 \n255\n" + bytes([1, 2, 3, 4, 5, 6])
    px = multimodal.decode_ppm(blob)
    assert px.shape == (1, 2, 3)
    assert px.tolist() == [[[1, 2, 3], [4, 5, 6]]]
    rt = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(rt)) == rt).all()
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        multimodal.decode_ppm(b"P6\n2 2\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        multimodal.decode_ppm(b"P6\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="not a P6"):
        multimodal.decode_ppm(b"P3\n1 1\n255\n0 0 0")


def test_wav_codec_golden_and_errors():
    """Chunk-walking decode: an extra chunk before data is skipped per
    the RIFF spec; truncation and non-PCM16 formats are rejected."""
    import struct

    import numpy as np

    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    blob = multimodal.encode_wav(samples, 16000)
    rate, got = multimodal.decode_wav(blob)
    assert rate == 16000 and (got == samples).all()
    # splice an unknown (odd-sized, so word-padded) chunk before data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate2, got2 = multimodal.decode_wav(spliced)
    assert rate2 == 16000 and (got2 == samples).all()
    with pytest.raises(ValueError, match="truncated WAV"):
        multimodal.decode_wav(blob[:-2])
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(stereo_fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt)
    with pytest.raises(ValueError, match="PCM16 mono"):
        multimodal.decode_wav(bad)
    with pytest.raises(ValueError, match="not a RIFF"):
        multimodal.decode_wav(b"OggS")


def test_byte_features_golden(spark, specs):
    """Pin the mapInPandas feature extraction against a pure-Python
    computation of the same features for one known doc."""
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    blob = doc["text"].encode("utf-8")
    counts: dict[int, int] = {}
    for byte in blob:
        counts[byte] = counts.get(byte, 0) + 1
    expected_entropy = -sum(
        (c / len(blob)) * math.log2(c / len(blob)) for c in counts.values()
    )
    row = (
        specs["mm_byte_features"].fn(spark, SF)
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    assert row["n_bytes"] == len(blob)
    assert row["max_byte"] == max(blob)
    assert row["n_distinct_bytes"] == len(counts)
    assert abs(row["mean_byte"] - sum(blob) / len(blob)) < 1e-12
    # entropy is rounded to 6 dp in the operator since r9 (oracle
    # promotion: DuckDB's entropy() differs in the last ulp)
    assert abs(row["entropy_bits"] - expected_entropy) < 5e-7


def test_audio_windows_golden(spark, specs):
    """Pin the overlapping-window DSP features against a pure-Python
    computation for one known doc."""
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    samples = [b - 128.0 for b in doc["text"].encode("utf-8")]
    win, hop = 256, 128
    n_windows = max(1, (len(samples) - win) // hop + 1)
    rows = (
        specs["mm_audio_windows"].fn(spark, SF)
        .filter(F.col("doc_id") == 0)
        .orderBy("window_idx")
        .collect()
    )
    assert [r["window_idx"] for r in rows] == list(range(n_windows))
    seg = samples[:win]
    expected_rms = math.sqrt(sum(x * x for x in seg) / len(seg))
    assert abs(rows[0]["rms"] - expected_rms) < 1e-9
    assert rows[0]["peak"] == int(max(abs(x) for x in seg))


def test_frame_sample_fanout(spark, specs):
    out = specs["mm_frame_sample"].fn(spark, SF)
    one = out.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    blob = doc["text"].encode("utf-8")
    n_frames = math.ceil(len(blob) / 64)
    assert [r["frame_idx"] for r in one] == list(range(0, n_frames, 4))
    assert bytes.fromhex(one[0]["frame_hex"]) == blob[:64]


def test_resize_thumbnail_golden(spark, specs):
    """mm_resize must equal an independent numpy block-average of the
    blob's square crop, with fixed 8x8 output for every doc."""
    import numpy as np

    out = {r["doc_id"]: r for r in specs["mm_resize"].fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(out) == len(docs)
    for doc in docs[:20]:
        b = np.frombuffer(doc["text"].encode("utf-8"), dtype=np.uint8)
        side = int(np.sqrt(b.size))
        got = out[doc["doc_id"]]
        assert got["src_side"] == side
        assert len(got["thumb_hex"]) == 2 * 64
        img = b[: side * side].reshape(side, side).astype(float)
        if side < 8:
            pad = np.zeros((8, 8))
            pad[:side, :side] = img
            img, side = pad, 8
        # reference: mean over each target cell's source block
        thumb = np.zeros((8, 8), dtype=np.uint8)
        idx = (np.arange(side) * 8) // side
        for ti in range(8):
            for tj in range(8):
                block = img[idx == ti][:, idx == tj]
                thumb[ti, tj] = int(np.floor(block.mean()))
        assert bytes.fromhex(got["thumb_hex"]) == thumb.tobytes()


def test_image_phash_dedup_invariants(spark, specs):
    """mm_image_phash_dedup: byte-identical texts must pair at hamming 0
    (the image twin of exact dedup); every emitted pair's hamming must
    equal a direct numpy recomputation from the thumbnails; pairs are
    ordered doc_a < doc_b."""
    import numpy as np

    thumbs = {
        r["doc_id"]: bytes.fromhex(r["thumb_hex"])
        for r in specs["mm_resize"].fn(spark, SF).collect()
    }

    def phash(tb):
        px = np.frombuffer(tb, dtype=np.uint8).astype(float)
        return tuple(px > px.sum() / 64.0)

    pairs = specs["mm_image_phash_dedup"].fn(spark, SF).collect()
    assert pairs, "fixture must contain visual near-dups"
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        expect = sum(
            x != y for x, y in zip(phash(thumbs[r["doc_a"]]), phash(thumbs[r["doc_b"]]))
        )
        assert r["hamming"] == expect <= 3
    # COMPLETENESS: the pigeonhole banding guarantees recall 1 at
    # hamming <= 3, so the emitted set must equal the brute-force
    # all-pairs answer over the same hashes
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    hashes = {doc: phash(tb) for doc, tb in thumbs.items()}
    ids = sorted(hashes)
    expect_pairs = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if sum(x != y for x, y in zip(hashes[a], hashes[b])) <= 3
    }
    assert got == expect_pairs


def test_split_assignment_invariants(spark, specs):
    """Hash-bucket split: total coverage, disjointness, stability under
    re-evaluation, and growth-stability (membership is a pure function
    of doc_id, so a subset of the corpus gets identical labels)."""
    full = specs["split_train_test"].fn(spark, SF).collect()
    n_docs = specs["dedup_exact_docs"].fn(spark, SF).count()  # ≥ distinct ids
    labels = {r.doc_id: r.split for r in full}
    assert set(labels.values()) <= {"train", "test"}
    assert 0 < sum(1 for v in labels.values() if v == "test") < len(labels)
    again = {r.doc_id: r.split for r in specs["split_train_test"].fn(spark, SF).collect()}
    assert labels == again
    assert n_docs <= len(labels)


def test_sample_is_subset_and_deterministic(spark, specs):
    s1 = {r.doc_id for r in specs["sample_hash"].fn(spark, SF).collect()}
    s2 = {r.doc_id for r in specs["sample_hash"].fn(spark, SF).collect()}
    assert s1 == s2
    labels = {
        r.doc_id: r.split
        for r in specs["split_train_test"].fn(spark, SF).collect()
    }
    assert s1 <= set(labels)


def test_keep_latest_one_row_per_user(spark, specs):
    df = specs["dedup_keep_latest"].fn(spark, SF)
    rows = df.collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    assert len(rows) > 0


def test_star_contraction_matches_label_propagation(spark, specs):
    """Star contraction and min-label propagation must produce identical
    (doc_id -> component-min) labels on the fixture near-dup graph."""
    star = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in specs["dedup_cluster_star"].fn(spark, SF).collect()
    }
    prop = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in specs["dedup_cluster"].fn(spark, SF).collect()
    }
    assert star == prop


def test_star_contraction_synthetic_graphs(spark):
    """Chains (worst case for label propagation), cliques, crossing edges
    and isolated pairs — every node labeled with its true component min,
    and the deep chain must converge within the O(log d) round budget
    that is the algorithm's reason to exist (64-node chain, diameter 63,
    max_rounds=10 < 63 proves contraction, not propagation, converged)."""
    from hivekudu_handler_spark.pipeline.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(100, 163)]          # one 64-node chain
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    bridge = [(162, 200)]                                   # join chain+clique
    pair = [(300, 301)]
    edges = spark.createDataFrame(
        chain + clique + bridge + pair, "u long, v long"
    )
    got = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in connected_components_star(edges, max_rounds=10).collect()
    }
    expected = {(i, 100) for i in range(100, 164)}   # chain nodes 100..163
    expected |= {(i, 100) for i in range(200, 205)}  # clique, bridged via 162
    expected |= {(300, 300), (301, 300)}             # isolated pair
    assert got == expected


def test_star_contraction_random_graphs_vs_union_find(spark):
    """Property test: on random graphs, star-contraction labels equal an
    independent driver-side union-find ground truth (not Spark, not the
    oracle — a third implementation)."""
    from hypothesis import given, settings, strategies as st

    from hivekudu_handler_spark.pipeline.dedup import connected_components_star

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        return {n: find(n) for n in parent}

    edge = st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1])

    @settings(max_examples=8, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=40))
    def check(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            (r["doc_id"], r["keeper_doc_id"])
            for r in connected_components_star(df, max_rounds=8).collect()
        }
        assert got == set(union_find_labels(edges).items())

    check()


def test_two_phase_topk_lossless_truncation_property(spark):
    """Property test: the two-phase top-k (partition-local fold, then
    global rank over candidates) returns exactly the single-phase window
    rank over the full scored set — including when zero-norm vectors make
    some cosines NaN (the r3 ADVICE hazard: both phases must drop them)."""
    from hypothesis import given, settings, strategies as st

    from hivekudu_handler_spark.pipeline.similarity import (
        _local_topk,
        _rank_topk,
        _score_pairs,
    )

    component = st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
    )
    vector = st.lists(component, min_size=3, max_size=3)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(vector, min_size=4, max_size=12))
    def check(vecs):
        # Always plant a zero-norm vector so the NaN-cosine path is live.
        rows = [(i, v) for i, v in enumerate(vecs + [[0.0, 0.0, 0.0]])]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        queries = df.filter(F.col("vec_id") < 2)
        scored = _score_pairs(df.repartition(5), queries)
        k = 3
        two_phase = _rank_topk(_local_topk(scored, k), k)
        single_phase = _rank_topk(
            scored.filter(F.col("cos_raw").isNotNull() & ~F.isnan("cos_raw")), k
        )
        assert sorted(map(tuple, two_phase.collect())) == sorted(
            map(tuple, single_phase.collect())
        )

    check()


def test_cluster_pairs_deep_graph_cutover(spark):
    """A 48-node chain with a 4-round propagation budget cannot converge
    by propagation (diameter 47); cluster_pairs must detect the exhausted
    budget and fall back to star contraction, still returning EXACT
    component minima — an un-guarded loop would return unconverged
    (wrong) keepers here."""
    from hivekudu_handler_spark.pipeline.dedup import cluster_pairs

    chain = [(i, i + 1) for i in range(100, 147)]  # 48 nodes, diameter 47
    pair = [(900, 901)]                            # separate 2-clique
    pairs = spark.createDataFrame(chain + pair, "doc_a long, doc_b long")
    got = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in cluster_pairs(pairs, prop_round_budget=4).collect()
    }
    expected = {(i, 100) for i in range(100, 148)} | {(900, 900), (901, 900)}
    assert got == expected


def test_cluster_pairs_self_pair_survives_fallback(spark):
    """A node whose ONLY pair is a self-pair (doc_a == doc_b) must appear
    as (id, id) in the output on BOTH paths — the propagation path always
    kept it, and the star-contraction fallback must not drop it when it
    filters to one edge orientation."""
    from hivekudu_handler_spark.pipeline.dedup import cluster_pairs

    chain = [(i, i + 1) for i in range(100, 147)]  # forces the fallback
    lone = [(7, 7)]                                # self-pair-only node
    pairs = spark.createDataFrame(chain + lone, "doc_a long, doc_b long")
    # budget 4 < diameter 47: fallback path
    fb = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in cluster_pairs(pairs, prop_round_budget=4).collect()
    }
    # budget 60 > diameter: propagation path
    prop = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in cluster_pairs(pairs, prop_round_budget=60).collect()
    }
    assert (7, 7) in fb and (7, 7) in prop
    assert fb == prop


def test_wav_short_fmt_chunk_rejected():
    """A fmt chunk shorter than the 16-byte PCM header must fail through
    the documented ValueError, not a struct.error."""
    import struct

    short_fmt = struct.pack("<HH", 1, 1)  # 4 bytes, not 16
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(short_fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        multimodal.decode_wav(bad)


def test_cluster_pairs_shallow_graph_stays_on_propagation(spark):
    """Inside the budget, propagation converges and labels are exact."""
    from hivekudu_handler_spark.pipeline.dedup import cluster_pairs

    tri = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(tri, "doc_a long, doc_b long")
    got = {
        (r["doc_id"], r["keeper_doc_id"])
        for r in cluster_pairs(pairs, prop_round_budget=10).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_kmeans_lloyd_invariants(spark, specs):
    """Lloyd's guarantees on the fixture: inertia never increases across
    iterations, every vector lands in exactly one cluster, and the
    reported profile covers the corpus."""
    from hivekudu_handler_spark.pipeline.clustering import kmeans_fit, _assign
    from hivekudu_handler_spark.pipeline.similarity import _as_double
    from hivekudu_handler_spark.tables import load_table

    e = _as_double(load_table(spark, SF, "embeddings"))
    n = e.count()
    cents, inertia = kmeans_fit(e, k=4, iters=3)
    assert len(inertia) == 3
    for prev, nxt in zip(inertia, inertia[1:]):
        assert nxt <= prev * (1 + 1e-9), inertia
    assert len(cents) == 4
    sizes = (
        _assign(e, cents).groupBy("cent_id").count().collect()
    )
    assert sum(r["count"] for r in sizes) == n
    # the registered profile agrees with a direct assignment
    prof = specs["emb_kmeans_lloyd"].fn(spark, SF).collect()
    assert sum(r["n_members"] for r in prof) == n
    assert all(r["mean_sqdist"] >= 0 for r in prof)


def test_tfidf_top_terms_are_positive_and_ranked(spark, specs):
    """Every emitted term has positive tf-idf (a term in ALL docs scores
    ln(1)=0 and cannot be a top term unless nothing beats it), and ranks
    are dense 1..3 per doc."""
    rows = specs["text_tfidf"].fn(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rnk"])
    for doc, rnks in by_doc.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (doc, rnks)
    assert all(r["tfidf"] >= 0 for r in rows)


def test_containment_detects_doc_in_doc(spark, tmp_path):
    """A short document quoted verbatim inside a long one scores
    containment 1.0 (every trigram of the quote appears in the host)
    while its Jaccard stays far below the 0.5 dedup threshold — the
    asymmetric case ``dedup_containment`` exists to catch.  The
    ``contained_doc`` column must name the smaller-set side."""
    quote = "quick brown fox jumps over the lazy dog tonight"
    host = (
        "the long host document begins with plenty of framing words "
        f"then quotes {quote} and continues afterwards with many more "
        "entirely unrelated closing words to dilute the jaccard score "
        "further and further until the symmetric metric gives up"
    )
    spark.createDataFrame(
        [(1, host, "en", "t", len(host)), (2, quote, "en", "t", len(quote))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    cont = {
        (r["doc_a"], r["doc_b"]): (r["contained_doc"], r["containment"])
        for r in dedup.dedup_containment(spark, sf).collect()
    }
    assert (1, 2) in cont
    contained, score = cont[(1, 2)]
    assert contained == 2  # the quote is the contained side
    assert score == 1.0
    # the symmetric metric misses the same pair at its dedup threshold
    assert (1, 2) not in _pairs(dedup.ngram_jaccard_pairs(spark, sf, 0.5))


def test_range_search_consistent_with_topk(spark, specs):
    """Range search (cosine ≥ τ) agrees with the exact top-k ranking:
    every top-k neighbor at or above the radius appears in the range
    result with the identical rounded cosine, and nothing below the
    radius leaks in."""
    tau = similarity._RANGE_TAU
    rng = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in specs["sim_range_search"].fn(spark, SF).collect()
    }
    assert all(c >= tau - 1e-9 for c in rng.values())
    topk = specs["sim_topk_cosine"].fn(spark, SF).collect()
    for r in topk:
        if r["cosine"] >= tau:
            assert rng.get((r["query_id"], r["neighbor_id"])) == r["cosine"]
