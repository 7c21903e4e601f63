"""r16 surface: measured star-contraction scaling (the r15 verdict's
one unmeasured scale claim) — the SCALE.md contraction table's pinning
test, run at reduced scales so the suite stays fast; the 1×/8×/64×
numbers in SCALE.md come from the same `cluster_scale_smoke` entry
point at 10k/80k/640k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline.dedup import cluster_scale_smoke


def test_winnowing_guarantee_and_density(spark):
    """The Schleimer et al. guarantee: two documents sharing a substring
    of length >= K+W-1 (= 11 normalized chars here) share at least one
    selected fingerprint (same hash) — while fingerprint density stays
    near the expected 2/(W+1), far below one-per-position.  Also: a doc
    shorter than K chars emits nothing, and winnowing is content-only
    (two docs with identical text select identical (pos, hash) sets)."""
    from hivekudu_handler_spark.pipeline.text import (
        _WINNOW_K,
        _WINNOW_W,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"PREFIX ALPHA {shared} SUFFIX ONE"),
            (2, f"zz 9 totally different opener {shared} closing words"),
            (3, "no overlap here at all just other content entirely"),
            (4, "tiny"),  # < K normalized chars -> no fingerprints
            (5, f"PREFIX ALPHA {shared} SUFFIX ONE"),  # identical to 1
        ],
        "doc_id int, text string",
    )
    fp = winnow_fingerprints(docs).collect()
    by_doc: dict[int, set] = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    hashes = {d: {h for _, h in s} for d, s in by_doc.items()}
    assert len(shared) >= _WINNOW_K + _WINNOW_W - 1
    assert hashes[1] & hashes[2], "shared substring must share a fingerprint"
    assert not (hashes[1] & hashes.get(3, set()))
    assert 4 not in by_doc
    assert by_doc[1] == by_doc[5], "winnowing must be content-deterministic"
    # density: selected fingerprints per position ~ 2/(W+1), bounded
    # well under 1 (the whole point vs hashing every gram)
    n_pos = len("prefix alpha " + shared + " suffix one") - _WINNOW_K + 1
    assert len(by_doc[1]) <= 0.6 * n_pos
    assert len(by_doc[1]) >= 2


def test_winnow_dedup_recovers_jaccard_pairs(spark):
    """dedup_winnow at tau=0.5 recovers EXACTLY the sf0.01 fixture's 25
    token-shingle Jaccard>=0.5 near-dup pairs (dedup_ngram_jaccard's
    set) from the winnowed ~2/(W+1) position sample — the guarantee in
    action: sampling positions loses no >= K+W-1-char overlap.  (The
    exact set equality is a property of THIS corpus's sharp dup/non-dup
    separation; at sf0.1 the containment-sensitive overlap coefficient
    legitimately flags far more pairs than symmetric Jaccard — see the
    measured table in SCALE.md.)"""
    from hivekudu_handler_spark.pipeline.dedup import (
        dedup_winnow,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.01"
    w = {(r.doc_a, r.doc_b) for r in dedup_winnow(spark, sf).collect()}
    j = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf, 0.5).collect()}
    assert w == j and len(w) == 25


def test_winnow_density_is_scale_invariant(spark):
    """Selected-fingerprint density (selected rows / k-gram positions)
    is content-determined at ~2/(W+1) = 0.4 and must not drift with
    corpus size — the property that makes winnow index cost a fixed
    fraction of corpus bytes at any scale (SCALE.md measured 0.40 at
    both sf0.01 and sf0.1; this pins the band at two SFs)."""
    from hivekudu_handler_spark.pipeline.text import (
        _WINNOW_K,
        normalized,
        winnow_fingerprints,
    )
    from hivekudu_handler_spark.tables import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf, "documents")
        positions = (
            docs.select(
                F.greatest(
                    F.length(normalized()) - _WINNOW_K + 1, F.lit(0)
                ).alias("p")
            )
            .agg(F.sum("p"))
            .collect()[0][0]
        )
        selected = winnow_fingerprints(docs).count()
        density = selected / positions
        assert 0.33 <= density <= 0.47, (sf, density)


def test_incremental_winnow_is_the_batch_slice_of_full(spark):
    """The incremental regime must emit exactly the full-corpus pairs
    that involve at least one batch doc (same tau, same cap), with the
    batch doc always on the left — no pair invented, none lost, and the
    corpus-x-corpus remainder is exactly the set the steady state never
    recomputes."""
    from hivekudu_handler_spark.pipeline.dedup import (
        _BATCH_SOURCES,
        dedup_incremental_winnow,
        dedup_winnow,
    )
    from hivekudu_handler_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    batch = {
        r.doc_id
        for r in load_table(spark, sf, "documents")
        .filter(F.col("source").isin(*_BATCH_SOURCES))
        .select("doc_id")
        .collect()
    }
    inc = [(r.batch_doc, r.other_doc) for r in
           dedup_incremental_winnow(spark, sf).collect()]
    assert inc and all(a in batch for a, _ in inc)
    inc_sorted = {tuple(sorted(p)) for p in inc}
    full = {(r.doc_a, r.doc_b) for r in dedup_winnow(spark, sf).collect()}
    expect = {p for p in full if p[0] in batch or p[1] in batch}
    assert inc_sorted == expect


def test_star_contraction_rounds_grow_logarithmically_on_paths(spark):
    """On a path graph (diameter = n, the shape where min-label
    propagation needs n rounds), contraction rounds must grow like
    log n: +log2(8) ± slack per 8× scale-up, and stay under a 2·log2 n
    ceiling — while per-round edge volume never exceeds the input edge
    count (total work O(E·log d), no shuffle amplification)."""
    small = cluster_scale_smoke(spark, 1_000, "path")
    big = cluster_scale_smoke(spark, 8_000, "path")
    assert small["wrong_labels"] == 0 and big["wrong_labels"] == 0
    growth = big["rounds"] - small["rounds"]
    assert 1 <= growth <= 5, (small["rounds"], big["rounds"])
    for r in (small, big):
        assert r["rounds"] <= 2 * math.log2(r["n_nodes"]), r
        assert r["max_round_edges"] <= r["init_edges"], r


def test_star_contraction_constant_rounds_on_cliques(spark):
    """On the shape real near-dup graphs take (many small cliques),
    rounds are CONSTANT in corpus size and the edge set contracts in
    round one (clique → star), so cost is one-ish pass over the pair
    list at any scale."""
    small = cluster_scale_smoke(spark, 1_000, "cliques")
    big = cluster_scale_smoke(spark, 8_000, "cliques")
    assert small["wrong_labels"] == 0 and big["wrong_labels"] == 0
    assert small["rounds"] == big["rounds"] <= 3, (small, big)
    # clique → star contraction: the surviving edge set is the n/5 stars
    # (4 edges each), strictly smaller than the 10-per-clique input
    for r in (small, big):
        assert r["max_round_edges"] < r["init_edges"], r
