"""r16 surface: measured star-contraction scaling (the r15 verdict's
one unmeasured scale claim) — the SCALE.md contraction table's pinning
test, run at reduced scales so the suite stays fast; the 1×/8×/64×
numbers in SCALE.md come from the same `cluster_scale_smoke` entry
point at 10k/80k/640k."""

from __future__ import annotations

import math

from hivekudu_handler_spark.pipeline.dedup import cluster_scale_smoke


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
