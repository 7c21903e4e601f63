"""r15 surface: measured IVF probe selectivity (r11–r14 verdict item)
plus the exact-bounds promotion invariants for the formerly rows-only
keys live in their home test files (test_aggregates / test_pca /
test_new_surface_r7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline.similarity import (
    _IVF_CENTROIDS,
    _N_QUERIES,
    _as_double,
    _ivf_assign,
    _norm,
    _nonzero,
    ivf_probe_selectivity,
)
from hivekudu_handler_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_ivf_probe_selectivity_bounds_bytes(spark):
    """The measured table behind SCALE.md's 'IVF cost ∝ nprobe/k'
    claim: probed pairs/bytes are monotone in nprobe, a strict subset
    of brute force below nprobe = k, exactly brute force at
    nprobe = k, and the driver-side arithmetic agrees with the REAL
    probe equi-join the production plan executes."""
    stats = ivf_probe_selectivity(spark, SF, nprobes=(1, 2, 4, 8))
    by_np = {s["nprobe"]: s for s in stats}

    # monotone in nprobe, full corpus exactly at nprobe = k
    probed = [by_np[n]["probed_pairs"] for n in (1, 2, 4, 8)]
    assert probed == sorted(probed)
    assert by_np[8]["selectivity"] == 1.0
    assert by_np[8]["probed_pairs"] == by_np[8]["total_pairs"]

    # real pruning below k: nprobe=2 (the production default) must
    # admit strictly less than brute force, and nprobe=1 less than 2
    assert 0 < by_np[1]["probed_pairs"] < by_np[2]["probed_pairs"]
    assert by_np[2]["selectivity"] < 1.0

    # bytes follow pairs: PQ codes are 8 B/row vs 4·64 B/row float32
    s2 = by_np[2]
    assert s2["probed_pq_mb"] < s2["probed_f32_mb"]
    assert abs(s2["probed_f32_mb"] / s2["brute_f32_mb"] - s2["selectivity"]) < 1e-9

    # cross-check vs the REAL join: rebuild the probe equi-join as
    # _ivf_topk plans it (pre self-pair filter) and count
    e = _nonzero(_as_double(load_table(spark, SF, "embeddings")))
    cents = e.filter(F.col("vec_id") < _IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    from pyspark.sql import Window
    from hivekudu_handler_spark.pipeline.similarity import _dot

    w = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col("cent_id")
    )
    probes = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cent_sim",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 2)
        .select("query_id", "cent_id")
    )
    real = _ivf_assign(e, cents).join(F.broadcast(probes), "cent_id").count()
    assert real == s2["probed_pairs"], (real, s2["probed_pairs"])


def test_keep_priority_prefers_low_tier_source(spark, tmp_path):
    """On a corpus where every doc gains an exact twin in a WORSE tier
    and one doc gains a twin in a BETTER tier, the keeper must always
    come from the lowest tier (ties to smallest doc_id) — the fixture
    itself has no cross-source dups, so this synthesizes them."""
    import os

    from hivekudu_handler_spark.registry import load_all

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    worse = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "source", F.lit("src999")
    )
    # doc 1 (source src1, tier 1) also gets a BETTER-tier twin (src0)
    # with a LARGER doc_id: priority must beat doc_id order
    better = (
        docs.filter(F.col("doc_id") == 1)
        .withColumn("doc_id", F.lit(2_000_000).cast("bigint"))
        .withColumn("source", F.lit("src0"))
    )
    # and an UNPARSEABLE source tier: must demote to the sentinel worst
    # tier on both engines (NULL would sort first in Spark, last in
    # DuckDB — the divergence class the coalesce pins away)
    unparseable = docs.withColumn(
        "doc_id", F.col("doc_id") + 3_000_000
    ).withColumn("source", F.lit("web"))
    out = str(tmp_path)
    docs.unionByName(worse).unionByName(better).unionByName(
        unparseable
    ).write.parquet(os.path.join(out, "documents.parquet"))
    res = {
        r["keeper_doc_id"]: r
        for r in load_all()["dedup_keep_priority"].fn(spark, out).collect()
    }
    # no keeper ever comes from the worse or unparseable tiers
    assert all(r["keeper_source"] not in ("src999", "web") for r in res.values())
    # every group is now at least a triple (worse + unparseable twins)
    assert all(r["n_copies"] >= 3 for r in res.values())
    # doc 1's group: the src0 twin (tier 0) wins despite doc_id 2,000,000
    zero_groups = [r for r in res.values() if r["keeper_doc_id"] == 2_000_000]
    assert len(zero_groups) == 1 and zero_groups[0]["keeper_source"] == "src0"
    assert zero_groups[0]["n_copies"] == 4  # original + worse + web + src0 twins


def test_ivf_kmeans_selectivity_tracks_nprobe_over_k(spark):
    """The production (Lloyd-fitted) quantizer must keep cells balanced
    enough that probe selectivity tracks the ideal nprobe/k within
    ±20% at every nprobe — the SCALE.md claim that nprobe is a linear
    cost dial rests on this."""
    stats = ivf_probe_selectivity(
        spark, SF, nprobes=(1, 2, 4, 8), kmeans=True
    )
    for s in stats:
        ideal = s["nprobe"] / s["n_centroids"]
        assert 0.8 * ideal <= s["selectivity"] <= 1.2 * ideal, s
    assert stats[-1]["selectivity"] == 1.0
