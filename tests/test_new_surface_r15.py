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
