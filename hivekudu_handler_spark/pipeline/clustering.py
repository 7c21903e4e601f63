"""Distributed Lloyd k-means over the embeddings table (SURVEY.md §7 M4,
north-star — prov N): the canonical *iterative* Spark algorithm, here for
corpus clustering / IVF centroid fitting (pipeline/similarity.py seeds its
IVF cells with raw vectors; this operator is the real fit those cells
would use at scale).

Scale design — the loop is driver-orchestrated but the DATA never leaves
the cluster:

* assignment: centroids fold into ONE broadcast row and the argmin is a
  pure array expression over it (shared with ``sim_ivf``'s
  ``_ivf_assign``), so the corpus is scanned, never shuffled.
* update: dim-wise means via posexplode + one (cent_id, dim) hash
  aggregate — map-side partial means, k×d rows cross the network per
  iteration regardless of corpus size.
* the k×d centroid table is collected driver-side between iterations —
  the same bounded-state choice Spark MLlib's own KMeans makes (centroids
  are model state, not data) — then re-broadcast.  Each iteration is one
  scan + one k×d-row aggregate: T iterations = T passes, no lineage
  growth (the loop rebuilds centroid literals, not a growing plan).

No SQL oracle: k-means is iterative and not expressible as one DuckDB
query (driver rows-only check); tests/test_pipeline.py asserts the Lloyd
invariants — inertia is monotonically non-increasing across iterations,
every vector is assigned, and cluster sizes sum to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table
from hivekudu_handler_spark.pipeline.similarity import _as_double

_K = 8
_ITERS = 3


def _sqdist(v, c):
    """Squared euclidean distance between two equal-length arrays."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(e: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, v, cent_id, sqd): nearest centroid by squared distance,
    ties to the smallest centroid id.  Centroids enter the plan as array
    literals (they are model state, k×d doubles), so the corpus is a pure
    scan — no join, no shuffle, whole-stage codegen throughout."""
    carr = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cent_id"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
            )
            for cid, cv in cents
        ]
    )
    # array_min over struct(sqd, cent_id) = (sqd ASC, cent_id ASC) argmin
    best = F.array_min(
        F.transform(
            carr,
            lambda c: F.struct(
                _sqdist(F.col("v"), c["cv"]).alias("sqd"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    return e.withColumn("b", best).select(
        "vec_id",
        "v",
        F.col("b.cent_id").alias("cent_id"),
        F.col("b.sqd").alias("sqd"),
    )


def kmeans_fit(
    e: DataFrame, k: int = _K, iters: int = _ITERS
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Lloyd iterations; returns (final centroids, per-iteration inertia).

    Init is deterministic: the k lowest-vec_id vectors (the same seed rule
    as ``sim_ivf``), so the whole fit is reproducible without RNG.
    """
    seed = (
        e.orderBy("vec_id").limit(k).collect()
    )  # k rows of model state, not data
    cents = [(i, list(r["v"])) for i, r in enumerate(seed)]
    inertia: list[float] = []
    for _ in range(iters):
        assigned = _assign(e, cents)
        # one pass computes BOTH the inertia of the current centroids and
        # the dim-wise sums for the next ones
        stats = (
            assigned.select(
                "cent_id", "sqd", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cent_id", "dim")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
                # sqd repeats per exploded dim; sum over dim==0 rows only
                F.sum(F.when(F.col("dim") == 0, F.col("sqd"))).alias("sqd0"),
            )
            .collect()
        )
        inertia.append(sum(r["sqd0"] or 0.0 for r in stats if r["dim"] == 0))
        by_cent: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cent.setdefault(r["cent_id"], {})[r["dim"]] = r["s"] / r["n"]
        # empty clusters keep their previous centroid (standard Lloyd fix)
        cents = [
            (
                cid,
                [by_cent[cid][d] for d in sorted(by_cent[cid])]
                if cid in by_cent
                else cv,
            )
            for cid, cv in cents
        ]
    return cents, inertia


@query("emb_kmeans_lloyd", tags=("embedding", "vector", "slow"))
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means (k=8, 3 Lloyd iterations) over the embeddings: returns the
    final cluster profile (cent_id, n_members, mean squared distance), one
    row per non-empty cluster.  Deterministic init (lowest vec_ids);
    rows-only driver check — the Lloyd invariants live in pytest."""
    e = _as_double(load_table(spark, sf_dir, "embeddings"))
    cents, _ = kmeans_fit(e)
    final = _assign(e, cents)
    return (
        final.groupBy("cent_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("sqd"), 4).alias("mean_sqdist"),
        )
        .orderBy("cent_id")
    )
