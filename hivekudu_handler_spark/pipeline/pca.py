"""Distributed PCA projection over the ``embeddings`` table.

Dimensionality reduction is the standard precursor to clustering /
visualization / cheap ANN over embedding corpora.  The classic
two-pass scalable PCA (the public Spark MLlib RowMatrix approach —
computePrincipalComponents builds the Gramian the same way):

1. **moment pass** — each Arrow batch folds to (n, Σx, Σxxᵀ) with one
   BLAS ``einsum``; partials are one tiny row per batch (d + d² doubles,
   d=64 → 33 KB), collected and combined driver-side in deterministic
   partition order.  The corpus itself never shuffles and never leaves
   executors.
2. driver: covariance from the moments, ``numpy.linalg.eigh`` on the
   d×d matrix (microseconds at d=64; d≤4096 stays trivial), top-k
   eigenvectors sign-fixed (largest-|component| coordinate made
   positive) so the output is unique despite eigenvector sign freedom.
3. **projection pass** — the k×d matrix broadcasts; a second
   Arrow-batched map multiplies each batch once.  Scan-shaped: no
   shuffle at any point, O(d²) driver state.

Rows-only key — the ONE pipeline stage the r10 replay-oracle mechanism
(pipeline/replay.py) cannot reach: the moment pass replays in SQL
trivially, but the eigensolver does not.  An unrolled subspace
iteration (the only SQL-expressible eigensolver shape) converges per
component at rate |λ_{k+1}/λ_k|^n, and the fixture spectrum is
near-flat — measured λ₉/λ₈ = 0.9863 at sf0.01 — so matching LAPACK
``eigh`` to the digest's 6-dp margin would need ~10³ unrolled
iterations per component with no guarantee at the near-degenerate
pairs.  The pytest suite pins the math instead — orthonormal
components, eigenvalue ordering, and subspace agreement with a
single-node numpy PCA of the same data (projector-matrix comparison,
which is invariant to the sign/rotation freedom a raw vector compare
would trip over).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

N_COMPONENTS = 8


def _moments(df: DataFrame, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, Σx, Σxxᵀ) over the embedding column — one pass, no shuffle."""

    out_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n, s, ss = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += np.einsum("ij,ik->jk", x, x)
        if n:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = df.select("embedding").mapInPandas(fold, out_schema).collect()
    # deterministic combine order: float summation is order-sensitive
    parts.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in parts], axis=0)
    return n, s, ss


def fit_pca(df: DataFrame, dim: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(components k×d sign-fixed eigenvalue-descending, mean d) — one
    moment pass total."""
    n, s, ss = _moments(df, dim)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # k×d, descending eigenvalue
    # sign convention: the largest-|component| coordinate is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mu


def pca_project_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-8 principal
    components (centered), returning the raw ``proj`` array column.
    Internal/test surface — the registered query wraps this with a
    digest projection the driver verifier can hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    comps, mu = fit_pca(emb, dim, N_COMPONENTS)
    bc = spark.sparkContext.broadcast((comps, mu))

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("proj", T.ArrayType(T.DoubleType())),
        ]
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, m = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64) - m
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "proj": list((x @ p.T)),
                }
            )

    # no orderBy: the projection is scan-shaped (zero exchanges,
    # plan-pinned in tests/test_plans.py) — a global sort here would
    # range-shuffle the whole corpus for cosmetic row order that the
    # driver verifier (sorts before hashing) and every test (keys rows
    # by vec_id) ignore.  r10; previously paid a full sort.
    return emb.select("vec_id", "label", "embedding").mapInPandas(
        project, out_schema
    )


@query("emb_pca_project", tags=("embedding",))
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-8 principal
    components (centered).  Rows-only: eigendecomposition is not
    SQL-expressible; the pytest suite pins the math (see module doc).

    The projection array leaves as ``md5`` of its rounded comma-joined
    form plus a numeric checksum — the driver verifier cannot hash
    list cells (same lesson as ``emb_quantize_int8``; r6's one red row
    was this key emitting a raw ``array<double>``).  Rounding to 6
    decimals absorbs the float-summation jitter that partition-order
    differences could otherwise introduce into the digest."""
    from pyspark.sql import functions as F

    proj = pca_project_vectors(spark, sf_dir)
    rounded = F.transform(
        "proj", lambda x: F.format_string("%.6f", x)
    )
    return proj.select(
        "vec_id",
        "label",
        F.md5(F.array_join(rounded, ",")).alias("proj_md5"),
        F.round(
            F.aggregate("proj", F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("proj_abs_sum"),
    )
