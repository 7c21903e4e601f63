"""Distributed PCA: math invariants + single-node numpy agreement."""

from __future__ import annotations

import numpy as np

from hivekudu_handler_spark.pipeline.pca import (
    N_COMPONENTS,
    emb_pca_project,
    fit_pca,
    pca_project_vectors,
)
from hivekudu_handler_spark.tables import load_table


def _corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return emb, np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_components_orthonormal_and_subspace_matches_numpy(spark, sf_dir):
    emb, x = _corpus(spark, sf_dir)
    comps, mu = fit_pca(emb, x.shape[1], N_COMPONENTS)
    assert comps.shape == (N_COMPONENTS, x.shape[1])
    np.testing.assert_allclose(comps @ comps.T, np.eye(N_COMPONENTS), atol=1e-8)
    np.testing.assert_allclose(mu, x.mean(axis=0), rtol=1e-9)
    # numpy reference PCA on the same data
    xc = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    ref = vt[:N_COMPONENTS]
    # compare PROJECTORS: invariant to per-vector sign / rotation within
    # degenerate eigenvalue blocks
    np.testing.assert_allclose(
        comps.T @ comps, ref.T @ ref, atol=1e-6
    )


def test_projection_variance_descends_and_rows_preserved(spark, sf_dir):
    emb, x = _corpus(spark, sf_dir)
    out = pca_project_vectors(spark, sf_dir).collect()
    assert len(out) == len(x)
    proj = np.array([r["proj"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert proj.shape == (len(x), N_COMPONENTS)
    var = proj.var(axis=0, ddof=1)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    # component projections are uncorrelated (diagonal covariance)
    cov = np.cov(proj.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6 * cov.diagonal().max()
    # projection really is the centered matmul against the fitted basis
    comps, mu = fit_pca(emb, x.shape[1], N_COMPONENTS)
    np.testing.assert_allclose(proj, (x - mu) @ comps.T, atol=1e-8)


def test_registered_query_emits_hashable_digest(spark, sf_dir):
    # the driver verifier cannot canonicalize array cells (r6's one red
    # row) — the registered query must emit only scalar columns
    out = emb_pca_project(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "label",
        "proj_md5",
        "proj_abs_sum",
    ]
    assert all(
        f.dataType.typeName() in {"long", "integer", "string", "double"}
        for f in out.schema.fields
    )
    rows = out.limit(5).collect()
    assert rows and all(len(r["proj_md5"]) == 32 for r in rows)
    # digest agrees with the raw projection it summarizes
    raw = {r["vec_id"]: r["proj"] for r in pca_project_vectors(spark, sf_dir).limit(5).collect()}
    for r in rows:
        if r["vec_id"] in raw:
            assert abs(
                sum(abs(v) for v in raw[r["vec_id"]]) - r["proj_abs_sum"]
            ) < 1e-3
