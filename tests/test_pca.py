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


def test_registered_query_emits_exact_bounds_scalars(spark, sf_dir):
    # the driver verifier cannot canonicalize array cells (r6's one red
    # row) — the registered query must emit only scalar columns, and
    # since r15 those are the exact-bounds certificate: value-checked
    # centered norms plus the two bound booleans, all TRUE on the
    # healthy fixture
    out = emb_pca_project(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "label",
        "centered_sq",
        "proj_within_norm",
        "captures_axis_bound",
    ]
    assert all(
        f.dataType.typeName() in {"long", "integer", "double", "boolean"}
        for f in out.schema.fields
    )
    rows = out.collect()
    emb, x = _corpus(spark, sf_dir)
    assert len(rows) == len(x)
    assert all(r["proj_within_norm"] for r in rows)
    assert all(r["captures_axis_bound"] for r in rows)
    # centered_sq agrees with single-node numpy
    ref = ((x - x.mean(axis=0)) ** 2).sum(axis=1)
    by_id = {r["vec_id"]: r["centered_sq"] for r in rows}
    ids = sorted(by_id)
    got = np.array([by_id[i] for i in ids])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)
    # the axis bound is genuinely non-trivial: captured variance must
    # also not exceed the TOTAL variance (sanity both sides)
    comps, mu = fit_pca(emb, x.shape[1], N_COMPONENTS)
    proj = (x - mu) @ comps.T
    captured = (proj**2).sum()
    total = ref.sum()
    axis = np.sort(((x - mu) ** 2).sum(axis=0))[::-1][:N_COMPONENTS].sum()
    assert axis <= captured <= total + 1e-6
