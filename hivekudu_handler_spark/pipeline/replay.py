"""DuckDB SQL replay builders for deterministic approximate pipelines.

The r10 oracle mechanism: an approximation whose every step is
deterministic and data-derived (no RNG anywhere) is itself
SQL-expressible, so its DuckDB oracle can REPLAY the approximation
instead of pretending the key computes the exact answer.  Keys carried
by these builders: ``dedup_ann_verified`` / ``sim_ann_lsh`` /
``sim_knn_graph`` (sign-LSH banding), ``emb_kmeans_lloyd`` /
``dedup_semantic`` / ``sim_ivf_kmeans`` (unrolled Lloyd fit).

This module deliberately imports NOTHING from the package: the builders
are called at decoration time inside ``@query(oracle=...)`` arguments
across ``similarity``/``clustering``/``dedup``, and a shared leaf module
is the only import shape that works for every module-load order (a
``similarity ⇄ clustering`` edge would break whichever side loads
first).
"""

from __future__ import annotations

# Canonical fixture/model constants shared by the replays and their
# Spark twins (clustering.py aliases these as _K/_ITERS/_DIM).
KMEANS_K = 8
KMEANS_ITERS = 3
EMB_DIM = 64  # embeddings fixture dimensionality (TESTDATA.md)


def lsh_replay_ctes(bits: int, tables: int) -> str:
    """DuckDB CTE prefix (``e``/``pl``/``bits``/``sigs``/``bands``)
    replaying the sign-LSH signature pipeline in SQL.

    Sound because nothing in the pipeline touches an RNG: hyperplane i
    is the difference vector of corpus rows (2i, 2i+1)
    (``similarity._hyperplanes``), sign bits are ``dot(v, plane) > 0``,
    and the banding is pure bit arithmetic — all replayable from the
    ``embeddings`` view alone.  Cross-engine knife edge: a dot product
    landing within an ulp of 0 could flip a bit between engines (DuckDB
    sums ``v·(a−b)`` elementwise like Spark's fold, but not in
    guaranteed-identical order); signature equality is pinned on every
    fixture by the banded keys' oracle rows themselves."""
    width, mask = bits // tables, (1 << (bits // tables)) - 1
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pl AS (
  SELECT CAST(a.vec_id // 2 AS INT) AS plane_id,
         list_transform(list_zip(a.v, b.v), s -> s[1] - s[2]) AS plane
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0 AND a.vec_id < {2 * bits}
),
bits AS (
  SELECT e.vec_id, pl.plane_id,
         CASE WHEN list_dot_product(e.v, pl.plane) > 0 THEN 1 ELSE 0 END AS bit
  FROM e CROSS JOIN pl
),
sigs AS (
  SELECT vec_id, CAST(SUM(bit * (1::BIGINT << plane_id)) AS BIGINT) AS sig
  FROM bits GROUP BY vec_id
),
bands AS (
  SELECT vec_id, t.band_idx, (sig >> ({width} * t.band_idx)) & {mask} AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range({tables})) AS band_idx) t
)"""


def kmeans_assign_ctes(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = EMB_DIM
) -> str:
    """DuckDB CTE chain replaying the unrolled Lloyd fit through the
    FINAL per-vector assignment ``af(vec_id, v, cent_id, sqd)``; the
    final centroids are also addressable as ``c{iters}``.

    Chain: ``c0`` (k lowest-vec_id seeds) → [``s``/``a`` assign,
    ``m``/``c`` update] × iters → ``af`` final assign.  Float
    determinism (see clustering.py module docstring): per-dimension
    means are single SUM/COUNT aggregates whose ~1e-13 order
    sensitivity is absorbed by downstream margins, the squared-distance
    chain is the same left-associated fold Spark's ``F.aggregate``
    runs, and argmin ties break (sqd ASC, cent_id ASC) on both
    engines."""
    # left-associated dim-term chain == Spark's F.aggregate fold
    # (acc starts at 0.0; 0.0 + t1 is exactly t1)
    sqd = " + ".join(
        f"(e.v[{d}] - c.cv[{d}]) * (e.v[{d}] - c.cv[{d}])"
        for d in range(1, dim + 1)
    )

    def assign(tag: str, cents: str) -> str:
        return (
            f"s{tag} AS (SELECT e.vec_id, e.v, c.cent_id, {sqd} AS sqd "
            f"           FROM e CROSS JOIN {cents} c), "
            f"a{tag} AS (SELECT vec_id, v, cent_id, sqd FROM ("
            f"             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"                    ORDER BY sqd, cent_id) AS rn FROM s{tag}) "
            f"           WHERE rn = 1)"
        )

    def update(n: int) -> str:
        return (
            f"m{n} AS (SELECT cent_id, d, SUM(val) / COUNT(*) AS mu FROM ("
            f"           SELECT cent_id, unnest(v) AS val, "
            f"                  unnest(generate_series(1, {dim})) AS d "
            f"           FROM a{n}) GROUP BY cent_id, d), "
            f"c{n} AS (SELECT p.cent_id, COALESCE(u.cv, p.cv) AS cv "
            f"         FROM c{n - 1} p LEFT JOIN ("
            f"           SELECT cent_id, list(mu ORDER BY d) AS cv "
            f"           FROM m{n} GROUP BY cent_id) u "
            f"         ON p.cent_id = u.cent_id)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "           FROM embeddings), "
        "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) "
        "              AS cent_id, v AS cv "
        f"       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))"
    ]
    for n in range(1, iters + 1):
        parts.append(assign(str(n), f"c{n - 1}"))
        parts.append(update(n))
    parts.append(assign("f", f"c{iters}"))
    return ", ".join(parts)
