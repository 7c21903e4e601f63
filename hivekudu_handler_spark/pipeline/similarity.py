"""Similarity search over embedding columns (SURVEY.md §7 M4, north-star).

Three tiers, trading recall for scan cost:

* ``sim_topk_cosine`` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, JVM-side dot products, per-query top-k
  via window rank.  At 100 TB this is the *verification* tier and the
  right choice whenever |queries| is small (the corpus is scanned once,
  no shuffle of the corpus itself).
* ``sim_ann_lsh`` — random-hyperplane (sign) LSH: 16-bit signatures,
  multi-table banding; candidates share a band bucket, then exact
  re-scoring.  Corpus side is one narrow signature table; the expensive
  cosine runs only on bucket collisions.
* ``sim_ivf`` — IVF-style coarse quantization: deterministic centroid
  seed (first k vectors by id), assign corpus to nearest centroid,
  probe the ``nprobe`` nearest centroids per query.  The classic
  billion-vector layout (FAISS IVF) expressed relationally: assignment
  is a broadcast join + argmin, probing is a bucket equi-join.

Hyperplanes/centroids are derived deterministically from the corpus
itself (no RNG), so results are stable for differential testing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

from hivekudu_handler_spark.pipeline.replay import (
    ANN_BITS,
    ANN_TABLES,
    KMEANS_ITERS as _KM_ITERS,
    ivf_assign_probe_ctes,
    ivf_topk_tail,
    kmeans_assign_ctes,
    lsh_collision_cand_cte,
    lsh_replay_ctes,
)

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 10
_TOP_K_GRAPH = 5  # neighbors per vector in the kNN graph


def _as_double(e: DataFrame, out: str = "v") -> DataFrame:
    return e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias(out)
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _nonzero(e: DataFrame) -> DataFrame:
    """Drop zero-norm vectors before any cosine scoring/banding stage.

    Defined semantics (r10, shared with every replay oracle's ``en``
    CTE): a zero-norm vector neither emits nor receives neighbors.
    Without this, Spark's fold cosine yields NaN — which Spark SQL
    ranks GREATER than every value, so a zero vector would pass ``>=
    τ`` filters and take rank 1 in windows — while DuckDB's
    ``list_cosine_similarity`` returns −1.0: a silent cross-engine
    divergence on any future fixture containing a zero embedding.  The
    filter is the same left-fold dot product both engines compare
    (``list_dot_product(v, v) > 0``)."""
    return e.filter(_dot(F.col("v"), F.col("v")) > 0)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Final ranking of an already-small candidate set: window rank per
    query (cosine desc, vec_id tiebreak).  Callers must guarantee the
    input is candidates-only (k·partitions or LSH/IVF collisions), never
    the full scored corpus."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos_raw", 4).alias("cosine"),
        )
    )


def _local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Partition-local top-k per query — phase 1 of the two-phase top-k.

    Runs as an Arrow-batched ``mapInPandas`` over the scored pairs, so NO
    shuffle ever touches the corpus-sized input: each task folds its own
    partition's batches into a running per-query top-k (bounded at
    k·|queries| rows) and emits only that.  Uses the same total order as
    the global phase (cos desc, vec_id asc), which makes per-bucket
    truncation lossless: any global top-k row is within its partition's
    top-k under an identical total order.

    NULL/NaN scores (a zero-norm or null embedding) are filtered out
    BEFORE the fold: pandas ``sort_values`` places NaN last while Spark's
    window and the DuckDB oracle rank NaN largest under DESC, so an
    unfiltered NaN would be pruned in phase 1 yet ranked first in phase 2
    — the two phases must share a true total order (r3 ADVICE).  Dropping
    them is also the right semantics: a vector with no direction has no
    meaningful cosine neighbors."""
    scored = scored.filter(
        F.col("cos_raw").isNotNull() & ~F.isnan(F.col("cos_raw"))
    )
    schema = scored.schema

    def fold(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = (
                acc.sort_values(
                    ["query_id", "cos_raw", "vec_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    return scored.mapInPandas(fold, schema)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    ``queries`` is broadcast; the corpus is scanned once with codegen'd
    dot products.  Top-k is two-phase: a partition-local top-k (Arrow
    ``mapInPandas`` fold — zero shuffle of corpus-sized data) followed by
    a global window rank over only k·P·|queries| candidate rows.  The
    single-phase form (``Window.partitionBy(query_id)`` over all scores)
    funnels the whole scored corpus into |queries| reducers — the r2
    verdict's one flagged 100×-scale bottleneck."""
    return _rank_topk(_local_topk(_score_pairs(corpus, queries), k), k)


def _score_pairs(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, vec_id, cos_raw) for every query×corpus pair except
    self-pairs: queries broadcast, cosine computed JVM-side.

    Norms are computed once per side BEFORE the pair join (r21): the
    per-pair expression is then one dot fold plus a multiply of two
    precomputed doubles — bit-identical to folding both norms per pair
    (same fold, same sqrt, one multiply either way) at a third of the
    per-pair cost, and the corpus-side norm is evaluated |corpus| times
    instead of |corpus|×|queries| times."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qn"),
    )
    c = corpus.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    pairs = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn"))
    return pairs.select("query_id", "vec_id", cos.alias("cos_raw"))


@query(
    "sim_topk_cosine",
    oracle=(
        "WITH en AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "            FROM embeddings "
        "            WHERE list_dot_product(CAST(embedding AS DOUBLE[]), "
        "                  CAST(embedding AS DOUBLE[])) > 0), "
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM en WHERE vec_id < {_N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        "           list_cosine_similarity(e.v, q.qv) AS cos_raw "
        "           FROM en e CROSS JOIN q "
        "           WHERE e.vec_id <> q.query_id), "
        "ranked AS (SELECT query_id, neighbor_id, "
        "           ROW_NUMBER() OVER (PARTITION BY query_id "
        "               ORDER BY cos_raw DESC, neighbor_id) AS rank, "
        "           ROUND(cos_raw, 4) AS cosine FROM scored) "
        f"SELECT * FROM ranked WHERE rank <= {_TOP_K}"
    ),
    tags=("similarity", "vector"),
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for query vectors vec_id < 5.
    Zero-norm vectors excluded on both engines (see ``_nonzero``)."""
    e = _nonzero(_as_double(load_table(spark, sf_dir, "embeddings")))
    return brute_force_topk(e, e.filter(F.col("vec_id") < _N_QUERIES))


# Range-search threshold: the fixture's query-vs-corpus cosine tops out
# near 0.40 with a 99th percentile ≈ 0.30, so τ = 0.30 keeps ~1% of the
# corpus per query — a selective radius, not a disguised full scan.
_RANGE_TAU = 0.30


@query(
    "sim_range_search",
    oracle=(
        "WITH en AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "            FROM embeddings "
        "            WHERE list_dot_product(CAST(embedding AS DOUBLE[]), "
        "                  CAST(embedding AS DOUBLE[])) > 0), "
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM en WHERE vec_id < {_N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        "           list_cosine_similarity(e.v, q.qv) AS cos_raw "
        "           FROM en e CROSS JOIN q "
        "           WHERE e.vec_id <> q.query_id) "
        "SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cosine "
        f"FROM scored WHERE cos_raw >= {_RANGE_TAU}"
    ),
    tags=("similarity", "vector"),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine *range* search: every corpus vector within radius
    (cosine ≥ 0.30) of each query vector — the "find all near-dup
    candidates of this document" query, vs top-k's fixed-size answer.

    Unlike top-k there is no ranking stage at all: queries broadcast,
    one codegen'd scan of the corpus, a threshold filter — zero shuffle
    of corpus-sized data and no per-query window.  At 100 TB this is the
    cheapest possible shape (embarrassingly parallel map over corpus
    partitions); selectivity is governed by τ, and a production caller
    pre-gates with sign-LSH bands (``sim_ann_lsh``) when τ is loose.
    """
    e = _nonzero(_as_double(load_table(spark, sf_dir, "embeddings")))
    scored = _score_pairs(e, e.filter(F.col("vec_id") < _N_QUERIES))
    return scored.filter(F.col("cos_raw") >= _RANGE_TAU).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round("cos_raw", 4).alias("cosine"),
    )


# --- sign-LSH --------------------------------------------------------------

# Defaults for the registered key.  16 bits hash to 65k buckets — enough
# for the fixture, saturated at real corpus sizes; ``ann_lsh_topk`` takes
# (bits, tables) so a deployment sizes signatures to its corpus (e.g.
# 64 bits / 8 tables ≈ 2^64 bucket space).  Recall-vs-bits is pinned in
# tests/test_pipeline.py at both 16 and 32 bits.  The registered
# operating point is 48 bits / 12 four-bit tables: recall 0.94 vs the
# exact top-k on the fixture (pinned ≥ 0.8, mirroring
# dedup_ann_verified's rigor — r6 verdict item 6) while bands stay
# 4-bit-wide so bucket collisions keep pruning instead of degenerating
# toward brute force (2-bit bands hit 0.98 recall on the fixture but
# put ~1/4 of the corpus in every bucket).
_LSH_BITS = 48
_LSH_TABLES = 12


def _hyperplanes(corpus: DataFrame, n: int) -> DataFrame:
    """Deterministic pseudo-hyperplanes: difference vectors of fixed
    corpus-vector pairs (id 2i vs 2i+1) — data-derived, RNG-free."""
    ids = list(range(2 * n))
    vecs = corpus.filter(F.col("vec_id").isin(ids))
    a = vecs.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("int").alias("plane_id"), F.col("v").alias("va")
    )
    b = vecs.filter(F.col("vec_id") % 2 == 1).select(
        ((F.col("vec_id") - 1) / 2).cast("int").alias("plane_id"),
        F.col("v").alias("vb"),
    )
    return a.join(b, "plane_id").select(
        "plane_id", F.zip_with("va", "vb", lambda x, y: x - y).alias("plane")
    )


def _signatures(vectors: DataFrame, planes: DataFrame) -> DataFrame:
    """16-bit sign signature per vector (bit j = sign of dot with plane j).

    Shape note (r21 optimization round, measured): embedding the planes
    as array literals — one giant projection of n_planes interpreted
    HOF folds per row, no crossJoin, no shuffle — benched 4× SLOWER at
    sf0.1 (4.0 s vs 1.0 s warm for 48 planes) than this crossJoin +
    groupBy: higher-order functions are CodegenFallback expressions, so
    the "zero-exchange" plan trades a tiny vec×plane shuffle for losing
    whole-stage codegen on the hot path.  Kept as the expanded form
    deliberately (guide §1.1: the ideal-looking plan lost to the
    measured one)."""
    joined = vectors.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("v"), F.col("plane")) > 0, F.lit(1)).otherwise(F.lit(0))
    return (
        joined.select("vec_id", "plane_id", bit.alias("bit"))
        .groupBy("vec_id")
        # shiftleft with a column shift amount needs the SQL form (the
        # Python helper only accepts a literal)
        .agg(F.expr("sum(shiftleft(CAST(bit AS BIGINT), plane_id))").alias("sig"))
    )


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    bits: int = _LSH_BITS,
    tables: int = _LSH_TABLES,
) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH + exact re-scoring.

    ``tables`` bands of ``bits // tables`` bits over a ``bits``-wide sign
    signature; candidates = bucket collisions in any table; exact cosine
    re-scored on candidates only.  ``bits`` is the corpus-size knob
    (bucket space 2^bits), ``tables`` the recall knob (probability a true
    neighbor collides in ≥1 band).
    """
    if bits % tables:
        raise ValueError("bits must divide evenly into tables")
    width = bits // tables
    mask = (1 << width) - 1
    e_all = _as_double(load_table(spark, sf_dir, "embeddings"))
    # planes derive from the UNFILTERED corpus (rows (2i, 2i+1) by id);
    # banding/scoring exclude zero-norm vectors (see _nonzero)
    planes = _hyperplanes(e_all, bits)
    e = _nonzero(e_all)
    sigs = _signatures(e, planes)
    bands = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), width * t).bitwiseAND(F.lit(mask))
                    for t in range(tables)
                ]
            )
        ).alias("table_id", "bucket"),
    )
    q = bands.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cand = (
        bands.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qn"),
    )
    # per-vector norms computed once per side, one fold per pair — see
    # _score_pairs (bit-identical, a third of the per-pair cost)
    en = e.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    scored = (
        cand.join(en, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos_raw", _dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn")))
    )
    # candidates-only input (bucket collisions), so the plain window rank
    # is shuffle-safe here
    return _rank_topk(scored, _TOP_K)


# 48-bit / 12-table replay + query-side candidate join + top-10 rank.
# Ordering knife edge: the rank orders by the UNROUNDED cosine, which
# the two engines compute with different summation orders — safe on
# these fixtures because the smallest adjacent-cosine gap inside any
# query's candidate ranking is 7.1e-8 (sf0.1; other SFs ≥1.4e-7) with
# zero exact ties, ~10⁷× the ~1e-15 cross-engine drift.
_SIM_ANN_LSH_ORACLE = lsh_replay_ctes(_LSH_BITS, _LSH_TABLES) + f""",
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM bands q JOIN bands c
    ON q.band_idx = c.band_idx AND q.bucket = c.bucket
  WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         list_cosine_similarity(ec.v, eq.v) AS cos_raw
  FROM cand JOIN e ec ON ec.vec_id = cand.vec_id
            JOIN e eq ON eq.vec_id = cand.query_id
)
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(cos_raw, 4) AS cosine FROM (
  SELECT query_id, vec_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {_TOP_K}
"""


@query("sim_ann_lsh", oracle=_SIM_ANN_LSH_ORACLE, tags=("similarity", "vector", "approx"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered key: ``ann_lsh_topk`` at the default 48-bit / 12-table
    configuration (recall ≥ 0.8 vs ``sim_topk_cosine`` pinned in
    tests/test_pipeline.py).  Oracle-backed since r10 (the
    ``dedup_ann_verified`` precedent): the pipeline is RNG-free, so the
    DuckDB oracle replays the banding itself (``lsh_replay_ctes``) —
    the ANN approximation is reproduced, not pretended away.  Top-k
    sets match exactly on every fixture."""
    return ann_lsh_topk(spark, sf_dir)


@query(
    "emb_lang_centroids",
    oracle=(
        "WITH e AS (SELECT d.lang, emb.embedding "
        "           FROM embeddings emb "
        "           JOIN documents d ON emb.vec_id = d.doc_id), "
        "dims AS (SELECT lang, "
        "                unnest(range(1, len(embedding) + 1)) AS dim, "
        "                embedding FROM e) "
        "SELECT lang, CAST(dim AS INT) AS dim, "
        "       ROUND(AVG(CAST(embedding[dim] AS DOUBLE)), 6) AS centroid_val "
        "FROM dims GROUP BY lang, dim"
    ),
    tags=("similarity", "vector"),
)
def emb_lang_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids (here: per document language) in
    flat (lang, dim, value) form — the aggregation behind class
    prototypes, k-means init, and drift monitoring in a training-data
    pipeline.  posexplode + one (lang, dim) hash aggregate: map-side
    partial means only (classes × dims) rows cross the network however
    large the corpus; no vector ever materializes driver-side.  Rounded
    post-aggregation (float discipline)."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = e.join(d, e["vec_id"] == d["doc_id"]).select("lang", "embedding")
    return (
        joined.select(
            "lang", F.posexplode("embedding").alias("pos", "val")
        )
        .select("lang", (F.col("pos") + 1).cast("int").alias("dim"), "val")
        .groupBy("lang", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"))
    )


# --- IVF -------------------------------------------------------------------

_IVF_CENTROIDS = 8
_IVF_NPROBE = 2


def _ivf_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Corpus→centroid assignment, SCAN-SHAPED: the centroid table folds
    to one broadcast row holding all k (id, vector) pairs, and the argmin
    is a pure array expression — ``array_max`` over
    ``struct(sim, -cent_id)`` picks the highest-similarity centroid with
    ties to the smallest id, exactly a (sim DESC, cent_id ASC) window's
    order.  No Exchange ever touches the corpus (plan-asserted in
    tests/test_plans.py; the only Exchange in the plan is the k-row
    centroid fold).  The prior form windowed over corpus×k rows
    partitioned by vec_id — cosmetic at 8 centroids, a full corpus
    shuffle at 65k (r4 verdict #5)."""
    # norms hoisted out of the per-centroid lambda (r21): the row's own
    # norm folds once per row instead of once per (row, centroid), and
    # each centroid's norm folds once per centroid at fold time — the
    # division sees the same two doubles either way, so assignments are
    # bit-identical at 1/k of the per-row norm cost.
    cent_row = cents.agg(
        F.collect_list(
            F.struct("cent_id", "cv", _norm(F.col("cv")).alias("cn"))
        ).alias("cs")
    )
    best = F.array_max(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                (_dot(F.col("v"), c["cv"]) / (F.col("__vn") * c["cn"])).alias("sim"),
                (-c["cent_id"]).alias("neg_id"),
            ),
        )
    )
    return (
        e.withColumn("__vn", _norm(F.col("v")))
        .crossJoin(F.broadcast(cent_row))
        .withColumn("best", best)
        .select("vec_id", "v", (-F.col("best.neg_id")).alias("cent_id"))
    )


def _seed_centroids(e: DataFrame, n_centroids: int = _IVF_CENTROIDS) -> DataFrame:
    """Deterministic seed quantizer: the first ``n_centroids`` NONZERO
    corpus vectors as (cent_id, cv) — shared by ``sim_ivf`` and the
    probe-selectivity measurement so both price the same cells.
    Zero-norm vectors can't be centroids (cosine to a zero centroid
    would be NaN vs −1.0 — mirrors the oracles' ``c ... FROM en``)."""
    return _nonzero(e).filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )


def _probe_ranking(
    e: DataFrame, cents: DataFrame, n_queries: int = _N_QUERIES
) -> DataFrame:
    """Per-query centroid ranking (query_id, qv, cent_id, r) — r = 1 is
    the nearest cell, ties to the smallest cent_id.  THE probe order:
    ``_ivf_topk`` filters it to ``r <= nprobe`` for the search, and
    ``ivf_probe_selectivity`` prices it per nprobe — a shared helper so
    the measured selectivity is the production probe order by
    construction (r15 review item)."""
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col("cent_id")
    )
    return (
        e.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
        .withColumn("r", F.row_number().over(w_probe))
        .select("query_id", "qv", "cent_id", "r")
    )


def _ivf_topk(e: DataFrame, cents: DataFrame, nprobe: int = _IVF_NPROBE) -> DataFrame:
    """The IVF search given a (cent_id, cv) centroid table: assign the
    corpus to cells (broadcast argmin scan), probe each query's
    ``nprobe`` nearest cells, exact-score candidates only.  Zero-norm
    corpus vectors and queries are excluded (``_nonzero``; the replay
    oracles' ``en``/filtered ``n`` CTEs mirror this)."""
    e = _nonzero(e)
    # per-row/per-query norms once, not once per scored pair — see
    # _score_pairs (bit-identical)
    assigned = _ivf_assign(e, cents).withColumn("vn", _norm(F.col("v")))
    # queries probe their nprobe nearest cells
    probes = (
        _probe_ranking(e, cents)
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qv", "cent_id", _norm(F.col("qv")).alias("qn"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn"))).alias("cos_raw"),
        )
    )
    # probed cells are a corpus fraction (nprobe/centroids); run the
    # local-fold phase too so no single-query reducer ever sees them all
    return _rank_topk(_local_topk(scored, _TOP_K), _TOP_K)


# IVF replay oracle (r10, the lsh_replay_ctes precedent): seed
# centroids, cosine-argmax assignment (ties → smallest cent_id, the
# ROW_NUMBER ordering mirrors _ivf_assign's struct array_max), nprobe
# probing, exact re-score, top-10 — the assign/probe/top-k SQL is the
# shared replay.ivf_assign_probe_ctes/ivf_topk_tail text used by all
# three IVF-family keys.  Margins measured per fixture: the smallest
# assignment argmax gap is 1.5e-7 and the smallest final-rank
# adjacent-cosine gap 7.1e-8 (across SFs) — ~10⁷× cross-engine drift.
_SIM_IVF_ORACLE = (
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
en AS (SELECT vec_id, v FROM e WHERE list_dot_product(v, v) > 0),
c AS (SELECT CAST(vec_id AS INT) AS cent_id, v AS cv FROM en
      WHERE vec_id < {_IVF_CENTROIDS})"""
    + ivf_assign_probe_ctes("en", "c", _N_QUERIES, _IVF_NPROBE)
    + ivf_topk_tail("en", _TOP_K)
)


@query("sim_ivf", oracle=_SIM_IVF_ORACLE, tags=("similarity", "vector", "approx"))
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN top-10.

    Centroids = the first ``_IVF_CENTROIDS`` corpus vectors (deterministic
    seed; ``sim_ivf_kmeans`` is the same search over a real Lloyd fit).
    Corpus vectors are assigned to their nearest centroid (broadcast
    argmin); each query probes its ``_IVF_NPROBE`` nearest centroid
    cells and exact-scores only those.  Oracle-backed since r10: the
    whole deterministic pipeline replays in SQL (``_SIM_IVF_ORACLE``)
    and top-k sets match exactly on every fixture; recall ≥ 0.8 vs the
    exact operator stays pinned in tests.
    """
    e = _as_double(load_table(spark, sf_dir, "embeddings"))
    return _ivf_topk(e, _seed_centroids(e))


# sim_ivf's probe/score replay over the Lloyd-fitted centroids instead
# of the raw seeds: chain the kmeans replay (final centroid table
# c{iters}) into the shared cosine-argmax assignment / nprobe / top-k
# SQL.  Margins per fixture: smallest centroid-sim gap 3.1e-6, smallest
# final-rank gap 4.1e-7 (both sf0.1 minima) — ~10⁸× cross-engine drift.
_SIM_IVF_KMEANS_ORACLE = (
    kmeans_assign_ctes()
    + ", en AS (SELECT vec_id, v FROM e WHERE list_dot_product(v, v) > 0)"
    + ivf_assign_probe_ctes("en", f"c{_KM_ITERS}", _N_QUERIES, _IVF_NPROBE)
    + ivf_topk_tail("en", _TOP_K)
)


@query(
    "sim_ivf_kmeans",
    oracle=_SIM_IVF_KMEANS_ORACLE,
    tags=("similarity", "vector", "approx", "slow"),
)
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over REAL k-means cells: ``kmeans_fit`` (3 Lloyd
    iterations, deterministic lowest-vec_id init — pipeline/clustering)
    fits the coarse quantizer, then the identical probe/score path as
    ``sim_ivf`` runs over it.  This is the production IVF shape — FAISS
    trains its quantizer the same way — and the composition is pure:
    the fit touches k×d model state driver-side, the search never
    shuffles the corpus.  Oracle-backed since r10: the Lloyd replay's
    final centroids chain straight into the IVF probe/score replay
    (``_SIM_IVF_KMEANS_ORACLE``); top-k sets match exactly on every
    fixture.  Recall ≥ 0.8 vs the exact operator stays pinned in tests
    (Lloyd cells are better-balanced than the raw-vector seed, so
    recall should never be worse)."""
    from hivekudu_handler_spark.pipeline.clustering import kmeans_fit

    e = _as_double(load_table(spark, sf_dir, "embeddings"))
    fitted, _ = kmeans_fit(e, k=_IVF_CENTROIDS)
    cents = e.sparkSession.createDataFrame(
        [(cid, cv) for cid, cv in fitted], "cent_id int, cv array<double>"
    )
    return _ivf_topk(e, cents)


def ivf_probe_selectivity(
    spark: SparkSession,
    sf_dir: str,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    n_centroids: int = _IVF_CENTROIDS,
    n_queries: int = _N_QUERIES,
    kmeans: bool = False,
) -> list[dict]:
    """MEASURED probe selectivity of the IVF family (r11–r14 verdict
    item): for each ``nprobe``, how much of the corpus do the probed
    cells actually admit into exact scoring, in pairs and in bytes —
    the number SCALE.md's "cost ∝ nprobe/k of the corpus" claim rests
    on.

    Method (everything corpus-sized stays distributed; only model-sized
    stats reach the driver):

    - cell sizes: one pass of the production ``_ivf_assign`` scan +
      a k-row groupBy count (collect bounded at ``n_centroids`` rows);
    - probe lists: the SAME ``_probe_ranking`` helper ``_ivf_topk``
      searches with (bounded at ``n_queries·n_centroids`` rows,
      collected) — shared code, so the measurement prices the
      production probe order by construction, additionally
      cross-checked against the real join's count in
      tests/test_new_surface_r15.py;
    - per-nprobe totals composed driver-side from those two
      model-sized tables.

    Returns one dict per nprobe with: probed_pairs (Σ_q Σ_{cell∈probe(q)}
    |cell|), total_pairs (n_queries · corpus), selectivity, and the
    bytes an executor actually reads per query set — float32 full
    vectors (sim_ivf: 4·d per row) and PQ codes (sim_ivfpq: 8 bytes per
    row) — vs the brute-force scan."""
    e = _nonzero(_as_double(load_table(spark, sf_dir, "embeddings")))
    dim = len(e.select("v").first()["v"])
    if kmeans:
        from hivekudu_handler_spark.pipeline.clustering import kmeans_fit

        fitted, _ = kmeans_fit(e, k=n_centroids)
        cents = spark.createDataFrame(
            [(cid, cv) for cid, cv in fitted], "cent_id int, cv array<double>"
        )
    else:
        cents = _seed_centroids(e, n_centroids)
    cell_sizes = {
        r["cent_id"]: r["n"]
        for r in _ivf_assign(e, cents).groupBy("cent_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    corpus_rows = sum(cell_sizes.values())
    probe_rank = (
        _probe_ranking(e, cents, n_queries)
        .select("query_id", "cent_id", "r")
        .collect()
    )
    n_q = len({row["query_id"] for row in probe_rank})
    out = []
    for np_ in nprobes:
        probed = sum(
            cell_sizes.get(row["cent_id"], 0)
            for row in probe_rank
            if row["r"] <= np_
        )
        total = n_q * corpus_rows
        out.append(
            {
                "nprobe": np_,
                "n_centroids": n_centroids,
                "probed_pairs": probed,
                "total_pairs": total,
                "selectivity": probed / total if total else 0.0,
                "probed_f32_mb": probed * 4 * dim / 1e6,
                "brute_f32_mb": total * 4 * dim / 1e6,
                "probed_pq_mb": probed * 8 / 1e6,
                "brute_pq_mb": total * 8 / 1e6,
            }
        )
    return out


# 24-bit / 8-table replay (the ann_verified_pairs banding, threshold
# None), symmetrized, top-5 per vector.  The rank orders by the ROUNDED
# cosine (unlike _SIM_ANN_LSH_ORACLE's raw ordering) with neighbor_id
# tiebreak, so rank determinism needs only the rounded values to match
# — which the dedup_ann_verified oracle already pins per fixture.
_KNN_GRAPH_ORACLE = lsh_replay_ctes(ANN_BITS, ANN_TABLES) + lsh_collision_cand_cte() + f""",
scored AS (
  SELECT c.vec_a, c.vec_b,
         ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
  FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
),
sym AS (
  SELECT vec_a AS vec_id, vec_b AS neighbor_id, cosine FROM scored
  UNION ALL
  SELECT vec_b AS vec_id, vec_a AS neighbor_id, cosine FROM scored
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sym)
WHERE rank <= {_TOP_K_GRAPH}
"""


@query(
    "sim_knn_graph",
    oracle=_KNN_GRAPH_ORACLE,
    tags=("similarity", "vector", "approx", "slow"),
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN GRAPH: top-``_TOP_K_GRAPH`` cosine neighbors for
    EVERY corpus vector — the primitive semantic-dedup and graph
    clustering consume (SemDeDup's cluster step, connected-components
    keeper assignment) when "queries" are the whole corpus, not a
    handful of probes.

    Composition, all existing machinery: unthresholded sign-LSH
    candidate pairs (``dedup.ann_verified_pairs`` banding — bucket
    self-equi-join, never a cross join), symmetrized so both endpoints
    see the pair, per-vector top-k via a rank window Spark 4 plans as
    WindowGroupLimit (partition-local group limits before the one
    exchange, so candidate volume — not corpus² — bounds the shuffle).

    At 100 TB the banding is the knob: candidate volume is
    Σ_buckets n_b², tuned by band width exactly as the docstring of
    ``ann_verified_pairs`` lays out; every vector's list is still
    produced (a vector with zero collisions keeps an empty list rather
    than a brute-force fallback — recall is the traded quantity, pinned
    ≥ 0.8 on the fixture vs exact numpy kNN in tests).

    Oracle-backed since r10 (``dedup_ann_verified`` precedent): the
    whole RNG-free banding replays in DuckDB SQL (``_KNN_GRAPH_ORACLE``)
    and the graphs match exactly on every fixture."""
    return knn_graph(spark, sf_dir)


def knn_graph(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """The ``sim_knn_graph`` composition with the banding knob exposed.

    ``bits``/``tables`` pass straight through to ``ann_verified_pairs``:
    WIDER bands (bits/tables up) shrink every bucket, and since candidate
    volume is Σ_buckets n_b², band width is the knob that bounds the one
    big shuffle on a duplicated/clustered corpus (SCALE.md's 8× smoke
    measures exactly this).  ``threshold=None`` — the graph is
    unthresholded by design; recall is traded only through banding."""
    from hivekudu_handler_spark.pipeline.dedup import ann_verified_pairs

    pairs = ann_verified_pairs(
        spark, sf_dir, threshold=None, bits=bits, tables=tables
    )
    # symmetrize via ONE explode, not a self-union (r22): the union form
    # embedded the whole candidate-generation + exact-verify pipeline in
    # BOTH branches, and the physical plan (plans/r21/sim_knn_graph_*.txt)
    # ran the band self-join, the distinct and the interpreted cosine
    # fold TWICE — once per branch (the cached frames dedupe the leaf
    # scans, not the post-cache joins).  Emitting both directions of each
    # scored pair from a 2-element array keeps the pipeline in the plan
    # exactly once; the row multiset is identical, so the rank window
    # (deterministic: neighbor_id is unique per vec_id) and the oracle
    # hash are unchanged.  At 100 TB this halves the dominant cost of the
    # whole-corpus kNN graph (guide §7.2 "duplicated subtrees").
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("vec_id"),
                    F.col("vec_b").alias("neighbor_id"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("vec_b").alias("vec_id"),
                    F.col("vec_a").alias("neighbor_id"),
                    F.col("cosine"),
                ),
            )
        ).alias("p")
    ).select("p.vec_id", "p.neighbor_id", "p.cosine")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (k if k is not None else _TOP_K_GRAPH))
        .select("vec_id", "neighbor_id", "rank", "cosine")
    )
