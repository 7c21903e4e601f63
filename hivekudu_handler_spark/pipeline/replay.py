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

# The near-dup banding knob shared by dedup.ann_verified_pairs and
# similarity.knn_graph (and both keys' replay oracles): 8 bands × 3
# bits.  One definition so a banding change lands in the Spark defaults
# and every oracle simultaneously (r10 review finding).
ANN_BITS = 24
ANN_TABLES = 8


def lsh_replay_ctes(bits: int, tables: int) -> str:
    """DuckDB CTE prefix (``e``/``pl``/``bits``/``sigs``/``bands``)
    replaying the sign-LSH signature pipeline in SQL.

    Sound because nothing in the pipeline touches an RNG: hyperplane i
    is the difference vector of corpus rows (2i, 2i+1)
    (``similarity._hyperplanes``), sign bits are ``dot(v, plane) > 0``,
    and the banding is pure bit arithmetic — all replayable from the
    ``embeddings`` view alone.  Cross-engine knife edges: (a) a dot
    product landing within an ulp of 0 could flip a bit between engines
    (DuckDB sums ``v·(a−b)`` elementwise like Spark's fold, but not in
    guaranteed-identical order); signature equality is pinned on every
    fixture by the banded keys' oracle rows themselves.  (b) zero-norm
    vectors: Spark's fold cosine yields NaN — which Spark SQL treats as
    GREATER than every value — while DuckDB's
    ``list_cosine_similarity`` returns −1.0, so a zero vector surviving
    to the scoring stage would diverge between engines.  Both sides
    therefore EXCLUDE zero-norm vectors from banding/scoring (the
    ``en`` CTE here; ``_nonzero`` on the Spark side): the defined
    semantics are "a zero-norm vector neither emits nor receives
    neighbors".  Hyperplane derivation stays over the UNFILTERED
    corpus — plane i is rows (2i, 2i+1) by vec_id, filtered or not."""
    if bits % tables:
        # mirror the Spark twins' guard (ann_lsh_topk, ann_verified_pairs)
        # instead of silently truncating the band width
        raise ValueError("bits must divide evenly into tables")
    width, mask = bits // tables, (1 << (bits // tables)) - 1
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
en AS (SELECT vec_id, v FROM e WHERE list_dot_product(v, v) > 0),
pl AS (
  SELECT CAST(a.vec_id // 2 AS INT) AS plane_id,
         list_transform(list_zip(a.v, b.v), s -> s[1] - s[2]) AS plane
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0 AND a.vec_id < {2 * bits}
),
bits AS (
  SELECT e.vec_id, pl.plane_id,
         CASE WHEN list_dot_product(e.v, pl.plane) > 0 THEN 1 ELSE 0 END AS bit
  FROM en e CROSS JOIN pl
),
sigs AS (
  SELECT vec_id, CAST(SUM(bit * (1::BIGINT << plane_id)) AS BIGINT) AS sig
  FROM bits GROUP BY vec_id
),
bands AS (
  SELECT vec_id, t.band_idx, (sig >> ({width} * t.band_idx)) & {mask} AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range({tables})) AS band_idx) t
)"""


def lsh_collision_cand_cte() -> str:
    """All-pairs band-collision candidates over ``lsh_replay_ctes``'s
    ``bands`` CTE — ``cand(vec_a < vec_b)``, one pair per colliding
    unordered id pair.  Shared by ``dedup_ann_verified`` and
    ``sim_knn_graph`` so a candidate-generation change (e.g. a
    bucket-size cap) lands in both oracles or neither."""
    return """,
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
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


def ivf_assign_probe_ctes(corpus: str, cents: str, n_queries: int, nprobe: int) -> str:
    """Shared IVF replay section: cosine-argmax cell assignment of
    ``corpus`` (a CTE of (vec_id, v), already zero-norm-filtered) to
    ``cents`` (a CTE of (cent_id, cv)), plus each query's ``nprobe``
    nearest cells.  Produces ``ivfsims``/``asn``/``probes``.  The
    ROW_NUMBER (sim DESC, cent_id) orderings mirror the Spark side's
    struct ``array_max`` tie-break (``similarity._ivf_assign``) and
    probe window.  One SQL text for all three IVF-family oracles
    (``sim_ivf``, ``sim_ivf_kmeans``, ``sim_ivfpq``) — a tie-break or
    probing change lands everywhere or nowhere."""
    return f""",
ivfsims AS MATERIALIZED (
  SELECT t.vec_id, c.cent_id, list_cosine_similarity(t.v, c.cv) AS sim
  FROM {corpus} t CROSS JOIN {cents} c
),
asn AS MATERIALIZED (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
    FROM ivfsims) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
    FROM ivfsims WHERE vec_id < {n_queries}) WHERE rn <= {nprobe}
)"""


def ivf_topk_tail(corpus: str, top_k: int) -> str:
    """Exact-cosine scoring of probed-cell members + per-query top-k —
    the tail shared by ``sim_ivf`` and ``sim_ivf_kmeans`` over the
    ``asn``/``probes`` CTEs from ``ivf_assign_probe_ctes``."""
    return f"""
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(cos_raw, 4) AS cosine FROM (
  SELECT s.query_id, s.vec_id, s.cos_raw,
         ROW_NUMBER() OVER (PARTITION BY s.query_id
                            ORDER BY s.cos_raw DESC, s.vec_id) AS rank
  FROM (
    SELECT p.query_id, a.vec_id,
           list_cosine_similarity(ev.v, eq.v) AS cos_raw
    FROM probes p
    JOIN asn a ON a.cent_id = p.cent_id
    JOIN {corpus} ev ON ev.vec_id = a.vec_id
    JOIN {corpus} eq ON eq.vec_id = p.query_id
    WHERE a.vec_id <> p.query_id) s)
WHERE rank <= {top_k}
"""


def pq_codebook_ctes(m: int, ksub: int, train_n: int, iters: int, dsub: int) -> str:
    """DuckDB CTE chain replaying PQ codebook training + full-corpus
    encoding: L2-normalize (``n``), take the ``train_n`` lowest-vec_id
    sample, run ``iters`` Lloyd iterations per subspace j (codebooks
    ``cb{j}_{iters}``, 16×dsub), then assign every corpus vector's
    subvector to its nearest codeword (``b{j}(vec_id, cid, sqd)``).

    Replay-sound for the same reason as ``kmeans_assign_ctes`` —
    deterministic lowest-id seeds, left-associated distance folds,
    (sqd ASC, cid ASC) argmin ties on both engines.  Every CTE is
    ``MATERIALIZED``: each ``cb{j}_{it}`` is referenced twice (next
    assign + empty-cluster COALESCE fallback), and DuckDB's default CTE
    inlining makes the 10-iteration chain 2¹⁰-fold exponential — the
    unmaterialized form never finishes; materialized it runs in ~12 s.

    Margins measured per fixture (sf0.001/0.01/0.1): smallest
    final-assignment argmin gap 8.0e-5, i.e. ~10¹⁰× the ~1e-15 drift
    the cross-engine centroid means can accumulate over 10 iterations."""

    def sqd_expr(va: str, vb: str) -> str:
        # CORRECTION (r10 review): this left-associated chain is NOT
        # the same summation order as numpy's axis-sum — numpy's
        # unrolled/pairwise reduction kicks in AT n == 8, i.e. exactly
        # the shipped dsub, and ~half of random 8-vectors sum to a
        # different last-ulp double under the two orders.  The replay's
        # correctness therefore rests on the measured argmin MARGINS
        # (≥8.0e-5, ~10¹⁰× the ulp drift), not on bit-exact order
        # equivalence; re-measure the margins before trusting a new
        # fixture or dsub.
        return " + ".join(
            f"({va}[{d}] - {vb}[{d}]) * ({va}[{d}] - {vb}[{d}])"
            for d in range(1, dsub + 1)
        )

    parts = [
        "WITH eraw AS MATERIALIZED (SELECT vec_id, label, "
        "CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        # zero-norm filter BEFORE the divide: Spark 0.0/0.0 is NaN while
        # DuckDB float division may differ — both engines exclude zero
        # vectors from PQ entirely (pq._normalize mirrors this filter)
        "n AS MATERIALIZED (SELECT vec_id, label, "
        "list_transform(x, t -> t / sqrt(list_dot_product(x, x))) AS v "
        "FROM eraw WHERE list_dot_product(x, x) > 0)",
        f"samp AS MATERIALIZED (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT {train_n})",
    ]
    for j in range(m):
        sl = f"v[{j * dsub + 1}:{(j + 1) * dsub}]"
        parts.append(
            f"sub{j} AS MATERIALIZED (SELECT vec_id, {sl} AS sv FROM samp)"
        )
        parts.append(
            f"cb{j}_0 AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER "
            f"(ORDER BY vec_id) - 1 AS INT) AS cid, sv AS cv "
            f"FROM (SELECT vec_id, sv FROM sub{j} ORDER BY vec_id LIMIT {ksub}))"
        )
        for it in range(1, iters + 1):
            sq = sqd_expr("s.sv", "c.cv")
            parts.append(
                f"a{j}_{it} AS MATERIALIZED (SELECT vec_id, sv, cid FROM ("
                f"SELECT s.vec_id, s.sv, c.cid, "
                f"ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY {sq}, c.cid) AS rn "
                f"FROM sub{j} s CROSS JOIN cb{j}_{it - 1} c) WHERE rn = 1)"
            )
            mu = ", ".join(f"AVG(sv[{d}]) " for d in range(1, dsub + 1))
            parts.append(
                f"cb{j}_{it} AS MATERIALIZED (SELECT p.cid, COALESCE(u.cv, p.cv) AS cv "
                f"FROM cb{j}_{it - 1} p "
                f"LEFT JOIN (SELECT cid, [{mu}] AS cv FROM a{j}_{it} GROUP BY cid) u "
                f"ON u.cid = p.cid)"
            )
    for j in range(m):
        sl = f"v[{j * dsub + 1}:{(j + 1) * dsub}]"
        sq = sqd_expr("t.sv", "c.cv")
        parts.append(
            f"b{j} AS MATERIALIZED (SELECT vec_id, cid, sqd FROM ("
            f"SELECT t.vec_id, c.cid, {sq} AS sqd, "
            f"ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY {sq}, c.cid) AS rn "
            f"FROM (SELECT vec_id, {sl} AS sv FROM n) t "
            f"CROSS JOIN cb{j}_{iters} c) WHERE rn = 1)"
        )
    return ", ".join(parts)


def pq_encode_oracle(m: int, ksub: int, train_n: int, iters: int, dsub: int) -> str:
    """``emb_pq_encode`` twin: code word as a comma string + 6-dp
    reconstruction error (Σ_j chosen sqd, the same j-ascending addition
    order as the kernel's ``err +=`` loop).  6-dp margin measured per
    fixture: closest error to a rounding boundary is 4.2e-12 away
    (sf0.01) vs ~1e-14 drift."""
    code = " || ',' || ".join(f"CAST(b{j}.cid AS VARCHAR)" for j in range(m))
    err = " + ".join(f"b{j}.sqd" for j in range(m))
    joins = " ".join(f"JOIN b{j} ON b{j}.vec_id = n.vec_id" for j in range(m))
    return (
        pq_codebook_ctes(m, ksub, train_n, iters, dsub)
        + f" SELECT n.vec_id, n.label, {code} AS code_str, "
        f"ROUND({err}, 6) AS recon_err FROM n {joins}"
    )


def _pq_adc_tail(m: int, dsub: int, n_queries: int, overfetch: int, top_k: int,
                 iters: int, cand_src: str) -> str:
    """Shared ADC-score → top-C → exact-re-rank SQL tail over a
    candidate source ``cand_src`` providing (vec_id, query_id) pairs."""
    adc_terms = " + ".join(
        f"list_dot_product(q.v[{j * dsub + 1}:{(j + 1) * dsub}], c{j}.cv)"
        for j in range(m)
    )
    joins = " ".join(
        f"JOIN b{j} ON b{j}.vec_id = t.vec_id "
        f"JOIN cb{j}_{iters} c{j} ON c{j}.cid = b{j}.cid"
        for j in range(m)
    )
    return f""",
q AS MATERIALIZED (SELECT vec_id AS query_id, v FROM n WHERE vec_id < {n_queries}),
adc AS MATERIALIZED (
  SELECT q.query_id, t.vec_id, {adc_terms} AS adc
  FROM {cand_src} t
  {joins}
  JOIN q ON q.query_id = t.query_id
  WHERE t.vec_id <> t.query_id
),
cands AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS r
    FROM adc) WHERE r <= {overfetch}
)
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(cos_raw, 4) AS cosine FROM (
  SELECT c.query_id, c.vec_id,
         list_dot_product(nv.v, q.v) AS cos_raw,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
                            ORDER BY list_dot_product(nv.v, q.v) DESC, c.vec_id) AS rank
  FROM cands c JOIN n nv ON nv.vec_id = c.vec_id
               JOIN q ON q.query_id = c.query_id)
WHERE rank <= {top_k}
"""


def pq_adc_oracle(m: int, ksub: int, train_n: int, iters: int, dsub: int,
                  n_queries: int, overfetch: int, top_k: int) -> str:
    """``sim_pq_adc`` twin: full-corpus ADC scores (Σ_j codebook
    inner-product lookups, the kernel's j-ascending sum order), top-C
    per query by (adc DESC, vec_id), exact dot re-rank of candidates
    only (unit vectors, so dot IS cosine — same as the kernel)."""
    cand = f"(SELECT n2.vec_id, q2.vec_id AS query_id FROM n n2 " \
           f"CROSS JOIN (SELECT vec_id FROM n WHERE vec_id < {n_queries}) q2)"
    return pq_codebook_ctes(m, ksub, train_n, iters, dsub) + _pq_adc_tail(
        m, dsub, n_queries, overfetch, top_k, iters, cand
    )


def bpe_oracle(n_merges: int, enc_iters: int, max_word_types: int) -> str:
    """``text_bpe_train`` twin: the full BPE trainer AND encoder
    replayed in SQL — ``n_merges`` unrolled merge-learning iterations
    over a (word, pos, sym) symbol table, then ``enc_iters`` unrolled
    greedy-encode iterations, then per-document token-stream assembly.

    Replay-sound because classic BPE is deterministic end-to-end: best
    pair by (count DESC, pair ASC) — byte-wise string comparison agrees
    between Python and DuckDB's binary collation for this ASCII
    alphabet — and the encoder merges the lowest-rank pair leftmost.

    The one non-obvious rule is leftmost-first NON-OVERLAP in the
    training rewrite: for a best pair (a, a), a run of k consecutive
    a's merges at offsets 1, 3, 5… of the run only (the Python scan
    consumes two symbols per merge).  Overlap is impossible for
    s1 ≠ s2, so the SQL applies run-parity — group consecutive matched
    positions (pos − ROW_NUMBER() is constant within a run) and keep
    odd ranks — which reproduces the scan exactly.

    ``enc_iters`` must be ≥ the corpus's max word length (each greedy
    iteration applies exactly one merge per word; a word of L letters
    needs ≤ L).  The fixtures' max is 8; a regenerated corpus with
    longer words would leave unmerged pairs and fail the oracle loudly
    on tokens_md5, which is the correct failure mode.

    All CTEs MATERIALIZED for the same 2^iters-inlining reason as
    ``pq_codebook_ctes``; runs ~5 s on the fixtures (31-word
    vocabulary, ~300-row symbol tables)."""
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    p = [f"""WITH docw AS MATERIALIZED (
  SELECT doc_id, wpos, word FROM (
    SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS wpos
    FROM (SELECT doc_id, string_split({norm}, ' ') AS ws FROM documents))
  WHERE word <> '')""",
        f"""wcnt AS MATERIALIZED (
  SELECT word, cnt FROM (SELECT word, COUNT(*) AS cnt FROM docw GROUP BY word)
  ORDER BY cnt DESC, word LIMIT {max_word_types})""",
        "allw AS MATERIALIZED (SELECT DISTINCT word FROM docw)",
        "tw AS MATERIALIZED (SELECT word FROM wcnt)",
        "wpos_t AS (SELECT word, unnest(generate_series(1, length(word))) AS pos FROM tw)",
        """t0 AS MATERIALIZED (
  SELECT word, pos, substr(word, pos, 1) AS sym FROM wpos_t
  UNION ALL SELECT word, length(word) + 1, '</w>' FROM tw)""",
        "wpos_e AS (SELECT word, unnest(generate_series(1, length(word))) AS pos FROM allw)",
        """e0 AS MATERIALIZED (
  SELECT word, pos, substr(word, pos, 1) AS sym FROM wpos_e
  UNION ALL SELECT word, length(word) + 1, '</w>' FROM allw)""",
    ]
    for i in range(1, n_merges + 1):
        p.append(f"""x{i} AS MATERIALIZED (
  SELECT word, pos, sym, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
  FROM t{i - 1})""")
        p.append(f"""b{i} AS MATERIALIZED (
  SELECT s1, s2 FROM (
    SELECT x.sym AS s1, x.nsym AS s2, SUM(w.cnt) AS c
    FROM x{i} x JOIN wcnt w ON w.word = x.word
    WHERE x.nsym IS NOT NULL GROUP BY x.sym, x.nsym)
  ORDER BY c DESC, s1, s2 LIMIT 1)""")
        p.append(f"""mt{i} AS (
  SELECT x.word, x.pos FROM x{i} x JOIN b{i} b ON x.sym = b.s1 AND x.nsym = b.s2)""")
        p.append(f"""ap{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos, ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS k
    FROM (SELECT word, pos, pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM mt{i})) WHERE k % 2 = 1)""")
        p.append(f"""t{i} AS MATERIALIZED (
  SELECT x.word, ROW_NUMBER() OVER (PARTITION BY x.word ORDER BY x.pos) AS pos,
         CASE WHEN a1.pos IS NOT NULL THEN x.sym || x.nsym ELSE x.sym END AS sym
  FROM x{i} x
  LEFT JOIN ap{i} a1 ON a1.word = x.word AND a1.pos = x.pos
  LEFT JOIN ap{i} a2 ON a2.word = x.word AND a2.pos = x.pos - 1
  WHERE a2.pos IS NULL)""")
    ranks_union = " UNION ALL ".join(
        f"SELECT {i} AS r, s1, s2 FROM b{i}" for i in range(1, n_merges + 1)
    )
    p.append(f"ranks AS MATERIALIZED ({ranks_union})")
    for g in range(1, enc_iters + 1):
        p.append(f"""ex{g} AS MATERIALIZED (
  SELECT word, pos, sym, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
  FROM e{g - 1})""")
        p.append(f"""pk{g} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT x.word, x.pos, ROW_NUMBER() OVER (PARTITION BY x.word ORDER BY rk.r, x.pos) AS rn
    FROM ex{g} x JOIN ranks rk ON rk.s1 = x.sym AND rk.s2 = x.nsym) WHERE rn = 1)""")
        p.append(f"""e{g} AS MATERIALIZED (
  SELECT x.word, ROW_NUMBER() OVER (PARTITION BY x.word ORDER BY x.pos) AS pos,
         CASE WHEN p1.pos IS NOT NULL THEN x.sym || x.nsym ELSE x.sym END AS sym
  FROM ex{g} x
  LEFT JOIN pk{g} p1 ON p1.word = x.word AND p1.pos = x.pos
  LEFT JOIN pk{g} p2 ON p2.word = x.word AND p2.pos = x.pos - 1
  WHERE p2.pos IS NULL)""")
    p.append(f"""wt AS MATERIALIZED (
  SELECT word, COUNT(*) AS ntoks, string_agg(sym, ' ' ORDER BY pos) AS toks
  FROM e{enc_iters} GROUP BY word)""")
    p.append("""perdoc AS (
  SELECT dw.doc_id, CAST(SUM(wt.ntoks) AS BIGINT) AS n_bpe_tokens,
         CAST(SUM(LENGTH(dw.word)) AS BIGINT) AS n_word_chars,
         md5(string_agg(wt.toks, ' ' ORDER BY dw.wpos)) AS tokens_md5
  FROM docw dw JOIN wt ON wt.word = dw.word GROUP BY dw.doc_id)""")
    tail = """
SELECT CAST(-1 AS BIGINT) AS doc_id,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ranks) AS n_bpe_tokens,
       CAST(0 AS BIGINT) AS n_word_chars,
       (SELECT COALESCE(md5(string_agg(s1 || '+' || s2, ' ' ORDER BY r)), md5('')) FROM ranks) AS tokens_md5
UNION ALL
SELECT d.doc_id, COALESCE(p.n_bpe_tokens, 0), COALESCE(p.n_word_chars, 0),
       COALESCE(p.tokens_md5, md5('')) FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
"""
    return ", ".join(p) + tail


def ivfpq_oracle(m: int, ksub: int, train_n: int, iters: int, dsub: int,
                 n_queries: int, overfetch: int, top_k: int,
                 n_cells: int, nprobe: int) -> str:
    """``sim_ivfpq`` twin: IVF cell assignment + probing replay (over
    the NORMALIZED vectors, matching the key — shared
    ``ivf_assign_probe_ctes`` section) restricts which (vec, query)
    pairs the shared ADC tail scores."""
    ivfc = f""",
ivfc AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cent_id, v AS cv
                      FROM n WHERE vec_id < {n_cells})"""
    cand = "(SELECT a.vec_id, p.query_id FROM asn a JOIN probes p ON p.cent_id = a.cent_id)"
    return (
        pq_codebook_ctes(m, ksub, train_n, iters, dsub)
        + ivfc
        + ivf_assign_probe_ctes("n", "ivfc", n_queries, nprobe)
        + _pq_adc_tail(m, dsub, n_queries, overfetch, top_k, iters, cand)
    )
