"""Corpus-curation operators: the steps between "deduped documents" and
"training-ready corpus" (SURVEY.md §7 M4, training-pipeline north-star).

* ``sample_global_shuffle`` — deterministic global permutation of the
  corpus for training-data ordering.  A 100 TB corpus cannot be shuffled
  by ``ORDER BY rand()`` (non-reproducible) or a global ``row_number``
  (a windowless window funnels every row through one task); instead each
  row gets an md5 hash of its key as the shuffle key and the write path
  range-partitions on it — a balanced, resumable, fully deterministic
  permutation whose physical plan is one RangePartitioning exchange.
* ``sample_per_lang_quota`` — per-class quota sampling (at most N docs
  per language, chosen by hash order): the training-mix shaping step.
  Same two-phase shape as the top-k family: a partition-local fold
  bounds every task's output at N·|classes| rows, then a global window
  ranks only the |classes|·N·P candidates — no per-class reducer ever
  sees the full corpus (cf. similarity.py's two-phase cosine top-k).
* ``text_decontaminate`` — benchmark-contamination check: flag training
  documents sharing ≥ T distinct 3-token shingles with any document in
  a (small) eval/benchmark set.  The eval shingle set is broadcast, so
  the corpus is scanned exactly once with a map-side hash join — the
  only scalable shape when the corpus is 100 TB and the benchmark is
  megabytes.
* ``text_pii_scrub`` — regex redaction (emails) with a per-doc redaction
  count: pure JVM ``regexp_replace``/``regexp_count``, no UDF.  The
  fixture corpus contains no PII, so the operator first plants
  deterministic emails on a doc_id-keyed subset (the plant is part of
  the operator contract and mirrored in the oracle); the scrubbed text
  is emitted as an md5 so the differential check verifies the exact
  redacted bytes without shipping full documents through the verifier.
* ``emb_quantize_int8`` — symmetric SQ8 quantization of the embedding
  column (the storage/serving encoding of a 100 TB vector store), pure
  JVM ``transform`` arithmetic chosen to be bit-identical across
  engines (``floor(x + 0.5)``, never ROUND).
* ``doc_pack_sequences`` — greedy token-budget sequence packing into
  training batches: hash-bucketed ``applyInPandas`` so packing
  parallelism scales with the cluster while each sequence stays an
  ordered, contiguous fold.

Reference provenance: the reference exposes Hive SQL over stored tables
(README.md:4-7) and leaves data preparation to the user; these operators
are part of the from-scratch LLM-pipeline tier this repo adds on top of
the same table surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline.dedup import _SHINGLE_CTES_SQL, doc_shingles
from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

_LANG_QUOTA = 25
_DECONTAM_MIN_SHARED = 5
_EVAL_MOD = 97  # doc_id % 97 == 0 -> member of the held-out eval set

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PACK_BUDGET = 128  # tokens per packed training sequence
_PACK_BUCKETS = 16  # independent packing tasks; corpus/16 rows per task


def _shuffle_key(col):
    """Deterministic uniform shuffle key: md5 of the stringified id.
    Identical byte-for-byte in Spark and DuckDB, so oracles can recompute
    it; uniform enough that range partitions are balanced."""
    return F.md5(col.cast("string"))


@query(
    "sample_global_shuffle",
    oracle=(
        "SELECT doc_id, lang, "
        "       md5(CAST(doc_id AS VARCHAR)) AS shuffle_key, "
        "       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard "
        "FROM documents"
    ),
    tags=("sampling",),
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus for training order.

    Every row gets ``shuffle_key = md5(doc_id)`` and a 256-way ``shard``
    prefix; the result is range-partitioned and sorted on the key, so
    writing it out yields globally hash-permuted training shards.  The
    plan is exactly one RangePartitioning exchange (asserted in
    tests/test_plans.py) — never a single-task global ``row_number``,
    which is the classic non-scalable way to number a shuffled corpus.
    Downstream readers that need an explicit position can use
    ``shard || shuffle_key`` as the total order, or a per-shard
    ``row_number`` (bounded by shard size, not corpus size)."""
    d = load_table(spark, sf_dir, "documents")
    key = _shuffle_key(F.col("doc_id"))
    out = d.select(
        "doc_id",
        "lang",
        key.alias("shuffle_key"),
        F.substring(key, 1, 2).alias("shard"),
    )
    # Physical partition count is a sizing knob, not part of the result:
    # the logical `shard` column is the stable 256-way prefix, while the
    # range-partition fan-out follows the session's parallelism (at
    # 100 TB: corpus_bytes / target_file_size, e.g. ~100k partitions for
    # 1 GB training shards).
    n_shards = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return out.repartitionByRange(n_shards, "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


def _local_group_head(df: DataFrame, n: int) -> DataFrame:
    """Partition-local per-(lang) head-N under the (sort_key, doc_id)
    total order — phase 1 of the two-phase quota sample.  Arrow-batched
    fold: each task emits at most n·|langs| rows, so the global phase
    ranks |langs|·n·P candidates instead of the corpus (the same
    lossless-truncation argument as similarity._local_topk: the global
    head-N per group is a subset of every partition's head-N under an
    identical total order)."""
    schema = df.schema

    def fold(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = (
                acc.sort_values(["lang", "sort_key", "doc_id"])
                .groupby("lang", sort=False)
                .head(n)
            )
        if acc is not None and len(acc):
            yield acc

    return df.mapInPandas(fold, schema)


@query(
    "sample_per_lang_quota",
    oracle=(
        "SELECT lang, doc_id, rk FROM ("
        "  SELECT lang, doc_id, "
        "         ROW_NUMBER() OVER (PARTITION BY lang "
        "             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk "
        "  FROM documents) "
        f"WHERE rk <= {_LANG_QUOTA}"
    ),
    tags=("sampling",),
)
def sample_per_lang_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix quota: keep at most N documents per language, chosen
    deterministically by hash order (an unbiased, reproducible sample —
    the hash order is a fixed random permutation of each class).

    Two-phase per-group head-N: a partition-local fold caps every task at
    N rows per language, then one window over the N·P·|langs| candidates
    assigns the final rank.  The single-phase form (window straight over
    the corpus partitioned by ``lang``) funnels each language's entire
    corpus — at 100 TB, terabytes per reducer for a 20-language mix —
    through |langs| tasks; the fold makes the window input independent
    of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "lang", "doc_id", _shuffle_key(F.col("doc_id")).alias("sort_key")
    )
    head = _local_group_head(keyed, _LANG_QUOTA)
    w = Window.partitionBy("lang").orderBy("sort_key", "doc_id")
    return (
        head.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _LANG_QUOTA)
        .select("lang", "doc_id", "rk")
    )


@query(
    "text_decontaminate",
    oracle=(
        f"WITH {_SHINGLE_CTES_SQL}, "
        "eval_sh AS (SELECT DISTINCT shingle FROM ex "
        f"            WHERE doc_id % {_EVAL_MOD} = 0) "
        "SELECT e.doc_id, COUNT(*) AS n_shared "
        "FROM ex e JOIN eval_sh USING (shingle) "
        f"WHERE e.doc_id % {_EVAL_MOD} <> 0 "
        "GROUP BY e.doc_id "
        f"HAVING COUNT(*) >= {_DECONTAM_MIN_SHARED}"
    ),
    tags=("text",),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥ T distinct
    3-token shingles with the eval set (here: ``doc_id % 97 == 0``, the
    stand-in for a held-out benchmark).

    The eval shingle vocabulary is deduped and **broadcast** — benchmarks
    are megabytes while the corpus is the 100 TB side, so the join must
    be a map-side hash probe of the corpus shingles, never a shuffle of
    them.  Count of *distinct* shared shingles per training doc (the
    shingle lists are already distinct per doc), thresholded at T.
    Shingles join on raw strings to stay oracle-exact; at corpus scale
    the same plan runs on 8-byte ``xxhash64(shingle)`` keys exactly as
    dedup_ngram_jaccard does (pipeline/dedup.py)."""
    ex = doc_shingles(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_sh = ex.filter(is_eval).select("shingle").distinct()
    return (
        ex.filter(~is_eval)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _DECONTAM_MIN_SHARED)
    )


@query(
    "text_pii_scrub",
    oracle=(
        "WITH planted AS ("
        "  SELECT doc_id, "
        "         text || CASE WHEN doc_id % 21 = 0 THEN "
        "             ' contact user' || doc_id || '@example.com or admin@test.org now' "
        "           WHEN doc_id % 7 = 0 THEN "
        "             ' contact user' || doc_id || '@example.com now' "
        "           ELSE '' END AS body "
        "  FROM documents) "
        "SELECT doc_id, "
        f"       CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT) "
        "           AS n_pii, "
        f"       md5(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g')) "
        "           AS clean_md5 "
        "FROM planted"
    ),
    tags=("text",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact email addresses, count redactions per doc.

    Pure JVM regex (``regexp_replace`` + ``regexp_count``) inside
    whole-stage codegen — a row-local scan transform with zero shuffle,
    which is the only acceptable shape for a full-corpus cleaning pass.
    The fixture corpus is PII-free, so the operator deterministically
    plants emails on doc_id % 7 (one) and % 21 (two) before scrubbing;
    the plant is mirrored in the oracle, making the differential check
    verify the regex engines agree on match boundaries.  The scrubbed
    body is emitted as md5 so the verifier hashes 32-byte digests, not
    document bodies.  The regex avoids lookarounds/backreferences so
    Java (Spark) and RE2 (DuckDB) semantics coincide."""
    d = load_table(spark, sf_dir, "documents")
    plant = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 21 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or admin@test.org now"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .otherwise(F.lit("")),
    )
    body = F.col("body")
    return d.select("doc_id", plant.alias("body")).select(
        "doc_id",
        F.regexp_count(body, F.lit(_EMAIL_RE)).cast("long").alias("n_pii"),
        F.md5(F.regexp_replace(body, _EMAIL_RE, "<EMAIL>")).alias("clean_md5"),
    )


@query(
    "emb_quantize_int8",
    oracle=(
        "WITH scaled AS ("
        "  SELECT vec_id, "
        "         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd, "
        "         list_max(list_transform(embedding, "
        "             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale "
        "  FROM embeddings), "
        "quant AS ("
        "  SELECT vec_id, scale, "
        "         list_transform(vd, x -> CASE WHEN scale = 0 THEN 0 "
        "             ELSE CAST(floor(x / scale + 0.5) AS INTEGER) END) AS q "
        "  FROM scaled) "
        "SELECT vec_id, scale, "
        "       md5(array_to_string(q, ',')) AS q_md5, "
        "       CAST(list_sum(q) AS BIGINT) AS q_sum "
        "FROM quant"
    ),
    tags=("embedding",),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    storage/serving tier of a 100 TB vector store (4× smaller than f32,
    8× smaller than the f64 compute form; FAISS/ScaNN's standard SQ8).

    Per vector: ``scale = max|v| / 127``; ``q_i = floor(v_i/scale + 0.5)``
    — floor(x + 0.5) instead of ROUND because it is pure IEEE arithmetic,
    bit-identical in Spark and DuckDB, while ROUND diverges between
    HALF_UP and float-space rounding (see tools/parity.py gotchas).
    Zero vectors quantize to all-zero (scale 0 guard).  Everything is
    JVM-side ``transform``/``aggregate`` in one codegen stage: a pure
    row-local scan transform, zero shuffle, the only acceptable shape
    for re-encoding an entire corpus.  The int8 array leaves as an md5
    of its comma-joined form plus a checksum sum — the driver verifier
    cannot hash list cells (r2 lesson), and 32-byte digests beat
    shipping the vectors anyway."""
    e = load_table(spark, sf_dir, "embeddings")
    vd = F.transform("embedding", lambda x: x.cast("double"))
    out = e.select(
        "vec_id",
        vd.alias("vd"),
        (F.array_max(F.transform(vd, F.abs)) / F.lit(127.0)).alias("scale"),
    )
    s = F.col("scale")
    q = F.transform(
        F.col("vd"),
        lambda x: F.when(s == 0, F.lit(0)).otherwise(
            F.floor(x / s + F.lit(0.5)).cast("int")
        ),
    )
    out = out.select("vec_id", "scale", q.alias("q"))
    return out.select(
        "vec_id",
        "scale",
        F.md5(F.array_join(F.transform("q", lambda x: x.cast("string")), ",")).alias(
            "q_md5"
        ),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
    )


@query(
    "doc_pack_sequences",
    oracle=(
        # The greedy fold replayed as a recursive CTE: per bucket, rows
        # step in (md5, doc_id) order carrying (seq_after, fill_after)
        # state; every transition mirrors pack()'s next-fit rules.
        "WITH RECURSIVE base AS ("
        "  SELECT doc_id, "
        "    strpos('0123456789abcdef', "
        "           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bucket, "
        "    md5(CAST(doc_id AS VARCHAR)) AS sort_key, "
        "    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens "
        "  FROM documents), "
        "ordered AS ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket "
        "         ORDER BY sort_key, doc_id) AS rn FROM base), "
        "walk(bucket, rn, doc_id, n_tokens, seq_use, off, seq_after, fill_after) AS ("
        "  SELECT bucket, rn, doc_id, n_tokens, "
        "         CAST(0 AS BIGINT) AS seq_use, CAST(0 AS BIGINT) AS off, "
        "         CAST(CASE WHEN n_tokens >= 128 THEN 1 ELSE 0 END AS BIGINT) "
        "           AS seq_after, "
        "         CAST(CASE WHEN n_tokens >= 128 THEN 0 ELSE n_tokens END "
        "           AS BIGINT) AS fill_after "
        "  FROM ordered WHERE rn = 1 "
        "  UNION ALL "
        "  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens, "
        "    CASE WHEN w.fill_after > 0 AND w.fill_after + o.n_tokens > 128 "
        "         THEN w.seq_after + 1 ELSE w.seq_after END, "
        "    CASE WHEN w.fill_after > 0 AND w.fill_after + o.n_tokens > 128 "
        "         THEN 0 ELSE w.fill_after END, "
        "    CASE WHEN (CASE WHEN w.fill_after > 0 "
        "                    AND w.fill_after + o.n_tokens > 128 "
        "               THEN 0 ELSE w.fill_after END) + o.n_tokens >= 128 "
        "         THEN (CASE WHEN w.fill_after > 0 "
        "                    AND w.fill_after + o.n_tokens > 128 "
        "               THEN w.seq_after + 1 ELSE w.seq_after END) + 1 "
        "         ELSE (CASE WHEN w.fill_after > 0 "
        "                    AND w.fill_after + o.n_tokens > 128 "
        "               THEN w.seq_after + 1 ELSE w.seq_after END) END, "
        "    CASE WHEN (CASE WHEN w.fill_after > 0 "
        "                    AND w.fill_after + o.n_tokens > 128 "
        "               THEN 0 ELSE w.fill_after END) + o.n_tokens >= 128 "
        "         THEN 0 "
        "         ELSE (CASE WHEN w.fill_after > 0 "
        "                    AND w.fill_after + o.n_tokens > 128 "
        "               THEN 0 ELSE w.fill_after END) + o.n_tokens END "
        "  FROM walk w JOIN ordered o "
        "    ON o.bucket = w.bucket AND o.rn = w.rn + 1) "
        "SELECT doc_id, bucket * 1099511627776 + seq_use AS seq_id, "
        "       off AS offset, n_tokens, n_tokens > 128 AS truncated "
        "FROM walk"
    ),
    tags=("text", "stateful"),
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents into fixed
    token-budget training sequences (budget ``_PACK_BUDGET``), the step
    that turns a deduped corpus into dense LM batches.

    Packing is inherently sequential *within* a sequence, so the corpus
    is split into ``_PACK_BUCKETS`` hash buckets (`pmod(xxhash64(doc_id))`)
    and each bucket packs independently inside one ``applyInPandas``
    task, walking its docs in md5-hash order (a deterministic random
    permutation — consecutive docs are unrelated, which is exactly what
    training wants) and opening a new sequence whenever the next doc
    would overflow the budget.  The bucket count is a **per-dataset**
    knob (sized so corpus/buckets rows fit one task — at 100 TB, tens of
    thousands), fixed per corpus rather than derived from the cluster:
    sequence ids embed the bucket (``bucket * 2^40 + local``), so a
    fixed count keeps the packing bit-reproducible across cluster sizes
    while ids stay globally unique without coordination.  Docs longer than the budget become singleton sequences
    flagged ``truncated`` — the plumbing a real tokenizer-aware splitter
    plugs into.  Greedy next-fit (not bin-packing-optimal) is the
    industry default: O(n) per bucket, deterministic, and waste is
    bounded by the shortest-doc tail, verified in tests.

    Oracle-backed since r6: the sequential fold is replayed as a
    recursive CTE stepping each bucket's rows in (md5, doc_id) order
    with the packing state carried through the recursion — possible
    once the bucket id became the md5 hex digit both engines compute
    identically (xxhash64 through r5 kept this key rows-only).
    tests/test_curation.py additionally pins exactly-once coverage,
    budget compliance, offset contiguity, greedy minimality, and
    partitioning-independence."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    # bucket = first hex digit of the md5 shuffle key: a uniform 0..15
    # id both engines compute byte-identically (xxhash64 through r5 —
    # Spark-only, which is what kept this key rows-only)
    keyed = d.select(
        "doc_id",
        F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(cast(doc_id as string)), 1, 1)) - 1"
        ).cast("int").alias("bucket"),
        _shuffle_key(F.col("doc_id")).alias("sort_key"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    budget = _PACK_BUDGET

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sort_key", "doc_id"]).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        seq_local, fill = 0, 0
        seqs, offsets, trunc = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                seq_local += 1
                fill = 0
            offsets.append(fill)
            seqs.append((bucket << 40) + seq_local)
            trunc.append(n > budget)
            fill += n
            if fill >= budget:  # exactly-full or oversized: close it
                seq_local += 1
                fill = 0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "seq_id": pd.Series(seqs, dtype="int64"),
                "offset": pd.Series(offsets, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
                "truncated": pd.Series(trunc, dtype="bool"),
            }
        )

    return keyed.groupBy("bucket").applyInPandas(
        pack,
        "doc_id long, seq_id long, offset long, n_tokens long, truncated boolean",
    )


@query(
    "pipeline_curate_end2end",
    oracle=(
        "WITH toks AS ("
        "  SELECT doc_id, lang, text, "
        "         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens "
        "  FROM documents), "
        "gated AS ("
        "  SELECT * FROM toks WHERE length(text) >= 100 AND n_tokens >= 20), "
        "ranked AS ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn "
        "  FROM gated) "
        "SELECT lang, "
        "       COUNT(*) FILTER (WHERE rn = 1) AS docs_kept, "
        "       COUNT(*) FILTER (WHERE rn > 1) AS dupes_removed, "
        "       CAST(COALESCE(SUM(n_tokens) FILTER (WHERE rn = 1), 0) AS BIGINT) "
        "           AS tokens_kept "
        "FROM ranked GROUP BY lang ORDER BY lang"
    ),
    tags=("pipeline",),
)
def pipeline_curate_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel as ONE composed job — what a user
    actually runs nightly over a crawl: length/token quality gate →
    exact dedup (md5 fingerprint, first-doc-wins) → per-language corpus
    accounting (kept docs, removed duplicates, retained tokens).

    Plan shape on purpose: the quality gate is a scan-local filter BELOW
    the only data-sized exchange (the fingerprint shuffle for the dedup
    window), so rejected docs never shuffle; the per-language rollup
    moves aggregate cells only.  Each stage alone has a dedicated key
    (text_quality, dedup_exact_docs, text_tokens); this key pins their
    composition end-to-end against a single SQL replay."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tokens"),
    )
    gated = toks.filter((F.length("text") >= 100) & (F.col("n_tokens") >= 20))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ranked = gated.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.when(F.col("rn") == 1, 1)).alias("docs_kept"),
            F.count(F.when(F.col("rn") > 1, 1)).alias("dupes_removed"),
            F.coalesce(
                F.sum(F.when(F.col("rn") == 1, F.col("n_tokens"))), F.lit(0)
            ).alias("tokens_kept"),
        )
        .orderBy("lang")
    )


_N_EXPORT_SHARDS = 16


@query(
    "curate_export_shards",
    oracle=(
        "WITH ordered AS ("
        "  SELECT doc_id, "
        "         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), "
        "                            doc_id) AS pos, "
        "         COUNT(*) OVER () AS n "
        "  FROM documents) "
        "SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"       CAST(((pos - 1) * {_N_EXPORT_SHARDS}) // n AS INT) AS shard "
        "FROM ordered"
    ),
    tags=("sampling",),
)
def curate_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-export last mile: every document gets its explicit
    global position under the deterministic shuffle order
    (``md5(doc_id)``, the same key as ``sample_global_shuffle``) and a
    balanced CONTIGUOUS shard assignment — shard k holds positions
    (k·n/16, (k+1)·n/16], sizes within ±1 of each other by
    construction, so a trainer streams shard files in order and sees
    the exact global permutation.

    Positions come from ``with_global_position`` (range sort +
    broadcast offsets + partition-local cumcount — never a
    single-partition window; operators/sorts.py), making this the
    composition the r6-flagged scale-killer fix exists for.  The only
    additional cost over the shuffle itself is one count job for the
    shard arithmetic."""
    from hivekudu_handler_spark.operators.sorts import with_global_position

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _shuffle_key(F.col("doc_id")).alias("shuffle_key")
    )
    total = d.count()
    ranked = with_global_position(
        d, [F.col("shuffle_key"), F.col("doc_id")]
    )
    return ranked.select(
        "doc_id",
        "pos",
        F.expr(
            f"CAST(((pos - 1) * {_N_EXPORT_SHARDS}) DIV {total} AS INT)"
        ).alias("shard"),
    )


# Target language mixture for curate_mixture_sample: the configured
# pretraining mix.  Budget = half the corpus; per-language keep rate is
# derived from MEASURED counts so the output hits the target shares (up
# to clamping when a language is scarcer than its target).
_MIXTURE_SHARES = {"en": 0.30, "zh": 0.20, "de": 0.20, "es": 0.15, "fr": 0.15}
_MIXTURE_BUDGET = 0.5

# CAST the share/budget literals to DOUBLE: DuckDB parses bare decimal
# literals as exact DECIMAL and would multiply/divide in decimal
# arithmetic, while the Spark side derives the rate in Python IEEE
# doubles — a corpus where floor(rate*65536) straddles the two
# representations would flip sample membership cross-engine (r7 ADVICE).
# With the casts both engines run the identical IEEE operation sequence.
_MIX_CASE_SQL = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN CAST({v} AS DOUBLE)"
        for k, v in _MIXTURE_SHARES.items()
    )
    + " ELSE CAST(0.0 AS DOUBLE) END"
)


@query(
    "curate_mixture_sample",
    oracle=(
        "WITH counts AS (SELECT lang, COUNT(*) AS n_lang, "
        "                SUM(COUNT(*)) OVER () AS n "
        "                FROM documents GROUP BY lang), "
        "rates AS (SELECT lang, "
        f"         least(CAST(1.0 AS DOUBLE), CAST({_MIXTURE_BUDGET} AS DOUBLE)"
        f"               * n * {_MIX_CASE_SQL} / n_lang) "
        "            AS rate FROM counts), "
        "thr AS (SELECT lang, rate, "
        "        printf('%04x', CAST(floor(rate * 65536) AS INT)) AS t "
        "        FROM rates) "
        "SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.lang "
        "WHERE thr.rate >= 1.0 "
        "   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.t"
    ),
    tags=("sampling",),
)
def curate_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture sampling: hit a configured per-language share
    vector within a total budget, with keep rates DERIVED from measured
    counts — the step that turns "we want 30 % en / 20 % zh / …" into a
    concrete deterministic filter.  ``rate_l = min(1, B·n·share_l /
    n_l)`` (clamped when a language is scarcer than its target);
    membership is the md5-prefix of the key compared against the rate's
    16-bit hex threshold, so selection is a pure row-local predicate —
    re-runs, repartitioning, and engine changes keep the identical
    sample, and the scan never shuffles.  The per-language counts are
    the only driver state (k rows — model state, not data).  The
    identical arithmetic runs in the DuckDB oracle, so thresholds match
    bit-for-bit."""
    import math

    d = load_table(spark, sf_dir, "documents")
    counts = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    n = sum(counts.values())
    keep = None
    for lang, n_lang in sorted(counts.items()):
        share = _MIXTURE_SHARES.get(lang, 0.0)
        rate = min(1.0, _MIXTURE_BUDGET * n * share / n_lang)
        if rate >= 1.0:
            term = F.col("lang") == lang
        else:
            t = "%04x" % math.floor(rate * 65536)
            term = (F.col("lang") == lang) & (
                F.substring(_shuffle_key(F.col("doc_id")), 1, 4) < F.lit(t)
            )
        keep = term if keep is None else (keep | term)
    return d.filter(keep).select("doc_id", "lang")


@query(
    "curate_quality_report",
    oracle=(
        "WITH toks AS ("
        "  SELECT doc_id, lang, text, "
        "         len(list_filter(string_split(text, ' '), x -> x <> '')) "
        "           AS n_tokens "
        "  FROM documents), "
        "quality AS ("
        "  SELECT * FROM toks "
        "  WHERE length(text) >= 100 AND n_tokens >= 20), "
        "langkept AS ("
        "  SELECT * FROM quality "
        "  WHERE lang IN ('en', 'de', 'fr', 'es')), "
        "uniq AS ("
        "  SELECT * FROM ("
        "    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) "
        "                                 ORDER BY doc_id) AS rn "
        "    FROM langkept) WHERE rn = 1) "
        "SELECT * FROM (VALUES "
        "  (1, 'raw', (SELECT COUNT(*) FROM toks), "
        "      (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM toks)), "
        "  (2, 'quality', (SELECT COUNT(*) FROM quality), "
        "      (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM quality)), "
        "  (3, 'lang', (SELECT COUNT(*) FROM langkept), "
        "      (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM langkept)), "
        "  (4, 'dedup', (SELECT COUNT(*) FROM uniq), "
        "      (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM uniq))) "
        "AS t(step, stage, n_docs, n_tokens)"
    ),
    tags=("pipeline",),
)
def curate_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel observability: document and token survival after
    each gate of the standard crawl-curation pipeline (raw → quality
    length/token gate → language allowlist → exact dedup).  This is the
    report every corpus run ships next to its output — where did the
    tokens go?

    Execution is ONE pass, not four: each gate becomes a boolean column,
    a single aggregate computes every stage's (docs, tokens) pair with
    conditional sums, and the four report rows are unpivoted from that
    1-row frame (stack is driver-free).  The corpus is scanned once and
    only aggregate cells move — at 100 TB the report costs one scan;
    four CTE re-scans (the oracle's shape, fine for DuckDB's readable
    re-derivation) would cost four."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "n_tokens"
        ),
    )
    q = (F.length("text") >= 100) & (F.col("n_tokens") >= 20)
    lg = q & F.col("lang").isin("en", "de", "fr", "es")
    # first-doc-wins uniqueness among the lang-kept set only: rejected
    # rows get a non-hex singleton partition key so they can never share
    # (and thus never steal) a kept row's fingerprint partition
    flags = toks.withColumn(
        "rn_lang",
        F.row_number().over(
            Window.partitionBy(F.when(lg, F.md5(F.col("text"))).otherwise(
                F.concat(F.lit("!"), F.col("doc_id").cast("string"))
            )).orderBy("doc_id")
        ),
    ).select(
        "n_tokens",
        q.alias("pass_q"),
        lg.alias("pass_lang"),
        (lg & (F.col("rn_lang") == 1)).alias("pass_uniq"),
    )
    cell = flags.agg(
        F.count(F.lit(1)).alias("d1"),
        F.sum("n_tokens").alias("t1"),
        F.count(F.when(F.col("pass_q"), 1)).alias("d2"),
        F.coalesce(F.sum(F.when(F.col("pass_q"), F.col("n_tokens"))), F.lit(0)).alias("t2"),
        F.count(F.when(F.col("pass_lang"), 1)).alias("d3"),
        F.coalesce(F.sum(F.when(F.col("pass_lang"), F.col("n_tokens"))), F.lit(0)).alias("t3"),
        F.count(F.when(F.col("pass_uniq"), 1)).alias("d4"),
        F.coalesce(F.sum(F.when(F.col("pass_uniq"), F.col("n_tokens"))), F.lit(0)).alias("t4"),
    )
    return cell.select(
        F.expr(
            "stack(4, "
            "1, 'raw', d1, t1, "
            "2, 'quality', d2, t2, "
            "3, 'lang', d3, t3, "
            "4, 'dedup', d4, t4) AS (step, stage, n_docs, n_tokens)"
        )
    )
