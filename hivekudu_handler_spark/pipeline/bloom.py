"""Bloom-filter dedup prefilter — the batch-ingest admission path.

Reference parity: the reference's ingest surface is the insert session
(``HiveKuduTableOutputFormat.java:96-311``) against a keyed store whose
primary key enforces uniqueness; a scaled ingest pipeline puts an
admission filter IN FRONT of that store so the common case (a brand-new
document) never pays a store lookup.  This module is that admission
filter, Spark-first.

Why a Bloom filter at 100 TB: the corpus fingerprint set is far too big
to broadcast exactly, and shuffling every batch row into a repartition
join against the full corpus means the 99% of rows that are NEW still
pay a corpus-sized shuffle.  A Bloom bitmap over corpus fingerprints is
megabytes (m bits), broadcasts everywhere, and definitively clears
non-duplicates map-side — only the bloom HITS (true dups + fpp of the
batch) enter the exact verification join, so the expensive path is
sized by the duplicate rate, not the batch.

Construction is Spark-native and fully distributed (PySpark exposes no
``DataFrame.stat.bloomFilter``; building it as a DataFrame aggregation
is also strictly better at scale — partial ``bit_or`` combines map-side,
so the shuffle moving bitmap fragments is at most
``words × shuffle.partitions`` longs, and the result stays a DataFrame
that can be persisted/reused instead of a driver-side object):

1. fingerprint = md5(normalized text) — the same cross-engine-stable
   normalization the exact dedup family uses;
2. k = 5 positions per fingerprint via seeded xxhash64 (engine-internal
   only — the oracle never needs to reproduce the bloom, see below),
   each mapped to (word index, bit-in-word mask) over an m = 2^20-bit
   space;
3. the bitmap is ``groupBy(word).agg(bit_or(mask))`` — ≤ m/64 = 16384
   rows regardless of corpus size;
4. batch probe: explode the same k positions, broadcast-join the bitmap,
   a row is a candidate iff ALL k probed bits are set (a missing word
   row is an unset word — left join + coalesce(0));
5. candidates exact-verify (equi-join on the full fingerprint against
   the corpus); survivors of the anti-join are admitted.

Correctness does NOT rest on bloom tuning: false positives are removed
by step 5, and false negatives are impossible by construction (probe
and build share the position function on the same fingerprints), so the
admitted set is EXACTLY "batch docs whose fingerprint is not in the
corpus" — which is what the DuckDB oracle states in one NOT EXISTS.
Bloom sizing only moves the cost of step 5 (m = 2^20, k = 5 gives
fpp < 1e-4 up to ~50k corpus keys; production sizes m from the corpus
key count — at 10^10 keys and fpp 1%, m ≈ 12 GB of bits sharded by
fingerprint prefix into per-shard bitmaps, each still broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.pipeline.text import normalized
from hivekudu_handler_spark.tables import load_table

_BLOOM_M_BITS = 1 << 20  # bitmap size (bits); 16384 64-bit words
_BLOOM_K = 5  # probes per key
_BLOOM_WORDS = _BLOOM_M_BITS // 64

# Same ingest-batch split as pipeline/dedup.py's incremental family, so
# the keys compose into one coherent ingest story.
_BLOOM_BATCH_SQL = "source IN ('src15','src16','src17','src18','src19')"


def _positions(fp: F.Column) -> F.Column:
    """array<struct<word int, mask long>> — the k probed bit positions of
    fingerprint ``fp``.  The k hashes are xxhash64 over the pair
    ``(fp, i)`` for i in 0..k-1 — PySpark's ``xxhash64`` takes no seed
    argument (its seed is fixed at 42); independence comes from hashing
    the loop index as an extra column, and build/probe share this exact
    function so the positions always agree.  pmod keeps positions
    non-negative."""
    out = []
    for seed in range(_BLOOM_K):
        bit = F.pmod(F.xxhash64(fp, F.lit(seed)), F.lit(_BLOOM_M_BITS))
        # F.shiftleft only takes a literal shift amount; the SQL builtin
        # accepts a column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (bit % 64).cast("int")
        )
        out.append(
            F.struct((bit / 64).cast("int").alias("word"), mask.alias("mask"))
        )
    return F.array(*out)


def bloom_build(keys: DataFrame, key_col: str = "fp") -> DataFrame:
    """(word int, bits long) bitmap over ``keys[key_col]``.

    Map-side partial bit_or means the shuffle carries bitmap fragments
    (≤ words × partitions rows), never the key set."""
    return (
        keys.select(F.explode(_positions(F.col(key_col))).alias("p"))
        .select(F.col("p.word").alias("word"), F.col("p.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    batch: DataFrame,
    bitmap: DataFrame,
    key_col: str = "fp",
    broadcast_hits: bool = True,
) -> DataFrame:
    """``batch`` plus boolean ``bloom_hit`` — True iff every one of the
    key's k bits is set in ``bitmap``.  The bitmap side is broadcast
    (≤ 16384 rows by construction).

    Two join strategies for re-attaching the per-key verdicts:

    - ``broadcast_hits=True`` (default): broadcast the ``hits`` table so
      the batch itself never shuffles.  NOTE the bound — ``hits`` is one
      row per DISTINCT batch fingerprint, which is sized by the INGEST
      BATCH, not by the bloom (an unusually large batch can exceed the
      8 GB driver/broadcast limit even though the bitmap never does).
    - ``broadcast_hits=False``: plain equi-join on the fingerprint —
      one batch-sized shuffle, safe at any batch size.  Use past the
      point where distinct batch keys stop being broadcast-sized.
    """
    probes = batch.select(
        key_col, F.explode(_positions(F.col(key_col))).alias("p")
    ).select(key_col, F.col("p.word").alias("word"), F.col("p.mask").alias("mask"))
    hits = (
        probes.join(F.broadcast(bitmap), "word", "left")
        .withColumn(
            "hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0),
        )
        .groupBy(key_col)
        .agg(F.min("hit").alias("bloom_hit"))
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    return batch.join(hits, key_col)


@query(
    "dedup_bloom_prefilter",
    oracle=(
        "SELECT b.doc_id, b.n_chars FROM documents b "
        f"WHERE {_BLOOM_BATCH_SQL.replace('source', 'b.source')} "
        "  AND NOT EXISTS ("
        "    SELECT 1 FROM documents c "
        f"   WHERE NOT ({_BLOOM_BATCH_SQL.replace('source', 'c.source')}) "
        "      AND md5(trim(regexp_replace(lower(c.text), '[^a-z0-9]+', ' ', 'g')))"
        "        = md5(trim(regexp_replace(lower(b.text), '[^a-z0-9]+', ' ', 'g'))))"
    ),
    tags=("dedup",),
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit the ingest batch's genuinely-new documents: Bloom prefilter
    against the corpus fingerprint set, exact verify of the hits only.

    The oracle is the plain NOT EXISTS on exact fingerprints — valid
    because the bloom stage can only send EXTRA rows to verification
    (false positives, removed by the equi-join), never hide a duplicate
    (no false negatives by construction).  Plan shape pinned in
    tests/test_plans.py: the bitmap and hit tables broadcast; the only
    corpus-sized exchanges are the bitmap build's word-fragment shuffle
    and the verify join over bloom hits."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(normalized()).alias("fp")
    is_batch = F.expr(_BLOOM_BATCH_SQL)
    # NULL-fingerprint seam, pinned on BOTH engines: a NULL text yields a
    # NULL fingerprint, which the oracle's NOT EXISTS ADMITS (NULL never
    # equals anything) — but an inner equi-join on fp would silently drop
    # it.  So NULL-fp batch rows bypass the bloom entirely and are
    # admitted directly, and the corpus side drops NULL keys before the
    # bitmap build (they can never match an exact verify anyway).
    corpus = d.filter(~is_batch).select(fp).filter(F.col("fp").isNotNull())
    batch_all = d.filter(is_batch).select("doc_id", "n_chars", fp)
    null_fp_admitted = batch_all.filter(F.col("fp").isNull())
    batch = batch_all.filter(F.col("fp").isNotNull())

    bitmap = bloom_build(corpus)
    # materialize the probed batch once: both output branches (misses
    # pass through, hits verify) consume it, and without the checkpoint
    # each Union branch re-runs the whole probe lineage — including a
    # second bitmap build over the corpus.  Batch-sized, so the
    # checkpoint is bounded at any corpus scale.
    probed = bloom_probe(batch, bitmap).localCheckpoint(eager=True)
    candidates = probed.filter(F.col("bloom_hit"))
    misses = probed.filter(~F.col("bloom_hit"))

    # exact verification of the (dup-rate-sized) candidate set only
    survivors = candidates.join(corpus.distinct(), "fp", "left_anti")
    return (
        misses.select("doc_id", "n_chars")
        .unionByName(survivors.select("doc_id", "n_chars"))
        .unionByName(null_fp_admitted.select("doc_id", "n_chars"))
    )
