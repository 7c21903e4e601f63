"""Distributed BPE tokenizer training over the ``documents`` table.

Tokenizer induction is the step every LLM corpus pipeline runs before
packing: learn the merge table from the corpus, then re-tokenize the
corpus with it.  The public algorithm is Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units" (ACL 2016), as
productionized by the GPT-2/HF-tokenizers trainers — and those trainers
all share one structural insight this module is built around:

**BPE trains on the WORD-COUNT table, not the corpus.**  Merge learning
only needs (word, count) pairs; the corpus appears once, in the count
aggregation.  So the scale split is:

1. **word counts** — one corpus scan + one vocabulary-keyed shuffle with
   map-side combine (the same shape as ``text_tfidf``'s df stage).  The
   result is vocabulary-sized: Heaps' law puts a 100 TB web corpus at
   ~10⁷–10⁸ word types, kilobyte rows — and the driver collect is
   bounded by the ``_MAX_WORD_TYPES`` top-by-count cap (planned as
   TakeOrderedAndProject, no global sort).  This is the ONLY
   corpus-sized work in training.
2. **merge learning** — driver-side over the collected count table,
   exactly like HF-tokenizers' single-node trainer (the merge table is
   MODEL STATE: a few thousand string pairs).  Deterministic: best pair
   by (count DESC, pair lexicographic ASC), no RNG.
3. **apply** — the learned ranks broadcast; one Arrow-batched
   ``mapInPandas`` pass re-tokenizes each document greedily by lowest
   merge rank (the GPT-2 ``bpe()`` loop, vectorized per batch over a
   per-word memo cache — unique words per batch ≪ tokens per batch).

Oracle-backed since r10: merge learning IS SQL-expressible after all —
the r10 replay mechanism (``pipeline/replay.py::bpe_oracle``) unrolls
both the trainer's 64 merge iterations and the encoder's greedy loop as
MATERIALIZED CTEs over a (word, pos, sym) symbol table, and the
pipeline is float-free so the match is exact, not margin-protected.
tests/test_new_surface_r7.py additionally pins losslessness (tokens
re-join to the normalized words), determinism, monotone compression
(more merges → fewer tokens, bounded below by the word count), and
merge-table validity (every merge's parts are reachable: base chars or
earlier merge outputs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hivekudu_handler_spark.pipeline.replay import bpe_oracle
from hivekudu_handler_spark.pipeline.text import tokens
from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

_N_MERGES = 64

# Greedy-encode unroll depth for the SQL replay oracle: must be ≥ the
# corpus's max word length (fixtures: 8).  See replay.bpe_oracle.
_ORACLE_ENC_ITERS = 8
_END = "</w>"  # end-of-word sentinel, the classic BPE formulation

# Driver-collect bound for merge learning (r7 verdict): Heaps' law puts a
# 100 TB corpus at 10⁷–10⁸ word types, a multi-GB collect if unbounded.
# Cap at the top 2¹⁸ types by count — the same move as HF-tokenizers'
# vocab/alphabet limits: merge votes are count-weighted, so the extreme
# tail (rank ≫ 10⁵, counts ≈ 1) cannot flip a winning pair except in
# corner corpora, and bounding the model input is what makes the trainer
# run at all at scale.  Deterministic: ties broken by word ASC.
_MAX_WORD_TYPES = 1 << 18


def word_counts(d: DataFrame) -> DataFrame:
    """(word, cnt): the vocabulary-sized table BPE trains on — the one
    corpus-sized aggregation in the whole pipeline."""
    return (
        d.select(F.explode(F.filter(tokens(), lambda x: x != "")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_merges(
    counts: list[tuple[str, int]], n_merges: int = _N_MERGES
) -> list[tuple[str, str]]:
    """Classic BPE on a (word, count) list.  Deterministic: the best
    pair is (count DESC, pair ASC).  Driver-side by design — the input
    is the vocabulary, the output is the model."""
    seqs: dict[tuple[str, ...], int] = {}
    for w, c in counts:
        seqs[tuple(w) + (_END,)] = seqs.get(tuple(w) + (_END,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, c in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + c
        seqs = new_seqs
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy merge loop: repeatedly merge the present pair
    with the lowest rank."""
    seq = list(word) + [_END]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_fit(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _N_MERGES,
    max_word_types: int = _MAX_WORD_TYPES,
):
    d = load_table(spark, sf_dir, "documents")
    # top-N by (cnt DESC, word ASC): Catalyst plans sort+limit as
    # TakeOrderedAndProject — per-partition heaps, no global sort
    # shuffle — so the driver receives at most max_word_types rows no
    # matter the corpus size.
    capped = (
        word_counts(d)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_word_types)
    )
    counts = [
        (r["word"], r["cnt"])
        for r in capped.orderBy("word").collect()
    ]
    return d, learn_merges(counts, n_merges)


@query(
    "text_bpe_train",
    oracle=bpe_oracle(_N_MERGES, _ORACLE_ENC_ITERS, _MAX_WORD_TYPES),
    tags=("text",),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge table on the corpus, then re-tokenize every
    document with it.  Output per document: subword-token count, the
    character count of the normalized text it compresses, and the md5
    of the space-joined subword stream (drivers can hash strings, not
    lists).  The merge table itself is emitted in the per-corpus header
    row (doc_id = -1) as rank-ordered ``a+b`` strings so the learned
    model is part of the checked surface.

    Oracle-backed since r10 (``replay.bpe_oracle``): classic BPE is
    deterministic end-to-end — integer pair counts, (count DESC, pair
    ASC) tie-breaks, leftmost-first merges — so BOTH the trainer and the
    greedy encoder replay in unrolled SQL, and every per-document
    tokens_md5 plus the model-header md5 match exactly on all three
    fixtures.  No floats anywhere, so no knife edges either."""
    d, merges = bpe_fit(spark, sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("n_word_chars", T.LongType()),
            T.StructField("tokens_md5", T.StringType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        rk = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_n, out_c, out_h = [], [], []
            for words in pdf["w"]:
                toks: list[str] = []
                nchars = 0
                for w in words:
                    nchars += len(w)
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, rk)
                        memo[w] = enc
                    toks.extend(enc)
                out_n.append(len(toks))
                out_c.append(nchars)
                out_h.append(
                    hashlib.md5(" ".join(toks).encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bpe_tokens": pd.Series(out_n, dtype="int64"),
                    "n_word_chars": pd.Series(out_c, dtype="int64"),
                    "tokens_md5": out_h,
                }
            )

    per_doc = d.select(
        "doc_id", F.filter(tokens(), lambda x: x != "").alias("w")
    ).mapInPandas(encode, schema)
    import hashlib

    model_md5 = hashlib.md5(
        " ".join(a + "+" + b for a, b in merges).encode()
    ).hexdigest()
    header = spark.createDataFrame(
        [(-1, len(merges), 0, model_md5)], schema
    )
    return header.unionByName(per_doc)
