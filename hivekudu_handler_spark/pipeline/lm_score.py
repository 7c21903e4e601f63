"""Bigram language-model scoring over the ``documents`` table.

The classic corpus-quality signal (CCNet / Gopher style): score each
document by the average negative log-probability of its token bigrams
under a language model fitted on the corpus itself.  Real pipelines use
a KenLM 5-gram trained on a reference corpus; the engine-relevant part —
the part that must scale and that this key pins cross-engine — is the
count/score dataflow, which is identical at any n-gram order:

1. bigram instances from each document (array ``zip_with`` against the
   shifted self — pure JVM codegen, zero shuffle);
2. corpus bigram counts (one shuffle keyed on the bigram — map-side
   combine absorbs the explode fanout, the result is vocabulary-sized,
   ≪ corpus);
3. context counts per first token (an aggregate OVER the bigram vocab,
   not the corpus — cheap);
4. score: each instance joins its corpus statistics back on the bigram
   key (AQE broadcasts the vocab side when small; at web scale the
   token-aligned shuffle join is the right plan and needs no hint), then
   one per-document aggregate.

No smoothing is needed: the model is fitted on the scored corpus, so
every bigram instance has count ≥ 1 and P(w₂|w₁) ∈ (0, 1].  The
conditional is ``count(w1 w2) / Σ_w count(w1 w)`` — a proper
distribution per context (sums to 1), denominator = the context count,
NOT the raw unigram count (doc-final tokens never open a bigram).

Cross-engine float discipline (same as ``text_tfidf``): per-instance
neg-log-probs round at 6 dp, the per-document mean rounds at 4 dp, so
summation-order noise stays far below the reported grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline.text import _TOKENS_SQL, tokens
from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

_LM_SQL = (
    "WITH toks AS ("
    f"  SELECT doc_id, list_filter({_TOKENS_SQL}, x -> x <> '') AS w "
    "  FROM documents), "
    "big AS ("
    "  SELECT doc_id, "
    "         unnest(list_transform(range(1, len(w)), "
    "                               i -> w[i] || ' ' || w[i + 1])) AS bg "
    "  FROM toks WHERE len(w) >= 2), "
    "bgc AS (SELECT bg, COUNT(*) AS cb FROM big GROUP BY bg), "
    "ctx AS ("
    "  SELECT split_part(bg, ' ', 1) AS w1, SUM(cb) AS cw "
    "  FROM bgc GROUP BY w1), "
    "scored AS ("
    "  SELECT b.doc_id, "
    "         ROUND(-ln(c.cb * 1.0 / x.cw), 6) AS nlp "
    "  FROM big b "
    "  JOIN bgc c USING (bg) "
    "  JOIN ctx x ON split_part(b.bg, ' ', 1) = x.w1) "
    "SELECT doc_id, COUNT(*) AS n_bigrams, "
    "       ROUND(AVG(nlp), 4) AS lm_score "
    "FROM scored GROUP BY doc_id"
)


@query("text_lm_score", oracle=_LM_SQL, tags=("text",))
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram negative log-probability per document under a
    corpus-fitted bigram LM (lower = more typical of the corpus — the
    standard perplexity-proxy quality filter).

    Documents with fewer than two tokens have no bigrams and no score
    (they drop out in both engines identically)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.filter(tokens(), lambda x: x != "").alias("w")
    ).filter(F.size("w") >= 2)
    # bigram strings "w1 w2": the array zipped with its shifted self —
    # tokens are alphanumeric-only post-normalization, so ' ' is an
    # unambiguous separator (split_part recovers w1 exactly)
    n1 = F.size("w") - 1
    big = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("w", 1, n1),
                F.slice("w", 2, n1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    bgc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    ctx = bgc.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.sum("cb").alias("cw")
    )
    scored = (
        big.join(bgc, "bg")
        .join(ctx, F.substring_index(big["bg"], " ", 1) == ctx["w1"])
        .select(
            "doc_id",
            F.round(-F.log(F.col("cb") / F.col("cw")), 6).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nlp"), 4).alias("lm_score"),
    )
