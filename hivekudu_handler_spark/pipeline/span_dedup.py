"""Span-level (substring) duplicate detection over ``documents``.

Training-data pipelines remove *repeated substrings*, not just whole
near-duplicate documents (the public ExactSubstr method of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"):
verbatim boilerplate, licenses, and templated passages recur across
otherwise-distinct documents.  ``dedup_span_ngram`` finds, for every
document, the merged token spans covered by at least one n-gram (n=5,
whitespace tokens) that also occurs in some *other* document.

Plan (all JVM expressions; suffix-array semantics by n-gram cover):

1. tokenize → positioned n-grams, built array-side (``transform`` over a
   ``sequence`` of start offsets + ``slice``) so the explode emits final
   (doc, pos, gram) rows with no Python in the loop;
2. fingerprint each gram with the (xxhash64, murmur3) pair — 96 bits, so
   cross-doc false-positive collisions are negligible at trillions of
   grams (the exact-string oracle is collision-free; a production run can
   re-verify flagged spans textually the way `dedup_ann_verified` does);
3. inverted index on the fingerprint: ``min(doc_id) != max(doc_id)``
   marks grams seen in ≥2 docs — cheaper than a count-distinct and the
   group-by + left-semi probe reuse one hash partitioning;
4. per-doc interval merge of surviving positions (gaps-and-islands with a
   running ``max(pos+n-1)``), one window shuffle on ``doc_id`` that the
   final span fold reuses (subset-key clustering).

Scale: the exploded gram table is ~|tokens| rows of (int64, int32×2,
int64) ≈ 24 B/token — the same order as the corpus itself and the same
cost class as the shingle index ``dedup_ngram_jaccard`` already carries;
everything downstream of step 3 is collapsed spans only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

N_GRAM = 5


def positioned_grams(docs: DataFrame, n: int = N_GRAM) -> DataFrame:
    """(doc_id, pos, g): every length-``n`` token window, 1-based start
    position.  Documents shorter than ``n`` tokens contribute nothing
    (``sequence`` would run descending on a negative span — filtered
    first)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= n
    )
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice("t", i, n)),
    )
    return toks.select(
        "doc_id", F.posexplode(gram_arr).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")


@query(
    "dedup_span_ngram",
    oracle=(
        "WITH toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
        "grams AS ("
        "  SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS g "
        "  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)), "
        "dupg AS ("
        "  SELECT g FROM grams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)), "
        "dup_pos AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)), "
        "marked AS ("
        "  SELECT doc_id, pos, "
        "         CASE WHEN pos <= MAX(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos "
        "              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1 "
        "         THEN 0 ELSE 1 END AS is_new FROM dup_pos), "
        "islands AS ("
        "  SELECT doc_id, pos, SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos "
        "         ROWS UNBOUNDED PRECEDING) AS span_id FROM marked) "
        "SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start, "
        "       CAST(MAX(pos) + 4 AS INT) AS span_end, "
        "       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS INT) AS span_tokens "
        "FROM islands GROUP BY doc_id, span_id "
        "ORDER BY doc_id, span_start"
    ),
    tags=("dedup", "slow"),
)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged cross-doc duplicate token spans per document (inclusive
    1-based [span_start, span_end])."""
    n = N_GRAM
    docs = load_table(spark, sf_dir, "documents")
    grams = positioned_grams(docs, n)
    fp = grams.select(
        "doc_id", "pos", F.xxhash64("g").alias("f1"), F.hash("g").alias("f2")
    )
    dup = (
        fp.groupBy("f1", "f2")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("f1", "f2")
    )
    dup_pos = fp.join(dup, ["f1", "f2"], "left_semi").select("doc_id", "pos")

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup_pos.withColumn(
        "is_new",
        F.when(
            F.col("pos") <= F.max(F.col("pos") + (n - 1)).over(w_prev) + 1,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("span_id", F.sum("is_new").over(w_run))
    return (
        islands.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("int").alias("span_end"),
            (F.max("pos") + (n - 1) - F.min("pos") + 1).cast("int").alias("span_tokens"),
        )
        .drop("span_id")
        .orderBy("doc_id", "span_start")
    )
