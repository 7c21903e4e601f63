"""Span-level duplicate detection: structural + semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.pipeline.span_dedup import (
    N_GRAM,
    dedup_span_ngram,
    positioned_grams,
)
from hivekudu_handler_spark.tables import load_table


def test_spans_well_formed_and_disjoint(spark, sf_dir):
    spans = dedup_span_ngram(spark, sf_dir).collect()
    assert spans, "fixture contains near-dup docs; expected duplicate spans"
    by_doc: dict[int, list] = {}
    for r in spans:
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["span_tokens"] >= N_GRAM
        assert r["span_start"] >= 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["span_start"])
        for a, b in zip(rows, rows[1:]):
            # merged output: the next span starts past an un-mergeable gap
            assert b["span_start"] > a["span_end"] + 1


def test_spans_stay_inside_document(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    bad = (
        dedup_span_ngram(spark, sf_dir)
        .join(docs, "doc_id")
        .filter(F.col("span_end") > F.col("n_tok"))
        .count()
    )
    assert bad == 0


def test_flagged_grams_really_occur_elsewhere(spark, sf_dir):
    """The n-gram at each span start must appear verbatim in at least one
    OTHER document — the exact-string ground truth behind the
    fingerprint path."""
    docs = load_table(spark, sf_dir, "documents")
    grams = positioned_grams(docs)
    starts = dedup_span_ngram(spark, sf_dir).select(
        "doc_id", F.col("span_start").alias("pos")
    )
    start_grams = grams.join(starts, ["doc_id", "pos"], "inner").select(
        "doc_id", "g"
    )
    others = grams.select(F.col("doc_id").alias("od"), "g").distinct()
    orphan = (
        start_grams.join(others, "g")
        .groupBy("doc_id", "g")
        .agg(F.max((F.col("od") != F.col("doc_id")).cast("int")).alias("elsewhere"))
        .filter(F.col("elsewhere") == 0)
        .count()
    )
    assert orphan == 0


def test_short_documents_are_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert positioned_grams(df).count() == 0
