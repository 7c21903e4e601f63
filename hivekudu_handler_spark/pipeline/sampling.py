"""Deterministic sampling and dataset splitting for training-data
pipelines.

At 100 TB, `TABLESAMPLE`/`df.sample()` are the wrong tool for holdout
construction: they are seed- and partitioning-dependent, so re-runs (or
engine swaps) move documents across splits.  The industry-standard fix is
content/key-addressed bucketing — hash a stable key, bucket on the
digest — which is reproducible across engines, runs, cluster sizes, and
even across this engine and the DuckDB oracle (both compute the same md5
of the same key).  No reference-parity surface here (the reference has no
sampling, SURVEY.md §2.11); these are north-star pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table

# First hex digit of md5(key): 16 equiprobable buckets.  '0'-'2' ≈ 3/16.
_SAMPLE_BUCKETS = ("0", "1", "2")


def _bucket(col):
    return F.substring(F.md5(col.cast("string")), 1, 1)


@query(
    "sample_hash",
    oracle=(
        "SELECT doc_id, text FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')"
    ),
    tags=("pipeline", "sampling"),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~3/16 sample by md5-bucket of the primary key.
    Unlike ``df.sample(fraction, seed)``, membership is a pure function
    of the row key: stable under re-runs, repartitioning, and engine
    changes, and the predicate is a cheap per-row expression (no shuffle,
    fully pipelined into the scan)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_bucket(F.col("doc_id")).isin(*_SAMPLE_BUCKETS)).select(
        "doc_id", "text"
    )


@query(
    "sample_stratified",
    oracle=(
        "SELECT doc_id, lang FROM documents "
        "WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) "
        "       IN ('0','1','2','3')) "
        "   OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) "
        "       IN ('0','1','2','3','4','5','6','7'))"
    ),
    tags=("pipeline", "sampling"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates: keep 4/16 of the
    over-represented language ('en' is ~44% of the fixture corpus) and
    8/16 of everything else — the canonical corpus-rebalancing pass of a
    training-data pipeline.  Same md5-bucket mechanics as
    ``sample_hash``: membership is a pure function of (key, stratum), so
    rates can be re-tuned per stratum without reshuffling rows a
    different stratum kept, and the predicate pipelines into the scan
    (no shuffle, no per-stratum pass)."""
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    keep = ((F.col("lang") == "en") & b.isin("0", "1", "2", "3")) | (
        (F.col("lang") != "en")
        & b.isin("0", "1", "2", "3", "4", "5", "6", "7")
    )
    return d.filter(keep).select("doc_id", "lang")


@query(
    "split_train_test",
    oracle=(
        "SELECT doc_id, "
        "  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') "
        "       THEN 'test' ELSE 'train' END AS split "
        "FROM documents"
    ),
    tags=("pipeline", "sampling"),
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/test assignment (⅛ test) by key digest —
    the split survives data growth: adding documents never moves an
    existing document between splits (per-key function, not a quantile
    or a seeded shuffle).  Downstream, each split is a pushdown-friendly
    filter on this label."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(_bucket(F.col("doc_id")).isin("0", "1"), "test")
        .otherwise("train")
        .alias("split"),
    )
