"""UDF / UDAF surface (SURVEY.md §2.10).

The reference has no UDFs of its own; Hive's UDF registry was its
extension seam (ObjectInspector machinery, ``HiveKuduSerDe.java:92-99``,
``HiveKuduBridgeUtils.java:70-97``).  The Spark-native seam is the
Arrow-vectorized pandas UDF tier; these keys prove the seam end-to-end
with deterministic functions whose semantics the DuckDB oracle can state
in plain SQL.

UDF objects are created inside the query functions (not at import time):
``pandas_udf`` needs an active SparkSession, and operator modules must
import cleanly before any session exists.

Scale note: both UDFs are Arrow-batched (columnar transfer, numpy inner
loop).  They exist to demonstrate the extension point — equivalent logic
stays in built-in expressions whenever possible (see functions/scalar.py),
because built-ins run codegen'd in the JVM.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "udf_scalar_pandas",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_revenue "
        "FROM lineitem"
    ),
    tags=("udf",),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (Series→Series) pandas UDF; per-row double arithmetic is
    IEEE-exact across engines so the oracle is the plain expression."""

    @pandas_udf("double")
    def net_revenue(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_revenue("l_extendedprice", "l_discount", "l_tax").alias("net_revenue"),
    )


@query(
    "udf_grouped_agg",
    oracle=(
        "SELECT l_returnflag, "
        "       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) "
        "         AS weighted_avg_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    tags=("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF seam): quantity-weighted
    average price per return flag."""

    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else 0.0

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_price("l_extendedprice", "l_quantity"), 4
        ).alias("weighted_avg_price")
    )


@query(
    "udtf_explode_tokens",
    oracle=(
        "SELECT doc_id, unnest(string_split(substr(text, 1, 60), ' ')) AS token "
        "FROM documents WHERE doc_id < 50"
    ),
    tags=("udf",),
)
def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style fan-out (1 row → N rows) via explode — the Spark
    equivalent of a Hive UDTF (SURVEY.md §2.10)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.explode(F.split(F.substring("text", 1, 60), " ")).alias("token"),
    )
