"""Scalar function families (SURVEY.md §2.8).

The reference constrains the *types* these run on (the 10-type lattice,
``HiveKuduBridgeUtils.java:36-68``); Hive supplied the functions
(``pom.xml:28-32``).  Every function here is a built-in
``pyspark.sql.functions`` call — JVM-side, codegen'd, no Python in the row
path — which is the whole point of the Spark-first design.

Cross-engine notes baked into the oracles:
* per-row double arithmetic is IEEE-bit-exact across engines; per-row
  ROUND is not (see operators/scans.py) — transcendentals (exp/ln/sqrt)
  are emitted rounded to 6 since libm implementations may differ.
* DuckDB ``floor``/``ceil`` return DOUBLE, Spark BIGINT → cast in SQL.
* Spark ``pmod`` has no DuckDB twin → ``((a % b) + b) % b``.
* double→int CAST truncates in Spark but rounds in DuckDB → oracle uses
  ``CAST(trunc(x) ...)`` to pin truncation semantics (documented
  divergence, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


@query(
    "fn_string",
    oracle=(
        "SELECT doc_id, "
        "       upper(source) AS src_up, "
        "       lower(lang) AS lang_lo, "
        "       length(text) AS text_len, "
        "       substr(text, 1, 12) AS prefix, "
        "       trim(' ' || source || ' ') AS src_trim, "
        "       source || ':' || lang AS src_lang, "
        "       instr(text, 'spark') AS spark_pos, "
        "       regexp_extract(source, 'src([0-9]+)', 1) AS src_num, "
        "       regexp_replace(text, '[aeiou]', '_', 'g') LIKE '%sp_rk%' AS has_spark, "
        "       len(string_split(text, ' ')) AS n_tokens "
        "FROM documents"
    ),
    tags=("fn",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substr/case/trim/length/instr/regexp/split."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("source").alias("src_up"),
        F.lower("lang").alias("lang_lo"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 12).alias("prefix"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("src_trim"),
        F.concat_ws(":", "source", "lang").alias("src_lang"),
        F.instr(F.col("text"), "spark").alias("spark_pos"),
        F.regexp_extract("source", r"src([0-9]+)", 1).alias("src_num"),
        F.regexp_replace("text", "[aeiou]", "_").like("%sp_rk%").alias("has_spark"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


@query(
    "fn_date",
    oracle=(
        "SELECT o_orderkey, "
        "       CAST(year(o_orderdate) AS INT) AS yr, "
        "       CAST(month(o_orderdate) AS INT) AS mo, "
        "       CAST(day(o_orderdate) AS INT) AS dy, "
        "       CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow, "
        "       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, "
        "       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) "
        "         AS days_since_epoch_start, "
        "       o_orderdate + INTERVAL 30 DAY AS due_date, "
        "       CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts, "
        "       CAST(o_orderdate AS DATE) + 7 AS plus_week, "
        "       CAST(o_orderdate AS DATE) - 7 AS minus_week, "
        "       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str "
        "FROM orders"
    ),
    tags=("fn",),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp family (millis-precision boundary per SURVEY.md §1.3):
    extraction, ``date_trunc``, ``datediff``, interval arithmetic, the
    named ``date_add``/``date_sub`` forms, ``unix_timestamp`` and
    ``from_unixtime`` (round-trip through the epoch, session tz pinned
    UTC).

    DuckDB ``dayofweek`` is 0=Sunday while Spark's is 1=Sunday — the
    oracle adds 1 to pin a single convention.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.date_add("o_orderdate", 7).alias("plus_week"),
        F.date_sub("o_orderdate", 7).alias("minus_week"),
        F.from_unixtime(F.unix_timestamp("o_orderdate")).alias("ts_str"),
    )


@query(
    "fn_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "       abs(l_discount - 0.05) AS abs_disc, "
        "       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price, "
        "       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price, "
        "       round(power(l_quantity, 2), 6) AS qty_sq, "
        "       round(sqrt(l_extendedprice), 6) AS sqrt_price, "
        "       round(ln(l_extendedprice + 1), 6) AS ln_price, "
        "       round(exp(l_discount), 6) AS exp_disc, "
        "       ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS pmod7 "
        "FROM lineitem"
    ),
    tags=("fn",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/exp/ln/sqrt/pmod."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pmod7"),
    )


@query(
    "fn_cond",
    oracle=(
        "SELECT o_orderkey, "
        "       CASE WHEN o_totalprice > 300000 THEN 'high' "
        "            WHEN o_totalprice > 100000 THEN 'mid' "
        "            ELSE 'low' END AS price_band, "
        "       CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open, "
        "       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending, "
        "       CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' "
        "            THEN o_orderpriority ELSE NULL END AS urgent_prio "
        "FROM orders"
    ),
    tags=("fn",),
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN / if / coalesce / nullif."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_pending"
        ),
        F.when(
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%"),
            F.col("o_orderpriority"),
        ).alias("urgent_prio"),
    )


@query(
    "fn_cast",
    oracle=(
        "SELECT l_orderkey, "
        "       CAST(l_linenumber AS BIGINT) AS line_big, "
        "       CAST(l_linenumber AS SMALLINT) AS line_small, "
        "       CAST(l_linenumber AS TINYINT) AS line_tiny, "
        "       CAST(l_quantity AS VARCHAR) AS qty_str, "
        "       CAST(trunc(l_extendedprice) AS BIGINT) AS price_int, "
        "       CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip, "
        "       CAST(l_linenumber AS DOUBLE) AS line_dbl, "
        "       CAST(l_quantity > 25 AS BOOLEAN) AS qty_big "
        "FROM lineitem"
    ),
    tags=("fn",),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across the §1.3 lattice: int widths, string round-trip,
    double→int truncation (Spark semantics pinned via trunc in the
    oracle), numeric→boolean."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_str = F.col("l_quantity").cast("string")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_linenumber").cast("smallint").alias("line_small"),
        F.col("l_linenumber").cast("tinyint").alias("line_tiny"),
        qty_str.alias("qty_str"),
        F.col("l_extendedprice").cast("bigint").alias("price_int"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        (F.col("l_quantity") > 25).alias("qty_big"),
    )


@query(
    "fn_hash",
    oracle=(
        "SELECT doc_id, "
        "       md5(text) AS text_md5, "
        "       sha256(source) AS src_sha256, "
        "       base64(encode(lang)) AS lang_b64, "
        "       bin(CAST(doc_id AS BIGINT)) AS id_bin "
        "FROM documents"
    ),
    tags=("fn",),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/binary family: md5 / sha2 / base64 / bin."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("source", 256).alias("src_sha256"),
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.bin(F.col("doc_id")).alias("id_bin"),
    )


@query(
    "fn_json",
    oracle=(
        "SELECT event_id, event_type, "
        "       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, "
        "       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed "
        "FROM events "
        "WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50"
    ),
    tags=("fn", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the ``events.props`` payload column — both the
    path-expression form (``get_json_object``) and the schema-full parse
    (``from_json`` to a typed struct).  The reference's core type lattice
    rejected complex types (``HiveKuduBridgeUtils.java:101-111``); JSON
    payload columns re-enter via the north-star multimodal/semi-structured
    surface.  At scale the filter on the extracted value cannot be pushed
    to Parquet (opaque string), so the plan reads only (event_id,
    event_type, props) — column pruning still applies."""
    ev = load_table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("int")
    k_typed = F.from_json("props", "k INT")["k"]
    return ev.select(
        "event_id",
        "event_type",
        k_path.alias("k_val"),
        k_typed.alias("k_typed"),
    ).filter(k_path >= 50)


@query(
    "fn_array",
    oracle=(
        "WITH s AS (SELECT vec_id, embedding, "
        "                  list_sort(list_slice(embedding, 1, 4)) AS sh "
        "           FROM embeddings) "
        "SELECT vec_id, "
        "       CAST(len(embedding) AS BIGINT) AS dim, "
        "       CAST(embedding[1] AS DOUBLE) AS first_elem, "
        "       CAST(sh[1] AS DOUBLE) AS head_1, "
        "       CAST(sh[2] AS DOUBLE) AS head_2, "
        "       CAST(sh[3] AS DOUBLE) AS head_3, "
        "       CAST(sh[4] AS DOUBLE) AS head_4, "
        "       sqrt(list_sum(list_transform(embedding, "
        "            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm "
        "FROM s"
    ),
    tags=("fn", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function family over the embedding column —
    size, element access, slice+sort, and an aggregate fold (L2 norm).
    The reference's type bridge rejected LIST/MAP outright
    (``HiveKuduBridgeUtils.java:101-111``); ArrayType columns are the
    deliberate north-star lift that powers the similarity-search surface.
    All expressions are JVM-side Catalyst higher-order functions — no
    Python UDF in the loop, so whole-stage codegen applies at 100 TB.

    The sorted head is emitted as four scalar DOUBLE columns rather than
    an ``array<float>``: the verification driver canonicalizes results
    via pandas ``sort_values``, which cannot hash list cells (official
    r2 failure), and scalar outputs keep the comparison engine-neutral.
    Float->double casts are exact, so values are bit-identical to the
    DuckDB oracle's."""
    e = load_table(spark, sf_dir, "embeddings")

    def _sq_acc(acc, x):
        return acc + x.cast("double") * x.cast("double")

    # Two-step select: materialize the sorted slice once so CollapseProject
    # does not re-inline one sort per consumed element.
    s = e.select(
        "vec_id",
        "embedding",
        F.sort_array(F.slice("embedding", 1, 4)).alias("sh"),
    )
    return s.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.col("embedding")[0].cast("double").alias("first_elem"),
        F.col("sh")[0].cast("double").alias("head_1"),
        F.col("sh")[1].cast("double").alias("head_2"),
        F.col("sh")[2].cast("double").alias("head_3"),
        F.col("sh")[3].cast("double").alias("head_4"),
        F.sqrt(F.aggregate("embedding", F.lit(0.0), _sq_acc)).alias("l2_norm"),
    )


@query(
    "fn_bitwise",
    oracle=(
        "SELECT o_orderkey, "
        "       o_orderkey & 255 AS low_byte, "
        "       o_orderkey | 15 AS or_mask, "
        "       xor(o_orderkey, o_custkey) AS key_xor, "
        "       CAST(bit_count(o_orderkey) AS INT) AS popcount, "
        "       o_orderkey << 2 AS shl2, "
        "       o_orderkey >> 3 AS shr3 "
        "FROM orders"
    ),
    tags=("fn",),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (&, |, XOR, popcount, shifts) over the
    key columns — the primitives the hash/bucket/bloom layers build on
    (Hive exposes the same set as &,|,^,<<,>> builtins).  All pure
    codegen'd JVM expressions; popcount (``bit_count``) is the one the
    SimHash/Hamming dedup path leans on.  Shifts are width-preserving on
    BIGINT in both engines for these magnitudes, so results are exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & CAST(255 AS BIGINT)").alias("low_byte"),
        F.expr("o_orderkey | CAST(15 AS BIGINT)").alias("or_mask"),
        F.expr("o_orderkey ^ o_custkey").alias("key_xor"),
        F.bit_count("o_orderkey").cast("int").alias("popcount"),
        F.shiftleft("o_orderkey", 2).alias("shl2"),
        F.shiftright("o_orderkey", 3).alias("shr3"),
    )
