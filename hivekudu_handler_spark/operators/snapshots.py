"""MVCC snapshot operators over the managed table layer (SURVEY.md §2.1).

Kudu parity: the reference's scan path rides a ``KuduScanner``
(``HiveKuduTableInputFormat.java:449-517``) whose underlying storage
engine is MVCC — ``READ_AT_SNAPSHOT`` scans, diff scans (Kudu's
incremental-backup primitive) and the ancient-history mark
(``--tablet_history_max_age_sec``) are first-class Kudu capabilities the
reference inherits.  The managed table layer reproduces them with
per-mutation version manifests + a file archive
(:mod:`hivekudu_handler_spark.sources.table_store`); these keys drive the
same golden scenario as the DDL/DML keys (``README.md:22-43``) through a
mutation sequence and check the point-in-time results.

Each key builds a scratch table, applies a deterministic mutation
sequence (insert v1 → upsert v2 → delete v3), and returns one observable:
the oracle is a VALUES literal of the expected state, exactly like the
other table-layer keys in :mod:`hivekudu_handler_spark.operators.ddl`.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.operators.ddl import _materialize, _scratch_store


def _mutated_store(spark: SparkSession):
    """Scratch table with the canonical 3-step mutation history.

    v0 create → v1 insert {1,2,3} → v2 upsert {2→B, +4} → v3 delete {1}.
    """
    store, d = _scratch_store(spark)
    store.create_table("snap", "id int, name string, score double", ["id"])
    store.insert_values("snap", [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    meta = store.table_meta("snap")
    store.upsert(
        "snap", spark.createDataFrame([(2, "B", 20.0), (4, "d", 4.0)], meta.schema)
    )
    store.delete_where("snap", "id = 1")
    return store, d


@query(
    "scan_snapshot",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a', CAST(1.0 AS DOUBLE)), (2, 'b', CAST(2.0 AS DOUBLE)), (3, 'c', CAST(3.0 AS DOUBLE))) "
        "AS t(id, name, score) ORDER BY id"
    ),
    tags=("table", "snapshot"),
)
def scan_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READ_AT_SNAPSHOT: the table exactly as of version 1, after later
    upserts rewrote bucket files and a delete removed a row — the
    displaced files are read from the archive, untouched ones from
    ``data/``."""
    store, d = _mutated_store(spark)
    try:
        return _materialize(
            spark, store.scan_snapshot("snap", 1).orderBy("id")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "table_history",
    oracle=(
        "SELECT * FROM (VALUES (0, 'create', 0), (1, 'insert', 3), "
        "(2, 'upsert', 4), (3, 'delete', 3)) "
        "AS t(version, op, n_files) ORDER BY version"
    ),
    tags=("table", "snapshot"),
)
def table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The committed version log: one manifest per mutation, file counts
    proving bucket-scoped rewrites (upsert adds one file to each of the
    batch's buckets; the delete rewrites one bucket into one file)."""
    store, d = _mutated_store(spark)
    try:
        return _materialize(spark, store.history("snap").orderBy("version"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "snapshot_diff",
    oracle=(
        "SELECT * FROM (VALUES (1, 'a', CAST(1.0 AS DOUBLE), 'delete'), "
        "(2, 'B', CAST(20.0 AS DOUBLE), 'update'), (4, 'd', CAST(4.0 AS DOUBLE), 'insert')) "
        "AS t(id, name, score, change_type) ORDER BY id"
    ),
    tags=("table", "snapshot"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kudu diff scan between v1 and v3: per-key net change with newer
    values (older for deletes).  Row 3 is absent — untouched keys never
    appear in a diff."""
    store, d = _mutated_store(spark)
    try:
        return _materialize(
            spark, store.diff("snap", 1, store.current_version("snap")).orderBy("id")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "table_vacuum",
    oracle=(
        "SELECT * FROM (VALUES (2, 'B', CAST(20.0 AS DOUBLE)), (3, 'c', CAST(3.0 AS DOUBLE)), (4, 'd', CAST(4.0 AS DOUBLE))) "
        "AS t(id, name, score) ORDER BY id"
    ),
    tags=("table", "snapshot"),
)
def table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancient-history mark: vacuum to the current version only, then
    prove the live table is untouched (the GC may only ever delete
    archive files no retained manifest references)."""
    store, d = _mutated_store(spark)
    try:
        store.vacuum("snap", keep_last=0)
        return _materialize(spark, store.scan("snap").orderBy("id"))
    finally:
        shutil.rmtree(d, ignore_errors=True)
