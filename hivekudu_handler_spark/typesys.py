"""Strict type lattice mirroring the reference's Hive<->Kudu type bridge.

The reference supports exactly 10 physical types and rejects everything
else with a SerDeException (``HiveKuduBridgeUtils.java:36-68`` for the
mapping, ``:65-66`` for the rejection, ``:101-111`` for the explicit
LIST/MAP ban).  Core managed tables enforce the same whitelist; the
multimodal/pipeline extension tables (SURVEY.md §7 M4) deliberately lift
the ban for ``array``/``binary`` payload columns via ``allow_extended``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Hive type name -> Spark type, exactly the lattice of
# HiveKuduBridgeUtils.java:36-68 (SURVEY.md §1.3).
HIVE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
}

CORE_SPARK_TYPES: tuple[type, ...] = (
    T.StringType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.TimestampType,
    T.BooleanType,
    T.BinaryType,
)

# Extension types for pipeline tables (embeddings, multimodal blobs).
EXTENDED_SPARK_TYPES: tuple[type, ...] = CORE_SPARK_TYPES + (
    T.ArrayType,
    T.MapType,
    T.StructType,
    T.DateType,
)


class UnsupportedTypeError(TypeError):
    """Raised for types outside the reference lattice.

    Mirrors the SerDeException at ``HiveKuduBridgeUtils.java:65-66`` and the
    LIST/MAP rejection at ``:101-111``.
    """


def resolve_hive_type(name: str) -> T.DataType:
    """Map a Hive type name to its Spark type; reject unknown names."""
    key = name.strip().lower()
    # varchar(n)/char(n) collapse to string like the reference's
    # startsWith checks (HiveKuduBridgeUtils.java:39-42).
    if key.startswith(("varchar", "char")):
        key = key.split("(")[0]
    if key not in HIVE_TO_SPARK:
        raise UnsupportedTypeError(
            f"unsupported Hive type {name!r}: the engine supports only "
            f"{sorted(set(HIVE_TO_SPARK))}"
        )
    return HIVE_TO_SPARK[key]


def validate_spark_type(dtype: T.DataType, *, allow_extended: bool = False) -> None:
    allowed = EXTENDED_SPARK_TYPES if allow_extended else CORE_SPARK_TYPES
    if not isinstance(dtype, allowed):
        raise UnsupportedTypeError(
            f"unsupported column type {dtype.simpleString()!r} for a "
            f"{'pipeline' if allow_extended else 'core'} table"
        )
    if allow_extended and isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        return  # element types unconstrained on the extension path
    if isinstance(dtype, T.ArrayType):  # pragma: no cover - defensive
        raise UnsupportedTypeError("LIST types are not supported in core tables")


def validate_schema(
    schema: T.StructType,
    key_columns: list[str],
    *,
    allow_extended: bool = False,
    respect_nullability: bool = False,
) -> T.StructType:
    """Validate + normalize a table schema against the reference rules.

    Key columns become non-nullable, all other columns nullable — the
    ``.key(...)..nullable(!...)`` rule at ``KuduStorageHandler.java:253-254``.
    With ``respect_nullability`` a non-key field's explicit
    ``nullable=False`` survives (Kudu NOT NULL columns) — only the DDL
    path sets this: schemas inferred from query results or parquet
    footers carry INCIDENTAL non-nullability (COUNT(*) is non-null)
    that must not become an enforced constraint the user never wrote.
    Returns the normalized schema.
    """
    names = [f.name for f in schema.fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate column names in schema: {names}")
    missing = [k for k in key_columns if k not in names]
    if missing:
        raise ValueError(f"key columns not present in schema: {missing}")
    if not key_columns:
        raise ValueError("a managed table requires at least one key column")
    fields = []
    for f in schema.fields:
        validate_spark_type(f.dataType, allow_extended=allow_extended)
        fields.append(
            T.StructField(
                f.name,
                f.dataType,
                nullable=(
                    (f.nullable or not respect_nullability)
                    and f.name not in key_columns
                ),
            )
        )
    return T.StructType(fields)
