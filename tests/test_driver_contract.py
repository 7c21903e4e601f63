"""Driver-contract audit over the WHOLE registry: every registered
query must build against the smoke fixture and emit a scalar-only
schema.  The verification driver canonicalizes result cells by hashing;
an array/map/struct cell crashes it (r6's one red row was
emb_pca_project emitting a raw array<double>), so non-scalar output is
a contract violation no matter how correct the values are — digest
pattern: md5(joined) + numeric checksum (emb_quantize_int8,
emb_pca_project)."""

from __future__ import annotations

from pyspark.sql import types as T

from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_every_query_builds_and_emits_scalar_only_columns(spark):
    bad: list[tuple[str, str, str]] = []
    for key, spec in load_all().items():
        schema = spec.fn(spark, SF).schema  # building it IS the test
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((key, f.name, f.dataType.simpleString()))
    assert bad == [], f"non-scalar driver-facing columns: {bad}"


def test_every_oracle_plans_in_duckdb():
    """The other half of the contract: each oracle string must at least
    PLAN against the fixture views in DuckDB (catches SQL typos /
    dialect slips at test time instead of burning a driver round).
    Execution equivalence is tools/parity.py's job."""
    import duckdb

    from hivekudu_handler_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    broken = []
    for key, spec in load_all().items():
        if spec.oracle is None:
            continue
        try:
            con.sql("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001
            broken.append((key, str(e).splitlines()[0][:100]))
    assert broken == [], broken
