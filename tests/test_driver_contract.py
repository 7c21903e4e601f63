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
