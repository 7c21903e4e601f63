"""Property-based round-trip tests (SURVEY.md §5 item 4, hypothesis):
random rows over the full §1.3 type lattice must survive
write → read → query unchanged.

This directly tests the contract the reference's Writable got wrong —
its binary round-trip was asymmetric (``HiveKuduWritable.java:76-81`` vs
``:97-101``, SURVEY.md §1.2 note): write() emitted only values while
readFields() expected a type tag per value.
"""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from hivekudu_handler_spark.sources.table_store import TableStore

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v_str", T.StringType()),
        T.StructField("v_i8", T.ByteType()),
        T.StructField("v_i16", T.ShortType()),
        T.StructField("v_i32", T.IntegerType()),
        T.StructField("v_i64", T.LongType()),
        T.StructField("v_f32", T.FloatType()),
        T.StructField("v_f64", T.DoubleType()),
        T.StructField("v_bool", T.BooleanType()),
        T.StructField("v_ts", T.TimestampType()),
        T.StructField("v_bin", T.BinaryType()),
    ]
)

# millisecond-precision timestamps at the storage boundary (SURVEY.md §1.3)
_ts = st.datetimes(
    min_value=datetime.datetime(1970, 1, 2),
    max_value=datetime.datetime(2035, 1, 1),
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))

_f32 = st.floats(width=32, allow_nan=False)

_row = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),  # k
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.integers(-128, 127)),
    st.one_of(st.none(), st.integers(-(2**15), 2**15 - 1)),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.one_of(st.none(), _f32),
    st.one_of(st.none(), st.floats(allow_nan=False)),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), _ts),
    st.one_of(st.none(), st.binary(max_size=32)),
)


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (bytes, bytearray)) or isinstance(b, (bytes, bytearray)):
        return bytes(a) == bytes(b)
    return a == b


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=8, unique_by=lambda r: r[0]))
def test_typed_rows_roundtrip(spark, tmp_path_factory, rows):
    store = TableStore(
        spark, str(tmp_path_factory.mktemp("wh")), num_buckets=2
    )
    store.create_table("kudu_typed", _SCHEMA, ["k"])
    store.insert("kudu_typed", spark.createDataFrame(rows, _SCHEMA))
    got = {r["k"]: r for r in store.scan("kudu_typed").collect()}
    assert len(got) == len(rows)
    for row in rows:
        back = got[row[0]]
        for field, expected in zip(_SCHEMA.fields, row):
            actual = back[field.name]
            if expected is None:
                assert actual is None, f"{field.name}: {actual!r} != None"
            else:
                assert _eq(actual, expected), (
                    f"{field.name}: {actual!r} != {expected!r}"
                )
    store.drop_table("kudu_typed")


@pytest.mark.parametrize("bad_value", [float("inf"), -float("inf")])
def test_float_infinities_roundtrip(spark, tmp_path, bad_value):
    store = TableStore(spark, str(tmp_path / "wh"))
    store.create_table("t", "k bigint, v double", ["k"])
    store.insert("t", spark.createDataFrame([(1, bad_value)], "k bigint, v double"))
    assert store.scan("t").collect()[0]["v"] == bad_value
