"""Shared Bloom-filter probe primitives.

One definition of the position expression, imported by BOTH the
standalone lake-layout index (``operators/bloom_index.py``) and the
managed-table index sidecar (``TableStore.create_bloom_index``), so the
build and lookup sides of either can never disagree on the hash.  Kudu
parity: the reference's scan path delegates key-Bloom probing to the
Kudu client (``HiveKuduTableInputFormat.java:444-572``); these
expressions are that structure rebuilt as JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M_BITS = 8192  # filter width (positions per file)
K_PROBES = 4  # probe positions per value


def probe_positions(value: Column) -> list[Column]:
    """The K Bloom positions of ``value`` — xxhash64 with a per-probe
    salt literal, reduced mod M.  Pure JVM expressions.  ``xxhash64`` is
    physical-type-sensitive, so callers must hash the SAME data type on
    the build and probe sides (probe literals are cast to the column's
    own type)."""
    return [
        F.pmod(F.xxhash64(value, F.lit(i)), F.lit(M_BITS)).cast("int")
        for i in range(K_PROBES)
    ]
