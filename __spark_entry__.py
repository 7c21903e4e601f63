"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All keys live in ``hivekudu_handler_spark.registry``; operator modules
self-register via the ``@query`` decorator.  Since r15 EVERY registered
key carries an oracle (deterministic replay for LSH/IVF/PQ/kmeans/BPE,
exact-bounds certificates for sketches and PCA); a key without one
would fall back to the driver's weaker rows-only check — don't add
those.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from hivekudu_handler_spark.registry import load_all  # noqa: E402
from tools.coverage_order import load_correctness_records, order_keys  # noqa: E402
from tools.source_hashes import current_hashes, load_sidecar  # noqa: E402


def _ordered_specs():
    """Registry in driver-coverage order: the library registry itself is
    deterministic (registration order); this entry file — the driver-facing
    surface — reorders it using the driver's own prior CORRECTNESS records
    plus the source-hash sidecar as explicit input, so each round's bounded
    record window covers keys that lack official verification, failed it,
    or were rewritten since their last official row, first."""
    specs = load_all()
    order = order_keys(
        specs,
        load_correctness_records(_ROOT),
        sidecar=load_sidecar(_ROOT),
        current=current_hashes(specs),
    )
    return {name: specs[name] for name in order}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    specs = load_all()
    return specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible key."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
