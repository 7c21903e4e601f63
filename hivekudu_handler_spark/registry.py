"""Query registry: one entry per operator key from SURVEY.md §2.

Each operator module registers its query callables here with the
``@query`` decorator.  ``__spark_entry__.py`` exposes the registry to the
verification driver: ``fn`` becomes the ``queries()`` entry and ``oracle``
(when SQL-expressible) the ``oracle_sql()`` entry that DuckDB runs against
the same Parquet tables.  Deterministic approximations (LSH banding,
IVF/PQ search, k-means, BPE) are SQL-expressible after all — their
oracles REPLAY the approximation via ``pipeline/replay.py`` (r10), so a
new approximate key should get a replay oracle unless its internals are
genuinely engine-specific.  For those last cases (HLL sketch register
hashes, eigh on a near-degenerate spectrum) the r15 pattern applies
instead of a rows-only check: register the EXACT-BOUNDS form — exact
values DuckDB recomputes plus booleans asserting the approximation sits
inside its published bound, oracle stating TRUE (see
``agg_approx_distinct`` / ``emb_pca_project``).  Since r15 every key in
the registry carries an oracle; keep it that way.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Tag families whose queries are an order of magnitude slower than the
# rest (multi-stage dedup chains, iterative graph loops, real streaming
# engine runs).  ``tools/coverage_order.py`` uses this to emit cheap keys
# before slow ones within the not-yet-verified group.
SLOW_TAGS = frozenset({"dedup", "graph", "stateful", "slow"})


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register ``fn`` as the implementation of operator key ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so all keys self-register.

    Returns the registry in deterministic registration order; any
    verification-coverage reordering is a driver-side concern handled by
    ``tools/coverage_order.py`` with the correctness records passed in
    explicitly (library code never reads harness artifacts)."""
    # Imports are inside the function to avoid import cycles with modules
    # that themselves import `query` from here.
    from hivekudu_handler_spark.operators import (  # noqa: F401
        aggregates,
        bloom_index,
        ddl,
        event_analytics,
        joins,
        range_layout,
        scans,
        setops,
        snapshots,
        sorts,
        sql_surface,
        windows,
        zorder,
    )
    from hivekudu_handler_spark.functions import collections, scalar, udfs  # noqa: F401
    from hivekudu_handler_spark.pipeline import (  # noqa: F401
        bloom,
        bpe_train,
        clustering,
        curation,
        dedup,
        lm_score,
        multimodal,
        pca,
        pq,
        sampling,
        similarity,
        span_dedup,
        text,
    )
    from hivekudu_handler_spark.streaming import events as streaming_events  # noqa: F401

    return dict(QUERIES)
