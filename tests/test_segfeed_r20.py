"""r20 segmented-changefeed cache batch (the four r19 advice items):

* the span cache is LRU-BOUNDED — evicted spans' localCheckpoint
  blocks are actually released (``DataFrame.unpersist()`` alone does
  NOT free them; the entry digs the ``LogicalRDD``'s wrapped RDD), and
  the newest range keeps serving from cache after a sweep;
* spans are aligned to absolute K boundaries, so the advancing-range
  CDC pattern (``CHANGES BETWEEN 0 AND <growing current version>``)
  re-pays only the NEW spans instead of pinning one full-history
  materialization per distinct range;
* cache keys carry endpoint-manifest commit timestamps, so RENAME
  followed by re-creating a table under the old name can never serve
  the predecessor's cached feed, and a read on a renamed-away name
  raises like the raw feed — without ``rename_table`` hooking
  invalidation;
* ``materialize=False`` (the EXPLAIN binding) assembles the same union
  without running jobs or caching, binding cached spans when present;
  EXPLAIN is recognized behind a leading comment.
"""

from __future__ import annotations

import pytest

from hivekudu_handler_spark.sources.table_store import (
    NoSuchTableError,
    TableStore,
    changefeed_segmented,
)


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "wh"))
    yield s
    # teardown: release this store's cached spans so a later test's
    # absolute persistent-RDD counts don't race the ContextCleaner
    # asynchronously reclaiming them (r20 advice: the flake reproduced
    # when the block-release test followed the LRU test in one run)
    for span in list(s._segfeed_cache.values()):
        span.unpersist()
    s._segfeed_cache.clear()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _history(store, name, n, tag="a"):
    """n commits of real mutation on a 1-key table: insert/truncate
    alternation, so every span carries events."""
    store.create_table(name, "id int, v string", ["id"])
    store.insert_values(name, [(1, tag)])
    while store.current_version(name) < n:
        if store.scan(name).count():
            store.truncate(name)
        else:
            store.insert_values(name, [(1, tag)])
    return store.current_version(name)


def _counter(monkeypatch):
    import hivekudu_handler_spark.sources.table_store as ts_mod

    calls: list = []
    orig = ts_mod._changefeed_batched

    def counting(store_, name_, lo, hi):
        calls.append((lo, hi))
        return orig(store_, name_, lo, hi)

    monkeypatch.setattr(ts_mod, "_changefeed_batched", counting)
    return calls


def _n_persistent(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _settled_persistent(spark, polls: int = 25, interval: float = 0.2):
    """Persistent-RDD count after ContextCleaner churn settles (r20
    advice): GC driver-side references (Python then JVM), then poll
    until two consecutive reads agree.  Absolute-count assertions
    sampled mid-churn race the cleaner's asynchronous unpersists of
    previous tests' garbage."""
    import gc
    import time

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    prev = _n_persistent(spark)
    for _ in range(polls):
        time.sleep(interval)
        cur = _n_persistent(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


# ---- LRU bound + block release ---------------------------------------------

def test_lru_evicts_and_releases_blocks(spark, store, monkeypatch):
    store._segfeed_cache_max = 2
    _history(store, "deep", 12)
    base = _settled_persistent(spark)
    raw_head = _rows(store.changefeed("deep", 0, 6))
    calls = _counter(monkeypatch)

    # 3 spans > cap, but a single feed's spans are protected from its
    # own evictions (evicting one would break the union being returned)
    f1 = changefeed_segmented(store, "deep", 0, 6, segment_commits=2)
    assert len(store._segfeed_cache) == 3
    assert _settled_persistent(spark) == base + 3
    assert _rows(f1) == raw_head

    # a later sweep over a disjoint deep range evicts the old spans and
    # RELEASES their blocks — total pinned storage stays bounded
    changefeed_segmented(store, "deep", 6, 12, segment_commits=2)
    assert len(store._segfeed_cache) == 3
    assert _settled_persistent(spark) == base + 3
    assert {k[1:3] for k in store._segfeed_cache} == {(6, 8), (8, 10), (10, 12)}

    # the newest range still serves from cache: no re-materialization
    n = len(calls)
    f3 = changefeed_segmented(store, "deep", 6, 12, segment_commits=2)
    assert len(calls) == n
    assert _rows(f3) == _rows(store.changefeed("deep", 6, 12))


def test_drop_table_releases_blocks(spark, store):
    """DROP TABLE invalidation frees the evicted spans' executor blocks
    through the entry's unpersist handle (r19: ``DataFrame.unpersist``
    alone left localCheckpoint blocks pinned)."""
    base = _settled_persistent(spark)
    to_v = _history(store, "deep", 8)
    changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    assert _settled_persistent(spark) == base + 4
    store.drop_table("deep")
    assert not store._segfeed_cache
    assert _settled_persistent(spark) == base


# ---- span alignment: advancing-range reuse ---------------------------------

def test_advancing_range_repays_only_new_spans(spark, store, monkeypatch):
    _history(store, "deep", 12)
    calls = _counter(monkeypatch)
    changefeed_segmented(store, "deep", 0, 10, segment_commits=2)
    assert len(calls) == 5  # (0,2)..(8,10)
    feed = changefeed_segmented(store, "deep", 0, 12, segment_commits=2)
    assert len(calls) == 6  # only (10,12) is new
    assert len(store._segfeed_cache) == 6
    assert _rows(feed) == _rows(store.changefeed("deep", 0, 12))


def test_misaligned_partials_stay_lazy_and_uncached(spark, store, monkeypatch):
    to_v = _history(store, "deep", 16)
    calls = _counter(monkeypatch)
    # (3, 13): head (3,4) rides the plain feed (1 commit), full spans
    # (4,8) and (8,12) are cached, tail (12,13) rides the plain feed
    feed = changefeed_segmented(store, "deep", 3, 13, segment_commits=4)
    assert sorted(calls) == [(4, 8), (8, 12)]
    assert {k[1:3] for k in store._segfeed_cache} == {(4, 8), (8, 12)}
    assert _rows(feed) == _rows(store.changefeed("deep", 3, 13))


def test_random_ranges_equal_raw_feed(spark, store):
    """Randomized differential over the span decomposition: for random
    (from, to, K) — aligned, misaligned, head-only, tail-only, K larger
    than the range — the assembled feed's row set equals the raw
    per-commit feed's, with and without materialization.  Deterministic
    seed; the alignment arithmetic is the newest code in the path."""
    import random

    to_all = _history(store, "deep", 14)
    rng = random.Random(20)
    raw_cache: dict = {}
    for trial in range(12):
        frm = rng.randrange(0, to_all - 1)
        to = rng.randrange(frm + 1, to_all + 1)
        k = rng.choice([1, 2, 3, 4, 5, 8, 16])
        if (frm, to) not in raw_cache:
            raw_cache[(frm, to)] = _rows(store.changefeed("deep", frm, to))
        raw = raw_cache[(frm, to)]
        mat = trial % 2 == 0
        got = _rows(
            changefeed_segmented(
                store, "deep", frm, to, segment_commits=k, materialize=mat
            )
        )
        assert got == raw, (frm, to, k, mat)


# ---- rename identity --------------------------------------------------------

def test_renamed_away_name_raises_not_serves_cache(spark, store):
    to_v = _history(store, "t", 8)
    changefeed_segmented(store, "t", 0, to_v, segment_commits=2)
    store.rename_table("t", "u")
    with pytest.raises(NoSuchTableError):
        changefeed_segmented(store, "t", 0, to_v, segment_commits=2)
    # the surviving table reads fresh (cached under the OLD name only)
    assert _rows(
        changefeed_segmented(store, "u", 0, to_v, segment_commits=2)
    ) == _rows(store.changefeed("u", 0, to_v))


def test_recreated_table_never_serves_predecessor_feed(spark, store):
    to_v = _history(store, "t", 8, tag="old")
    stale = _rows(changefeed_segmented(store, "t", 0, to_v, segment_commits=2))
    store.rename_table("t", "archive")
    # same name, same commit depth, DIFFERENT content: the endpoint-ts
    # identity in the cache key makes every probe miss
    to_v2 = _history(store, "t", 8, tag="new")
    assert to_v2 == to_v
    fresh = _rows(changefeed_segmented(store, "t", 0, to_v2, segment_commits=2))
    assert fresh == _rows(store.changefeed("t", 0, to_v2))
    assert fresh != stale


# ---- materialize=False (the EXPLAIN binding) --------------------------------

def test_materialize_false_runs_nothing_and_caches_nothing(spark, store):
    to_v = _history(store, "deep", 12)
    base = _settled_persistent(spark)
    lazy = changefeed_segmented(
        store, "deep", 0, to_v, segment_commits=2, materialize=False
    )
    assert not store._segfeed_cache
    # nothing was checkpointed: no RDD got pinned (the plan-text
    # LogicalRDD spelling is NOT the discriminator — the plain feed's
    # empty-snapshot frames render as LogicalRDD leaves too)
    assert _settled_persistent(spark) == base
    assert _rows(lazy) == _rows(store.changefeed("deep", 0, to_v))


def test_materialize_false_binds_cached_spans(spark, store):
    to_v = _history(store, "deep", 12)
    changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    n_cached = len(store._segfeed_cache)
    lazy = changefeed_segmented(
        store, "deep", 0, to_v, segment_commits=2, materialize=False
    )
    assert len(store._segfeed_cache) == n_cached  # probe only, no insert
    plan = lazy._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan  # the pinned spans are bound, not rebuilt
    assert _rows(lazy) == _rows(store.changefeed("deep", 0, to_v))


def test_leading_comment_never_hides_statement_verb(spark, store):
    """``_strip_stmt`` drops leading comments for EVERY dispatcher, so
    DDL/DML/SELECT behind a ``/* hint */`` or ``-- note`` route exactly
    like their bare spellings (a comment before the first token is
    legal SQL; pre-r20 the verb dispatch saw ``/*`` and refused)."""
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    run_sql(
        store,
        "/* setup */ CREATE TABLE t (id INT, v STRING) "
        "TBLPROPERTIES ('kudu.key_columns'='id')",
    )
    assert store.has_table("t")
    run_sql(store, "-- seed\nINSERT INTO t VALUES (1, 'a'), (2, 'b')")
    assert store.scan("t").count() == 2
    assert run_sql(store, "/* q */ SELECT count(*) AS n FROM t").collect()[0][0] == 2
    run_sql(store, "/* lww */ UPSERT INTO t VALUES (1, 'z')")
    assert sorted(r.v for r in store.scan("t").collect()) == ["b", "z"]
    run_sql(store, "/* bye */ DROP TABLE t")
    assert not store.has_table("t")


def test_explain_behind_leading_comment_stays_lazy(spark, store):
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    to_v = _history(store, "deep", 70)  # past the 64-commit gate
    for stmt in (
        f"/* plan check */ EXPLAIN SELECT * FROM deep "
        f"CHANGES BETWEEN 0 AND {to_v}",
        f"-- why\nEXPLAIN SELECT * FROM deep CHANGES BETWEEN 0 AND {to_v}",
    ):
        df = run_sql(store, stmt)
        assert df.collect()[0][0]  # plan text came back
        assert not store._segfeed_cache  # and nothing materialized
