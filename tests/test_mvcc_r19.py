"""r19 MVCC batch: monotone commit timestamps, the batched segment
diff, the segmented-feed cache, and EXPLAIN laziness.

Four behavior changes landed together (one TableStore change-set, per
the r18 verdict's window-budget advice), each pinned here:

* ``_commit_version`` stamps ``max(previous commit ts, now)`` so a
  backwards wall-clock step (NTP correction, VM migration) cannot
  break ``version_at``'s newest-first early exit or the meaning of
  ``TIMESTAMP AS OF`` (r17 advice, deferred to r19 by design);
* ``changefeed_segmented`` materializes each span through
  ``_changefeed_batched`` — ONE window pass over run-tagged tablet
  reads instead of one manifest-diff join per commit (BENCH_NOTES r18
  measured ~0.4-0.75 s/commit of fixed join overhead);
* a re-issued deep ``CHANGES BETWEEN`` read of the same committed
  range serves the cached materialization; DROP TABLE and VACUUM
  invalidate (r18 advice);
* ``EXPLAIN ... CHANGES BETWEEN`` binds the plain lazy feed — no jobs
  run to show a plan (r18 advice).
"""

from __future__ import annotations

import pytest

from hivekudu_handler_spark.sources.table_store import (
    TableStore,
    TableStoreError,
    _changefeed_batched,
    changefeed_segmented,
)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- monotone commit timestamps --------------------------------------------

class _Clock:
    """A settable fake for time.time() inside table_store — a value
    SEQUENCE would be consumed by unrelated time.time() calls on the
    write path; pinning the value per operation is deterministic."""

    def __init__(self, monkeypatch, start):
        import hivekudu_handler_spark.sources.table_store as ts_mod

        self.now = start
        monkeypatch.setattr(ts_mod.time, "time", lambda: self.now)


def _clock_stepped_history(spark, store, monkeypatch):
    clock = _Clock(monkeypatch, 1000.0)
    store.create_table("t", "id int, v string", ["id"])  # v0 @ 1000
    clock.now = 2000.0
    store.insert_values("t", [(1, "a")])  # v1 @ 2000
    clock.now = 1500.0  # backwards step (NTP correction)
    store.insert_values("t", [(2, "b")])  # v2: clamped to 2000
    clock.now = 1600.0
    store.insert_values("t", [(3, "c")])  # v3: clamped to 2000


def test_commit_ts_clamped_monotone_under_backwards_clock(
    spark, store, monkeypatch
):
    _clock_stepped_history(spark, store, monkeypatch)
    stamps = [store.commit_timestamp("t", v) for v in range(4)]
    assert stamps == [1000.0, 2000.0, 2000.0, 2000.0]
    assert all(a <= b for a, b in zip(stamps, stamps[1:]))


def test_version_at_resolves_newest_at_or_before_despite_clock_step(
    spark, store, monkeypatch
):
    _clock_stepped_history(spark, store, monkeypatch)
    # before the clamp, stamps would read [1000, 2000, 1500, 1600] and
    # the newest-first early exit at ts=1700 would return v3 — skipping
    # v1's 2000 stamp entirely.  Clamped, every post-step commit sits
    # at 2000: ts >= 2000 sees the newest version, anything in
    # (1000, 2000) sees only v0.
    assert store.version_at("t", 2000.0) == 3
    assert store.version_at("t", 1999.0) == 0
    assert store.version_at("t", 1000.0) == 0
    with pytest.raises(TableStoreError):
        store.version_at("t", 999.0)
    # timestamp travel end-to-end: the instant of the step resolves to
    # the newest clamped commit, and reads its snapshot
    snap = store.scan_snapshot("t", store.version_at("t", 2500.0))
    assert _rows(snap) == [(1, "a"), (2, "b"), (3, "c")]


# ---- batched segment diff ---------------------------------------------------

def test_batched_feed_equals_raw_over_gap_and_reinsert(spark, store):
    """Run-boundary semantics: delete → gap → re-insert with the SAME
    value (must emit delete + insert, not nothing), then a genuine
    update — the transitions the lag/lead reconstruction must get
    exactly right."""
    store.create_table("t", "id int, v string", ["id"])
    store.insert_values("t", [(1, "a"), (2, "keep")])  # v1
    store.delete_where("t", "id = 1")                  # v2
    store.insert_values("t", [(1, "a")])               # v3: same value back
    store.upsert(
        "t", spark.createDataFrame([(1, "b")], "id int, v string")
    )                                                  # v4: real update
    to_v = store.current_version("t")
    raw = _rows(store.changefeed("t", 0, to_v))
    assert _rows(_changefeed_batched(store, "t", 0, to_v)) == raw
    for k in (1, 2):
        assert (
            _rows(changefeed_segmented(store, "t", 0, to_v, segment_commits=k))
            == raw
        )


def test_batched_feed_key_only_table(spark, store):
    store.create_table("t", "id int", ["id"])
    store.insert_values("t", [(1,), (2,)])   # v1
    store.delete_where("t", "id = 1")        # v2
    store.insert_values("t", [(1,), (3,)])   # v3
    to_v = store.current_version("t")
    raw = _rows(store.changefeed("t", 0, to_v))
    assert _rows(_changefeed_batched(store, "t", 0, to_v)) == raw
    assert _rows(
        changefeed_segmented(store, "t", 0, to_v, segment_commits=1)
    ) == raw


def test_batched_feed_pure_file_rewrite_emits_nothing(spark, store):
    """A compaction/rebucket rewrites files without changing rows — the
    adjacent runs carry identical values and must cancel, exactly like
    diff's unchanged-filter."""
    store.create_table("t", "id int, v string", ["id"])
    store.insert_values("t", [(i, f"v{i}") for i in range(1, 5)])  # v1
    store.rebucket("t", 2)                                         # v2
    to_v = store.current_version("t")
    raw = _rows(store.changefeed("t", 1, to_v))
    assert raw == []
    assert _rows(_changefeed_batched(store, "t", 1, to_v)) == []


# ---- segmented-feed cache ---------------------------------------------------

def _history(store, n):
    store.create_table("deep", "id int, v string", ["id"])
    store.insert_values("deep", [(1, "a")])
    while store.current_version("deep") < n:
        store.truncate("deep") if store.scan("deep").count() else \
            store.insert_values("deep", [(1, "a")])
    return store.current_version("deep")


def test_segmented_feed_cached_for_repeated_reads(spark, store, monkeypatch):
    """Materialized spans are cached per ALIGNED SPAN (r20): a re-issued
    range re-materializes nothing, and an overlapping misaligned range
    reuses the aligned spans it contains — only its lazy head partial
    differs."""
    import hivekudu_handler_spark.sources.table_store as ts_mod

    to_v = _history(store, 8)
    calls: list = []
    orig = ts_mod._changefeed_batched

    def counting(store_, name_, lo, hi):
        calls.append((lo, hi))
        return orig(store_, name_, lo, hi)

    monkeypatch.setattr(ts_mod, "_changefeed_batched", counting)
    f1 = changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    assert len(store._segfeed_cache) == 4  # aligned spans (0,2)..(6,8)
    n_first = len(calls)
    assert n_first == 4
    # re-issued same range: every span serves the pinned materialization
    f2 = changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    assert len(calls) == n_first
    assert _rows(f2) == _rows(f1)
    # overlapping misaligned range: aligned spans reused, the 1-commit
    # head partial (1,2) rides the plain feed — no new cache entry
    f3 = changefeed_segmented(store, "deep", 1, to_v, segment_commits=2)
    assert len(calls) == n_first
    assert len(store._segfeed_cache) == 4
    assert _rows(f3) == _rows(store.changefeed("deep", 1, to_v))


def test_vacuum_and_drop_invalidate_segfeed_cache(spark, store):
    to_v = _history(store, 8)
    changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    assert store._segfeed_cache
    store.vacuum("deep", keep_last=1)
    assert not store._segfeed_cache
    # the vacuumed range now fails loudly, same as the raw feed
    with pytest.raises(TableStoreError):
        changefeed_segmented(store, "deep", 0, to_v, segment_commits=2)
    store.drop_table("deep")
    assert not store._segfeed_cache


def test_midsize_range_takes_lazy_batched_path(spark, store):
    """5..segment_commits commits: one LAZY window pass — no checkpoint
    (no LogicalRDD leaf, no cache entry), no per-commit diff joins
    (no join operator in the optimized plan)."""
    to_v = _history(store, 10)
    feed = changefeed_segmented(store, "deep", 0, to_v, segment_commits=64)
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan          # the K per-commit joins are gone
    assert "Window" in plan            # one run-reconstruction window
    assert "LogicalRDD" not in plan    # nothing was checkpointed
    assert not store._segfeed_cache    # and nothing was cached
    assert _rows(feed) == _rows(store.changefeed("deep", 0, to_v))


def test_tiny_range_keeps_plain_per_commit_feed(spark, store):
    """<= 4 commits: the plain reference feed — its per-commit diff
    joins ARE the independent implementation the model differential
    checks the batched builder against."""
    store.create_table("t", "id int, v string", ["id"])
    store.insert_values("t", [(1, "a")])
    store.upsert("t", spark.createDataFrame([(1, "b")], "id int, v string"))
    to_v = store.current_version("t")
    assert to_v <= 4
    feed = changefeed_segmented(store, "t", 0, to_v)
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan  # per-commit manifest-diff joins


# ---- EXPLAIN binds lazily ---------------------------------------------------

def test_explain_changes_between_materializes_nothing(spark, store):
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql

    to_v = _history(store, 70)  # past the 64-commit segmentation gate
    df = run_sql(
        store, f"EXPLAIN SELECT * FROM deep CHANGES BETWEEN 0 AND {to_v}"
    )
    text = df.collect()[0][0]
    assert "parquet" in text.lower() or "Relation" in text
    # no span was checkpointed to show the plan
    assert not store._segfeed_cache
    # the real read afterwards takes the segmented path and caches
    run_sql(
        store,
        f"SELECT count(*) AS n FROM deep CHANGES BETWEEN 0 AND {to_v}",
    ).collect()
    assert store._segfeed_cache
