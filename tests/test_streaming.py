"""Streaming surface tests: the same windowed logic must produce the same
results through the real Structured Streaming engine as in batch
(SURVEY.md §2.9)."""

from __future__ import annotations

from hivekudu_handler_spark.streaming.events import (
    run_stream_over_fixture,
    session_counts,
    tumbling_counts,
)
from hivekudu_handler_spark.tables import load_events

SF = "/root/testdata/sf0.001"


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_counts(load_events(spark, SF))
    stream = run_stream_over_fixture(spark, SF, tumbling_counts)
    assert _normalize(stream) == _normalize(batch)


def test_session_stream_equals_batch(spark):
    batch = session_counts(load_events(spark, SF))
    stream = run_stream_over_fixture(spark, SF, session_counts, with_watermark="1 day")
    assert _normalize(stream) == _normalize(batch)


def test_stream_static_join_equals_batch(spark):
    """Stream-static dimension join: the streaming run (static side
    re-broadcast per micro-batch) must equal the batch join."""
    from hivekudu_handler_spark.streaming.events import enriched_segment_counts
    from hivekudu_handler_spark.tables import load_table

    dim = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    batch = enriched_segment_counts(load_events(spark, SF), dim)
    stream = run_stream_over_fixture(
        spark, SF, lambda ev: enriched_segment_counts(ev, dim)
    )
    assert _normalize(stream) == _normalize(batch)


def test_stateful_operator_matches_batch_totals(spark):
    """applyInPandasWithState running totals: the last update per user
    must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from hivekudu_handler_spark.streaming.events import run_stateful_over_fixture

    updates = run_stateful_over_fixture(spark, SF)
    # last update per user == final totals (single availableNow batch
    # means exactly one update per user here)
    got = {
        r["user_id"]: (r["total_value"], r["n_events"])
        for r in updates.collect()
    }
    batch = {
        r["user_id"]: (r["tv"], r["n"])
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("tv"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_sliding_stream_equals_batch(spark):
    from hivekudu_handler_spark.streaming.events import sliding_counts

    batch = sliding_counts(load_events(spark, SF))
    stream = run_stream_over_fixture(spark, SF, sliding_counts)
    assert _normalize(batch) == _normalize(stream)


def test_sliding_window_starts_match_explicit_materialization(spark):
    """F.window('1 hour', '30 minutes') membership equals the explicit
    two-starts materialization (each event belongs to the window starting
    at its 30-minute truncation and the one 30m earlier) — the same
    construction the DuckDB oracle hand-builds, verified here inside
    Spark at a second scale factor so the oracle's window arithmetic is
    pinned against the engine's own, not just engine-vs-DuckDB at one sf."""
    from pyspark.sql import functions as F

    from hivekudu_handler_spark.streaming.events import sliding_counts

    ev = load_events(spark, SF)
    got = _normalize(sliding_counts(ev))
    epoch = F.unix_timestamp("ts")
    trunc = F.floor(epoch / 1800) * 1800
    starts = ev.select(
        F.explode(F.array(trunc, trunc - 1800)).alias("start_s")
    )
    expected = _normalize(
        starts.groupBy(F.timestamp_seconds("start_s").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got == expected


def test_stream_stream_join_equals_batch(spark):
    """True two-stream watermarked interval join through the streaming
    engine must equal the batch join of the same definition."""
    from pyspark.sql import functions as F

    from hivekudu_handler_spark.streaming.events import click_purchase_pairs
    from hivekudu_handler_spark.tables import ensure_session_confs, ts_to_micros

    ensure_session_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{SF}/events.parquet")

    def side(event_type):
        s = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF)
        )
        s = s.withColumn("ts", ts_to_micros(s))
        return s.filter(F.col("event_type") == event_type).withWatermark(
            "ts", "1 day"
        )

    out = click_purchase_pairs(side("click"), side("purchase"))
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_result = spark.table("ss_join_result")

    ev = load_events(spark, SF)
    batch = click_purchase_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    assert len(_normalize(batch)) > 0
    assert _normalize(stream_result) == _normalize(batch)


def test_watermark_drops_late_data_across_microbatches(spark, tmp_path):
    """The semantics that bound state at scale: a row arriving after its
    window's state was evicted must be DROPPED by the streaming engine
    (append-mode windowed agg), while the same row counts in batch.

    Needs ≥3 micro-batches — a single availableNow batch never declares
    anything late, and a straggler in the batch right after the
    watermark advance still merges into not-yet-evicted state (drops
    only count once the window is evicted).  The source is three
    parquet files consumed oldest-first with maxFilesPerTrigger=1:
    file A's max event time (12:00) advances the watermark to 11:50 and
    its batch-end eviction emits the 10:xx windows; file B keeps the
    stream moving; file C delivers a 10:05 straggler into an evicted
    window — dropped, and visible in numRowsDroppedByWatermark."""
    from datetime import datetime
    import os

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_one(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next((tmp_path / name).glob("*.parquet"))
        dest = src / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    write_one(
        "a", [(1, t(10, 1)), (2, t(10, 5)), (3, t(10, 12)), (4, t(12, 0))],
        1_000_000,
    )
    write_one("b", [(5, t(12, 5))], 2_000_000)
    write_one("c", [(9, t(10, 5))], 3_000_000)  # behind the 11:50 watermark

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, dropped
    got = {
        (r["w"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.table("late_drop_result").collect()
    }
    # emitted windows carry on-time counts only: the straggler was
    # dropped, and the still-open 12:00 window is not emitted in append
    assert got == {("10:00", 2), ("10:10", 1)}, got
    # batch over the same files HAS the straggler: 3 rows in [10:00,10:10)
    batch = (
        spark.read.parquet(str(src))
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bg = {
        (r["w"]["start"].strftime("%H:%M"), r["n"]) for r in batch.collect()
    }
    assert ("10:00", 3) in bg, bg


def test_stream_dedup_drops_cross_batch_dupes(spark, tmp_path):
    """The watermarked-dedup semantics the ``stream_dedup`` key's oracle
    cannot see (the fixture has unique event_ids): a duplicate arriving
    in a LATER micro-batch while its key state is live must be dropped,
    and one arriving after the watermark evicted that state must be
    re-emitted — the eviction is exactly what bounds dedup state at
    100 TB (unbounded exact dedup state is the scale-killer;
    ``pipeline/bloom.py`` is the admission-control variant).

    API note (discovered by this test's first version): plain
    ``dropDuplicates(["event_id"])`` NEVER evicts state when the
    event-time column is not part of the key subset, watermark or no —
    its state grows forever.  ``dropDuplicatesWithinWatermark`` is the
    bounded-state operator: state expires once the watermark passes
    first-seen-ts + delay.

    Four parquet files consumed oldest-first with maxFilesPerTrigger=1,
    watermark 10 minutes.  Note the one-batch lag on both watermark and
    eviction: the watermark used in batch N derives from data seen
    through batch N-1, and state cleanup runs at batch END — so e3@12:00
    (batch B) sets the 11:50 watermark for batch C, whose end evicts
    e1's 10:00 state, and only batch D sees e1 as new:
      A: e1@10:00, e2@10:05            → both emitted
      B: e1@10:07 (state live → drop), e3@12:00
      C: e1@12:01 (still dropped — eviction happens at THIS batch's end)
      D: e1@12:03 (state gone → RE-emitted), e4@12:04
    """
    import os
    from datetime import datetime

    src = tmp_path / "dedup_src"
    src.mkdir()

    def write_one(name, rows, mtime):
        df = spark.createDataFrame(rows, "event_id string, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next((tmp_path / name).glob("*.parquet"))
        dest = src / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    write_one("a", [("e1", t(10, 0)), ("e2", t(10, 5))], 1_000_000)
    write_one("b", [("e1", t(10, 7)), ("e3", t(12, 0))], 2_000_000)
    write_one("c", [("e1", t(12, 1))], 3_000_000)
    write_one("d", [("e1", t(12, 3)), ("e4", t(12, 4))], 4_000_000)

    stream = (
        spark.readStream.schema("event_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_dedup_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["ts"].strftime("%H:%M"))
        for r in spark.table("stream_dedup_result").collect()
    )
    assert got == [
        ("e1", "10:00"),  # first occurrence
        ("e1", "12:03"),  # state evicted at 11:50 watermark → treated as new
        ("e2", "10:05"),
        ("e3", "12:00"),
        ("e4", "12:04"),
    ], got


# ---- streaming upsert sink ------------------------------------------------

def test_stream_upsert_sink_multibatch_and_order_independent(spark, sf_dir, tmp_path):
    """The foreachBatch upsert sink really runs multiple micro-batches,
    and last-write-wins merge makes the final table identical whether
    batches arrive oldest-first or newest-first."""
    from hivekudu_handler_spark.sources.table_store import TableStore
    from hivekudu_handler_spark.streaming.events import run_upsert_sink
    from hivekudu_handler_spark.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    results = {}
    n_batches = {}
    for label, rev in (("fwd", False), ("rev", True)):
        store = TableStore(spark, str(tmp_path / f"wh_{label}"))
        store.create_table(
            "user_state",
            "user_id bigint, event_id bigint, ts timestamp, "
            "event_type string, value double",
            ["user_id"],
        )
        n_batches[label] = run_upsert_sink(
            spark, ev, store, "user_state",
            checkpoint_dir=str(tmp_path / f"ckpt_{label}"),
            stage_dir=str(tmp_path / f"stage_{label}"),
            reverse_order=rev,
        )
        results[label] = sorted(
            tuple(r) for r in store.scan("user_state").collect()
        )
    assert n_batches["fwd"] > 1 and n_batches["rev"] > 1
    assert results["fwd"] == results["rev"]
    # final state is the newest event per user
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expect = sorted(
        tuple(r)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    )
    assert results["fwd"] == expect


def test_stream_upsert_sink_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """A second availableNow run against the SAME checkpoint ingests the
    newly staged files as fresh micro-batches (the file source's seen-files
    log carries across runs) and the LWW merge folds the late slice into
    the keyed table so the final state equals the one-shot result."""
    import pyspark.sql.functions as F

    from hivekudu_handler_spark.sources.table_store import TableStore
    from hivekudu_handler_spark.streaming.events import run_upsert_sink
    from hivekudu_handler_spark.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    early = ev.filter(F.dayofmonth("ts") <= 20)
    late = ev.filter(F.dayofmonth("ts") > 20)
    store = TableStore(spark, str(tmp_path / "wh"))
    store.create_table(
        "user_state",
        "user_id bigint, event_id bigint, ts timestamp, "
        "event_type string, value double",
        ["user_id"],
    )
    ckpt, stage = str(tmp_path / "ckpt"), str(tmp_path / "stage")
    n1 = run_upsert_sink(
        spark, early, store, "user_state",
        checkpoint_dir=ckpt, stage_dir=stage, n_files=2,
    )
    # stage the late slice as new files; same checkpoint, new batches
    n2 = run_upsert_sink(
        spark, late, store, "user_state",
        checkpoint_dir=ckpt, stage_dir=stage + "/more", n_files=2,
    )
    assert n1 == 2 and n2 == 2
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expect = sorted(
        tuple(r)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    )
    got = sorted(tuple(r) for r in store.scan("user_state").collect())
    assert got == expect


def test_stream_stream_outer_emits_null_rows_on_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream join through the real engine: an
    unconverted click's NULL row must appear exactly when the watermark
    proves no purchase can still arrive in its 30-minute window — and a
    recent click whose window is still open must NOT be emitted.

    Three staged micro-batches (oldest mtime first): A holds a matched
    click+purchase pair, an unconverted click, and a purchase with no
    click (must never appear — left side only); B advances the
    watermark far past A's windows, evicting A's unmatched click as a
    NULL row, while carrying its own fresh click whose window stays
    open; C keeps the stream moving so B's watermark advance is applied
    in a later trigger."""
    import os
    from datetime import datetime

    from pyspark.sql import functions as F

    from hivekudu_handler_spark.streaming.events import click_purchase_pairs

    src = tmp_path / "outer_src"
    src.mkdir()
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"

    def write_one(name, rows, mtime):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next((tmp_path / name).glob("*.parquet"))
        dest = src / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    write_one(
        "a",
        [
            (1, 10, "click", t(10, 0)),
            (2, 10, "purchase", t(10, 10)),  # matches click 1 (lag 10m)
            (3, 20, "click", t(10, 2)),  # never converts
            (4, 30, "purchase", t(10, 1)),  # no click: must never appear
        ],
        1_000_000,
    )
    write_one("b", [(5, 40, "click", t(14, 0))], 2_000_000)
    write_one("c", [(6, 50, "purchase", t(14, 5))], 3_000_000)

    def side(event_type):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return s.filter(F.col("event_type") == event_type).withWatermark(
            "ts", "10 minutes"
        )

    out = click_purchase_pairs(side("click"), side("purchase"), how="left_outer")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_outer_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.purchase_id, r.user_id, r.lag_micros)
        for r in spark.table("ss_outer_result").collect()
    }
    assert (1, 2, 10, 600_000_000) in got  # the matched pair
    assert (3, None, 20, None) in got  # evicted unconverted click
    # click 5's window is still open at the final watermark (14:05-10m):
    # emitting it now would be premature — and purchase 4 has no click row
    assert all(r[0] not in (4, 6) for r in got)
    assert (5, None, 40, None) not in got
    assert len(got) == 2, got


# ---- streaming CDC mirror ---------------------------------------------------

def test_stream_cdc_mirror_equals_source_across_batches(spark, sf_dir, tmp_path):
    """The streamed changefeed consumer converges the mirror to the
    source's exact current state — including keys whose lifecycle spans
    micro-batch boundaries (inserted in batch 1, updated or deleted by a
    commit in batch 2) — and really ran multiple micro-batches."""
    from hivekudu_handler_spark.streaming.events import (
        _cdc_mirror_scaffold,
        run_cdc_mirror,
    )

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    store, d = _cdc_mirror_scaffold(spark, sf_dir)
    try:
        feed = store.changefeed("acct", 0, store.current_version("acct"))
        n = run_cdc_mirror(
            spark, feed, store, "acct_mirror",
            checkpoint_dir=str(tmp_path / "ckpt"),
            stage_dir=str(tmp_path / "stage"),
            n_files=2,
        )
        assert n == 2
        src = sorted(tuple(r) for r in store.scan("acct").collect())
        mir = sorted(tuple(r) for r in store.scan("acct_mirror").collect())
        assert mir == src and len(src) > 0
        # cross-batch lifecycles actually occurred: the staged files
        # split the history at the commit boundary (f00 = commits 1-2,
        # f01 = commits 3-4), and some key INSERTED in batch 1 was
        # DELETED by a commit in batch 2
        f0 = spark.read.parquet(str(tmp_path / "stage" / "f00"))
        f1 = spark.read.parquet(str(tmp_path / "stage" / "f01"))
        assert {r[0] for r in f0.select("_commit_version").distinct().collect()} == {1, 2}
        assert {r[0] for r in f1.select("_commit_version").distinct().collect()} == {3, 4}
        ins_b1 = {
            r[0] for r in f0.filter("_change_type = 'insert'")
            .select("c_custkey").collect()
        }
        del_b2 = {
            r[0] for r in f1.filter("_change_type = 'delete'")
            .select("c_custkey").collect()
        }
        assert del_b2 and del_b2 <= ins_b1
        assert all(k not in {m[0] for m in mir} for k in del_b2)
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def test_stream_cdc_mirror_forces_distinct_staged_mtimes(spark, sf_dir, tmp_path):
    """FileStreamSource orders candidates by MODIFICATION TIME; on a
    coarse-mtime filesystem two sequentially staged files can tie and
    batch out of order (r17 advice).  run_cdc_mirror forces strictly
    increasing mtimes in staged (= commit) order."""
    import glob
    import os

    from hivekudu_handler_spark.streaming.events import (
        _cdc_mirror_scaffold,
        run_cdc_mirror,
    )

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    store, d = _cdc_mirror_scaffold(spark, sf_dir)
    try:
        feed = store.changefeed("acct", 0, store.current_version("acct"))
        run_cdc_mirror(
            spark, feed, store, "acct_mirror",
            checkpoint_dir=str(tmp_path / "ckpt"),
            stage_dir=str(tmp_path / "stage"),
            n_files=4,
        )
        parts = sorted(glob.glob(str(tmp_path / "stage" / "f*" / "*.parquet")))
        mtimes = [os.stat(p).st_mtime for p in parts]
        assert len(parts) == 4
        assert mtimes == sorted(mtimes)
        assert len(set(mtimes)) == len(mtimes), "staged mtimes must be distinct"
        assert min(b - a for a, b in zip(mtimes, mtimes[1:])) >= 1.0
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def test_stream_cdc_mirror_rejects_out_of_order_batches(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The commit-version watermark fails LOUDLY on a non-monotone
    batch instead of silently resurrecting deleted keys: staging the
    commit ranges in reverse order (late commits in f00) must abort the
    stream with the named error."""
    from hivekudu_handler_spark.streaming import events as ev

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    store, d = ev._cdc_mirror_scaffold(spark, sf_dir)
    orig = ev.stage_stream_files
    monkeypatch.setattr(
        ev,
        "stage_stream_files",
        lambda *a, **k: orig(*a, reverse_order=True, **k),
    )
    try:
        import pytest

        feed = store.changefeed("acct", 0, store.current_version("acct"))
        with pytest.raises(Exception, match="out of commit order"):
            ev.run_cdc_mirror(
                spark, feed, store, "acct_mirror",
                checkpoint_dir=str(tmp_path / "ckpt"),
                stage_dir=str(tmp_path / "stage"),
                n_files=2,
            )
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def test_stream_cdc_mirror_handles_empty_staged_batch(spark, sf_dir, tmp_path):
    """A staged commit-range file can be EMPTY (range buckets with no
    events); the apply loop must skip it without advancing the
    commit-version watermark or crashing, and still converge the
    mirror.  n_files=4 over a 4-commit history leaves at least the
    delete-only tail ranges sparse."""
    from hivekudu_handler_spark.streaming.events import (
        _cdc_mirror_scaffold,
        run_cdc_mirror,
    )

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    store, d = _cdc_mirror_scaffold(spark, sf_dir)
    try:
        feed = store.changefeed("acct", 0, store.current_version("acct"))
        n = run_cdc_mirror(
            spark, feed, store, "acct_mirror",
            checkpoint_dir=str(tmp_path / "ckpt"),
            stage_dir=str(tmp_path / "stage"),
            n_files=4,
        )
        assert n == 4  # every staged file triggered a micro-batch
        src = sorted(tuple(r) for r in store.scan("acct").collect())
        mir = sorted(tuple(r) for r in store.scan("acct_mirror").collect())
        assert mir == src and len(src) > 0
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
