"""Batch event analytics: semantic invariants + plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.operators.event_analytics import (
    events_funnel,
    events_retention,
    events_sessionize,
)


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_sessions_partition_events_exactly(spark, sf_dir):
    """Every event lands in exactly one session: per-user event counts
    summed over sessions equal the raw per-user counts."""
    sess = events_sessionize(spark, sf_dir)
    per_user = sess.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert per_user.exceptAll(raw).count() == 0
    assert raw.exceptAll(per_user).count() == 0


def test_sessions_are_disjoint_and_gapped(spark, sf_dir):
    """Consecutive sessions of a user are separated by more than the
    30-minute gap, and session bounds never overlap."""
    sess = events_sessionize(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["session_seq"])
        assert [r["session_seq"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 30 * 60, (a, b)


def test_sessionize_single_data_shuffle(spark, sf_dir):
    """The window pass and the session fold reuse one hash exchange on
    user_id; the only other exchange is the final (tiny) global sort."""
    assert _n_exchanges(events_sessionize(spark, sf_dir)) == 2


def test_funnel_monotone(spark, sf_dir):
    rows = {r["name"]: r["n_users"] for r in events_funnel(spark, sf_dir).collect()}
    assert rows["view"] >= rows["click"] >= rows["purchase"] >= 0


def test_retention_offset_zero_covers_every_user(spark, sf_dir):
    """Each user is active in their own cohort week, so summing the
    offset-0 cells counts every distinct user exactly once."""
    ret = events_retention(spark, sf_dir)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    zero = ret.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).first()[0]
    assert zero == n_users
    assert ret.filter(F.col("week_offset") < 0).count() == 0


def test_retention_one_data_sized_shuffle(spark, sf_dir):
    """repartition(user_id) is the only exchange over event-sized data:
    distinct + cohort window reuse it (subset-key clustering), leaving
    the cell aggregate + sort on cohort-sized rows."""
    assert _n_exchanges(events_retention(spark, sf_dir)) == 3


def test_top_paths_counts_match_sessionize(spark, sf_dir):
    """Path multiplicities must sum to the total session count, and the
    deterministic (count DESC, path) order is already applied."""
    from hivekudu_handler_spark.operators.event_analytics import events_top_paths

    top = events_top_paths(spark, sf_dir).collect()
    assert len(top) == 10
    counts = [r["n_sessions"] for r in top]
    assert counts == sorted(counts, reverse=True)
    n_sessions = events_sessionize(spark, sf_dir).count()
    # the top-10 paths cannot cover more sessions than exist
    assert sum(counts) <= n_sessions
    # every path is a '>'-joined chain of known event types
    known = {"signup", "click", "purchase", "error", "view"}
    for r in top:
        assert set(r["path"].split(">")) <= known


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Linear attribution must conserve value: the total attributed
    across views equals the total value of purchases that had >= 1
    qualifying view (up to the micro-grid quantization, n*0.5e-6 per
    purchase)."""
    import pyspark.sql.functions as F

    from hivekudu_handler_spark.registry import load_all
    from hivekudu_handler_spark.tables import load_events

    out = load_all()["events_attribution"].fn(spark, sf_dir)
    attributed = out.agg(F.sum("attributed_value")).first()[0]
    ev = load_events(spark, sf_dir)
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts"), "value"
    )
    v = ev.filter("event_type = 'view'").select("user_id", F.col("ts").alias("vts"))
    credited = (
        p.join(
            v,
            (p["user_id"] == v["user_id"])
            & (v["vts"] <= p["pts"])
            & (v["vts"] > p["pts"] - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .agg(F.sum("value"))
        .first()[0]
    )
    n_credits = out.agg(F.sum("n_conversions")).first()[0]
    assert abs(attributed - credited) <= n_credits * 5e-7 + 1e-9
