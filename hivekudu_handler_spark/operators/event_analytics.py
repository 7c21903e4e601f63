"""Batch event-stream analytics over the ``events`` fixture (SURVEY.md
§2.5/§2.9 adjacency): sessionization, ordered funnels, cohort retention.

The reference's workload family is Hive SQL over fast-changing operational
tables (``doc/DesignDocument.md:4-8`` — "analytical queries on fast
changing data"); clickstream sessionization / funnel / retention are the
canonical such queries.  All three are pure JVM window/aggregate plans:

* ``events_sessionize`` — gaps-and-islands: one window pass computes the
  new-session marker (lag + gap compare), a running sum turns markers into
  per-user session ordinals, then a keyed aggregate folds each session.
  Scale: two shuffles total, both on ``user_id`` (the window and the
  group-by reuse the same hash partitioning; AQE coalesces), state per
  task bounded by the partition's rows — no driver-side state.  Gap
  comparison is done on microsecond-exact epoch doubles (2024 epoch ×
  1e6 µs ≈ 1.7e15 < 2^53, so the double is exact) to avoid
  second-truncation disagreeing with the oracle's INTERVAL compare.
* ``events_funnel`` — strict-order funnel (view → click after first view
  → purchase after first qualifying click) via per-step keyed min-aggs
  joined on ``user_id``; at scale each step is one shuffle on the same
  key, and steps shrink monotonically (each join is against an
  already-reduced per-user table).
* ``events_retention`` — weekly cohort retention: cohort = Monday-truncated
  week of the user's first event; one distinct-activity aggregate joined
  to the per-user cohort, then a count per (cohort, offset) cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_events

_GAP_SECONDS = 30 * 60


def with_sessions(ev: DataFrame) -> DataFrame:
    """Events + a per-user ``session_seq`` ordinal (30-minute gap rule).
    One window shuffle on ``user_id``; every consumer's follow-up
    aggregate reuses that partitioning."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact-µs epoch as double; NULL lag (first event) compares to NULL →
    # otherwise-branch → new session, matching the oracle's CASE shape
    gap_ok = (
        F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    ) <= F.lit(float(_GAP_SECONDS))
    marked = ev.withColumn("is_new", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)))
    return marked.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


@query(
    "events_sessionize",
    oracle=(
        "WITH marked AS ("
        "  SELECT user_id, ts, event_id, "
        "         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE "
        "              THEN 0 ELSE 1 END AS is_new "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "numbered AS ("
        "  SELECT user_id, ts, "
        "         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "                           ROWS UNBOUNDED PRECEDING) AS session_seq "
        "  FROM marked) "
        "SELECT user_id, CAST(session_seq AS INT) AS session_seq, "
        "       COUNT(*) AS n_events, "
        "       MIN(ts) AS session_start, MAX(ts) AS session_end, "
        "       date_diff('second', MIN(ts), MAX(ts)) AS duration_secs "
        "FROM numbered GROUP BY user_id, session_seq "
        "ORDER BY user_id, session_seq"
    ),
    tags=("events",),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization with a 30-minute inactivity gap:
    per-session ordinals, event counts, bounds and duration."""
    numbered = with_sessions(load_events(spark, sf_dir))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_secs"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "events_funnel",
    oracle=(
        "WITH v AS ("
        "  SELECT user_id, MIN(ts) AS t0 FROM events "
        "  WHERE event_type = 'view' GROUP BY user_id), "
        "c AS ("
        "  SELECT e.user_id, MIN(e.ts) AS t1 FROM events e "
        "  JOIN v ON e.user_id = v.user_id "
        "  WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id), "
        "p AS ("
        "  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
        "  JOIN c ON e.user_id = c.user_id "
        "  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id) "
        "SELECT * FROM (VALUES "
        "  (1, 'view', (SELECT COUNT(*) FROM v)), "
        "  (2, 'click', (SELECT COUNT(*) FROM c)), "
        "  (3, 'purchase', (SELECT COUNT(*) FROM p))) "
        "AS t(step, name, n_users) ORDER BY step"
    ),
    tags=("events",),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view → click → purchase: a user
    counts at step N only with an event after their first step-N-1 event."""
    ev = load_events(spark, sf_dir)

    def first_after(step_type: str, prev: DataFrame, prev_t: str, out_t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == step_type)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = first_after("click", v, "t0", "t1")
    p = first_after("purchase", c, "t1", "t2")
    counts = [df.count() for df in (v, c, p)]
    return spark.createDataFrame(
        [(i + 1, n, cnt) for i, (n, cnt) in enumerate(zip(["view", "click", "purchase"], counts))],
        "step int, name string, n_users bigint",
    ).orderBy("step")


@query(
    "events_retention",
    oracle=(
        "WITH cohorts AS ("
        "  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week "
        "  FROM events GROUP BY user_id), "
        "activity AS ("
        "  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week "
        "  FROM events) "
        "SELECT cohort_week, "
        "       CAST(date_diff('day', cohort_week, active_week) / 7 AS INT) AS week_offset, "
        "       COUNT(*) AS n_users "
        "FROM activity JOIN cohorts USING (user_id) "
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"
    ),
    tags=("events",),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the Monday week of
    their first event, counted in every week they were active.

    One data-sized shuffle: repartition on ``user_id`` up front, then the
    (user, week) distinct AND the per-user min-week window both reuse that
    partitioning (hash on a subset of the grouping keys satisfies the
    aggregate's clustering requirement) — no cohort join at all.  The
    remaining exchanges move only the already-tiny (cohort, offset)
    cells."""
    ev = load_events(spark, sf_dir)
    activity = (
        ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
        )
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id")
    with_cohort = activity.withColumn(
        "cohort_week", F.min("active_week").over(w)
    )
    return (
        with_cohort.groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_top_paths",
    oracle=(
        "WITH marked AS ("
        "  SELECT user_id, ts, event_id, event_type, "
        "         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE "
        "              THEN 0 ELSE 1 END AS is_new "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "numbered AS ("
        "  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "            ROWS UNBOUNDED PRECEDING) AS session_seq FROM marked), "
        "paths AS ("
        "  SELECT user_id, session_seq, "
        "         string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
        "  FROM numbered GROUP BY user_id, session_seq) "
        "SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path "
        "ORDER BY n_sessions DESC, path LIMIT 10"
    ),
    tags=("events",),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent within-session event-type paths.

    The per-session path is folded ORDER-DETERMINISTICALLY without an
    ordered-aggregate primitive (Spark has none): collect the session's
    (ts, event_id, type) structs, ``array_sort`` them (struct comparison
    is field-lexicographic, and (ts, event_id) is a total order), then
    project the types and join.  Session rows are bounded by session
    length, so the per-group array is small by construction.  The session
    fold reuses the window's user_id partitioning; only path-count cells
    reach the final (tiny) top-k sort, made deterministic by the
    (count DESC, path) tiebreak."""
    numbered = with_sessions(load_events(spark, sf_dir))
    paths = (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "events_anomaly",
    oracle=(
        "WITH cents AS ("
        "  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c FROM events), "
        "stats AS ("
        "  SELECT event_type, "
        "         CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1, "
        "         CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3 "
        "  FROM cents GROUP BY event_type) "
        "SELECT c.event_type, COUNT(*) AS n_total, "
        "       COUNT(*) FILTER (WHERE c.c < s.q1 - 3 * (s.q3 - s.q1) "
        "                           OR c.c > s.q3 + 3 * (s.q3 - s.q1)) AS n_outliers, "
        "       s.q1 - 3 * (s.q3 - s.q1) AS lo_fence, "
        "       s.q3 + 3 * (s.q3 - s.q1) AS hi_fence "
        "FROM cents c JOIN stats s USING (event_type) "
        "GROUP BY c.event_type, s.q1, s.q3 ORDER BY c.event_type"
    ),
    tags=("events",),
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection with Tukey fences (3×IQR) on
    exact floor-cents integers.

    Determinism by construction: the metric is an exact BIGINT
    (floor-cents), the quartiles are DISCRETE (actual data values, no
    interpolation — `percentile_disc` here, `quantile_disc` in the
    oracle), and the fences are pure integer arithmetic, so the
    outlier count cannot drift on float summation order the way a
    mean/stddev z-score would across engines or partitionings.

    Plan: the per-type stats aggregate is tiny (|event types| rows) and
    broadcast back onto the scan — the corpus itself never shuffles;
    the final rollup moves per-type cells only."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.floor(F.col("value") * 100).alias("c")
    )
    stats = ev.groupBy("event_type").agg(
        F.expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS BIGINT)").alias("q1"),
        F.expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS BIGINT)").alias("q3"),
    )
    lo = F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
    joined = ev.join(F.broadcast(stats), "event_type").select(
        "event_type", "c", lo.alias("lo"), hi.alias("hi")
    )
    return (
        joined.groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(
                F.when((F.col("c") < F.col("lo")) | (F.col("c") > F.col("hi")), 1)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_total",
            "n_outliers",
            F.col("lo").alias("lo_fence"),
            F.col("hi").alias("hi_fence"),
        )
        .orderBy("event_type")
    )


@query(
    "events_gap_fill",
    oracle=(
        "WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, "
        "                       MAX(CAST(ts AS DATE)) AS hi FROM events), "
        "spine AS (SELECT CAST(unnest(generate_series(lo, hi, "
        "                 INTERVAL 1 DAY)) AS DATE) AS d FROM bounds), "
        "types AS (SELECT DISTINCT event_type FROM events), "
        "daily AS (SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n "
        "          FROM events GROUP BY 1, 2) "
        "SELECT s.d, t.event_type, COALESCE(dy.n, 0) AS n_events "
        "FROM spine s CROSS JOIN types t "
        "LEFT JOIN daily dy ON dy.d = s.d AND dy.event_type = t.event_type"
    ),
    tags=("events",),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event counts on a COMPLETE date spine — days with no
    events of a type report an explicit 0 (the gap-filling every
    time-series rollup needs before charting/forecasting; a plain GROUP BY
    silently drops empty days).

    Scale shape: the only data-sized work is the (day, type) hash
    aggregate over the fact scan.  The spine is generated from the
    min/max bounds with ``sequence()`` — |days| × |types| rows, trivially
    broadcast — and the gap-fill is a broadcast left join of spine against
    the already-aggregated daily counts: the raw events are never joined
    or re-shuffled."""
    ev = load_events(spark, sf_dir).select(
        F.to_date("ts").alias("d"), "event_type"
    )
    daily = ev.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # bounds and the type list derive from the AGGREGATE (|days|×|types|
    # rows), not the raw events — one fact scan total, not three
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    types = daily.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(daily, ["d", "event_type"], "left")
        .select(
            "d", "event_type", F.coalesce("n", F.lit(0)).alias("n_events")
        )
    )


@query(
    "events_attribution",
    oracle=(
        "WITH p AS (SELECT event_id AS pid, user_id, ts AS pts, value "
        "           FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT event_id AS vid, user_id, ts AS vts "
        "      FROM events WHERE event_type = 'view'), "
        "j AS (SELECT p.pid, p.value, v.vid FROM p JOIN v "
        "      ON p.user_id = v.user_id AND v.vts <= p.pts "
        "         AND v.vts > p.pts - INTERVAL 7 DAY), "
        "per AS (SELECT pid, vid, "
        "        CAST(floor(value / (COUNT(*) OVER (PARTITION BY pid)) "
        "                   * 1000000 + 0.5) AS BIGINT) AS credit_u FROM j) "
        "SELECT vid AS view_id, CAST(COUNT(*) AS BIGINT) AS n_conversions, "
        "       CAST(SUM(credit_u) AS DOUBLE) / 1000000 AS attributed_value "
        "FROM per GROUP BY vid"
    ),
    tags=("events",),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's views in the prior 7 days; per view, the
    number of conversions it gets credit for and the attributed value.

    Scale shape: the purchase→view pairing is the equi+band join
    (user_id key keeps it hash/SMJ — never a nested loop; the 7-day
    band is a post-join filter), the per-purchase touch count is a
    window on the purchase key (well-distributed — one row per
    qualifying touch), and the final rollup is one hash aggregate on
    the view key.  Credits quantize to an integer micro grid BEFORE the
    sum (``floor(x·1e6 + 0.5)`` — pure IEEE, bit-identical in both
    engines) so cross-engine float summation order cannot flip the
    result; the exact integer total divides once at presentation."""
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    j = p.join(
        v,
        (p["user_id"] == v["user_id"])
        & (v["vts"] <= p["pts"])
        & (v["vts"] > p["pts"] - F.expr("INTERVAL 7 DAYS")),
    ).select("pid", "value", "vid")
    per = j.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("pid"))
    ).withColumn(
        "credit_u",
        F.floor(F.col("value") / F.col("n") * 1_000_000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return per.groupBy(F.col("vid").alias("view_id")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        (F.sum("credit_u").cast("double") / F.lit(1_000_000)).alias(
            "attributed_value"
        ),
    )


_SESSIONS_SQL = (
    "WITH marked AS ("
    "  SELECT user_id, ts, event_id, "
    "         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE "
    "              THEN 0 ELSE 1 END AS is_new "
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "numbered AS ("
    "  SELECT user_id, ts, "
    "         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "                           ROWS UNBOUNDED PRECEDING) AS session_seq "
    "  FROM marked), "
    "sessions AS ("
    "  SELECT user_id, CAST(session_seq AS INT) AS session_seq, "
    "         MIN(ts) AS st, MAX(ts) AS en "
    "  FROM numbered GROUP BY user_id, session_seq)"
)


@query(
    "join_interval_overlap",
    oracle=(
        _SESSIONS_SQL + " "
        "SELECT a.user_id, a.session_seq, "
        "       COUNT(b.user_id) AS n_concurrent "
        "FROM sessions a "
        "LEFT JOIN sessions b "
        "  ON b.user_id <> a.user_id AND b.st <= a.en AND a.st <= b.en "
        "GROUP BY a.user_id, a.session_seq"
    ),
    tags=("events", "join"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, the time-series workhorse Spark has no
    native operator for (Databricks range-join / TimescaleDB overlap
    semantics): for every user session, how many OTHER users had a
    session overlapping it in time?

    The oracle is the naive theta self-join (DuckDB's IEJoin eats it).  A
    theta join on Spark is a nested-loop cartesian — the classic 100 TB
    bomb — so the implementation blocks by time: each interval explodes
    to the hour buckets it spans (``sequence`` — overlapping intervals
    share at least one bucket, because both contain some instant t and
    hence t's bucket), candidates meet in a bucket equi-join (hash
    shuffle, AQE-balanced), the exact overlap predicate then filters and
    a DISTINCT collapses the multi-bucket double-counts.  Long intervals
    fan out to more buckets — cost scales with total spanned hours, not
    pairs².  LEFT-join back to the session table restores zero-overlap
    sessions.
    """
    sess = (
        with_sessions(load_events(spark, sf_dir))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    hour = 3600
    bucketed = sess.select(
        "user_id",
        "session_seq",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("st") / hour).cast("bigint"),
                F.floor(F.unix_timestamp("en") / hour).cast("bigint"),
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("user_id").alias("a_user"),
        F.col("session_seq").alias("a_seq"),
        F.col("st").alias("a_st"),
        F.col("en").alias("a_en"),
        "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("b_user"),
        F.col("session_seq").alias("b_seq"),
        F.col("st").alias("b_st"),
        F.col("en").alias("b_en"),
        "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            (F.col("a_user") != F.col("b_user"))
            & (F.col("b_st") <= F.col("a_en"))
            & (F.col("a_st") <= F.col("b_en"))
        )
        .select("a_user", "a_seq", "b_user", "b_seq")
        .distinct()
    )
    counts = pairs.groupBy(
        F.col("a_user").alias("user_id"), F.col("a_seq").alias("session_seq")
    ).agg(F.count(F.lit(1)).alias("n_concurrent"))
    return (
        sess.select("user_id", "session_seq")
        .join(counts, ["user_id", "session_seq"], "left")
        .select(
            "user_id",
            "session_seq",
            F.coalesce("n_concurrent", F.lit(0).cast("bigint")).alias(
                "n_concurrent"
            ),
        )
    )


@query(
    "agg_session_window",
    oracle=(
        _SESSIONS_SQL + " "
        "SELECT user_id, st AS session_start, en AS session_end, "
        "       (SELECT COUNT(*) FROM numbered n "
        "        WHERE n.user_id = s.user_id "
        "          AND n.session_seq = s.session_seq) AS n_events "
        "FROM sessions s"
    ),
    tags=("events", "agg"),
)
def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` aggregation in batch mode — the
    engine-level dynamic-gap operator (``SessionWindowing`` +
    ``UpdatingSessionsExec`` merge adjacent events whose gap < 30 min
    inside the aggregate itself, no window-function pass).  The oracle
    re-derives sessions with the gaps-and-islands SQL every other events
    key uses, so this differential check certifies that Spark's built-in
    session semantics and the classic manual construction agree
    boundary-for-boundary.  The one semantic seam: at a gap of EXACTLY
    the threshold, the manual ``<=`` rule merges while ``session_window``
    (half-open [start, last+gap)) splits — distinguishable only by a
    microsecond-exact 1800.000000 s gap, of which the fixture has zero
    at every SF (verified against sf0.1; timestamps carry µs noise), so
    the differential check pins the common semantics, not the seam.

    ``session_window(ts, gap)`` emits a half-open [start, end) struct
    where end = last_ts + gap; the true closed session bounds are the
    MIN/MAX of the member timestamps, aggregated alongside.  One shuffle
    on user_id; per-group state is one open session — streaming-grade
    memory at any scale (this same operator is the batch twin of
    ``stream_session``)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "events_volume_anomaly",
    oracle=(
        "WITH daily AS ("
        "  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n "
        "  FROM events GROUP BY event_type, CAST(ts AS DATE)), "
        "stats AS ("
        "  SELECT event_type, quantile_cont(n, 0.5) AS med "
        "  FROM daily GROUP BY event_type), "
        "mad AS ("
        "  SELECT d.event_type, quantile_cont(abs(d.n - s.med), 0.5) AS mad "
        "  FROM daily d JOIN stats s USING (event_type) "
        "  GROUP BY d.event_type) "
        "SELECT d.event_type, d.day, d.n, s.med, m.mad, "
        "       CASE WHEN m.mad = 0 THEN NULL "
        "            ELSE round(abs(d.n - s.med) / (1.4826 * m.mad), 4) "
        "       END AS robust_z, "
        "       abs(d.n - s.med) > 3 * 1.4826 * m.mad AS is_anomaly "
        "FROM daily d JOIN stats s USING (event_type) "
        "JOIN mad m ON d.event_type = m.event_type "
        "ORDER BY d.event_type, d.day"
    ),
    tags=("events",),
)
def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly detection per event type — the
    median/MAD outlier rule (robust z-score, 1.4826 · MAD ≈ σ under
    normality; Leys et al. 2013) every ingestion pipeline runs to catch
    broken trackers and bot floods before the data poisons training.
    The reference's positioning is exactly this operational-analytics
    shape (``doc/DesignDocument.md:4-8``).  Complements
    ``events_anomaly`` (per-ROW value outliers via Tukey fences): this
    key detects anomalous DAYS in the volume time series per type.

    Scale story: ONE corpus scan and one data-sized shuffle — the
    partial-agg group-by to (event_type, day) cells; median and MAD are
    CHAINED window aggregates over that bounded types × days frame
    partitioned by event_type, sharing a single (tiny) exchange.  The
    first draft computed med/MAD as separate group-bys joined back,
    which replanned the corpus aggregation per consumer — 4 full scans
    in the plan; the window form pins scans to 1 (tests).  Determinism:
    daily cells are exact COUNTs (bigint), and linear-interpolated
    percentile over integers yields exact binary fractions (x.0/x.5) in
    both engines, so med/MAD/threshold compares are bit-identical —
    no float-boundary membership flips (the reason this uses counts,
    not SUM(value))."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type")
    g = daily.withColumn("med", F.percentile("n", F.lit(0.5)).over(w))
    g = g.withColumn(
        "mad", F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).over(w)
    )
    dev = F.abs(F.col("n") - F.col("med"))
    return (
        g.select(
            "event_type",
            "day",
            "n",
            "med",
            "mad",
            F.when(F.col("mad") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(dev / (F.lit(1.4826) * F.col("mad")), 4))
            .alias("robust_z"),
            (dev > F.lit(3 * 1.4826) * F.col("mad")).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
