"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full physical plan into the noop sink (no driver
materialization, no collect) so the timing measures engine work, not
result transfer.

Each query runs TWICE and the minimum is recorded.  Rationale (r4→r5
bench audit, BENCH_NOTES.md): first execution of a plan shape pays
whole-stage-codegen compilation, JVM JIT, and Python-worker spawn, and
those costs vary 2-3x run-to-run on a shared host — r4's "2.3x uniform
regression" on untouched plans was exactly this noise.  The min of two
passes is the standard microbenchmark estimator for the engine's actual
cost; steady-state throughput is what matters at 100 TB where per-plan
compilation amortizes to zero.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hivekudu_handler_spark.registry import load_all
from hivekudu_handler_spark.session import default_sf_dir, get_spark

# Headline queries: one per operator family, weighted toward the
# shuffle/join/window-heavy paths that dominate at scale.
HEADLINE = [
    "q1_pricing_summary",   # scan → filter → groupBy w/ 8 aggregates
    "sql_q6_forecast_revenue",  # pure pushdown scan-agg (TPC-H Q6)
    "sql_q3_shipping_priority", # 3-join + group-topk (TPC-H Q3)
    "sql_q7_volume_shipping",   # 6-way volume-shipping join (TPC-H Q7)
    "sql_q10_returned_items",   # fact⋈fact + broadcast dims + top-20
    "sql_q18_large_volume",     # grouped-HAVING semi-join (TPC-H Q18)
    "sql_q8_market_share",      # 8-relation join tree (TPC-H Q8)
    "sql_q21_waiting_supplier", # EXISTS + NOT EXISTS over the fact (TPC-H Q21)
    "sql_q2_min_cost_supplier", # twice-referenced CTE + correlated MIN (TPC-H Q2)
    "sql_q9_product_profit",    # 5-relation fact-fact join tree (TPC-H Q9)
    "scan_full",            # raw scan throughput
    "filter_range",         # pushdown + range predicates
    "scan_range_pruned",    # key-range layout: pruned interval scan
    "join_inner",           # shuffle join
    "join_broadcast",       # broadcast dimension join + agg
    "join_range",           # equi+band join
    "join_asof",            # applyInPandas sorted merge
    "agg_distinct",         # count-distinct expand
    "agg_grouping_sets",    # rollup
    "agg_pivot",            # single-shuffle conditional cross-tab
    "join_salted",          # compound (key, salt) skew-spread join
    "win_agg_frame",        # window frames over events
    "topk_per_group",       # window group limit
    "sort_global",          # range-partitioned global sort
    "set_union",            # union + dedup
    "dedup_exact_docs",     # hash dedup
    "dedup_ngram_jaccard",  # shingle inverted-index join
    "dedup_minhash",        # minhash-lsh + verify
    "dedup_cluster",        # connected components over near-dup pairs
    "dedup_embedding",      # block-pair cosine matmul
    "dedup_ann_verified",   # LSH candidates -> exact verify (sub-quadratic path)
    "sim_topk_cosine",      # brute-force ANN baseline
    "sim_ann_lsh",          # LSH ANN
    "text_quality",         # text pipeline built-ins
    "text_langid",          # marker scoring
    "text_decontaminate",   # broadcast eval-vocab probe of corpus shingles
    "sample_global_shuffle",  # range-partitioned deterministic permutation
    "stream_session",       # session windows (batch mode)
    "mm_byte_features",     # mapInPandas Arrow path
    "events_sessionize",    # gaps-and-islands sessions, single data shuffle
    "events_retention",     # cohort retention, repartition-reuse plan
    "dedup_span_ngram",     # positioned-gram inverted index + span merge
    "scan_snapshot",        # MVCC as-of read across data/ + archive/
    "stream_upsert_sink",   # multi-batch foreachBatch LWW merge into keyed table
    "mview_incremental",    # materialized view kept current by manifest-diff merge
    "sink_partitioned_prune",  # hive-partitioned write + directory-pruned agg
    "text_tfidf",           # explode + 3 keyed shuffles (tf, df, top-3 window)
    "emb_kmeans_lloyd",     # 3 Lloyd passes, broadcast-literal assignment
    "events_gap_fill",      # date-spine zero-fill over broadcast joins
    "sim_ivf_kmeans",       # Lloyd-fitted IVF: fit + cell probe + exact verify
    "dedup_incremental",    # batch-vs-corpus inverted-index pairing (delta-sized)
    "join_asof_forward",    # next-touchpoint as-of direction
    "mm_image_phash_dedup", # decode -> aHash -> pigeonhole-banded visual dedup
    "text_lm_score",        # corpus bigram LM: count shuffles + vocab join-back
    "join_interval_overlap",  # hour-bucket-blocked interval self-join
    "sim_pq_adc",           # PQ codes scan + ADC tables + exact re-rank
    "text_bpe_train",       # vocab-count shuffle + driver merge-learn + encode
    "text_heavy_hitters",   # per-partition Misra-Gries + exact candidate verify
    "sim_range_search",     # radius query: broadcast probe, no ranking stage
    "dedup_containment",    # doc-in-doc via the shared shingle pair stats
    "join_asof_nearest",    # dual-frame nearest match over one shuffle
    "dedup_simhash",        # signed bit-sum signatures + pigeonhole bands (r8: md5-based)
    "dedup_bloom_prefilter",  # broadcast bloom admission + exact verify of hits
    "dedup_semantic",       # SemDeDup: cluster-local cosine dedup over embeddings
    "sim_ivfpq",            # IVF cell pruning × PQ codes × exact re-rank (FAISS IVFPQ shape)
    "sim_knn_graph",        # whole-corpus kNN graph via banded candidates + WindowGroupLimit
    "join_skew_aqe",        # 87%-hot-key join left to AQE's runtime skew split (r15)
    "join_dpp",             # hive-partitioned fact + runtime dynamicpruning subquery (r15)
    "join_runtime_bloom",   # InjectRuntimeFilter bloom semi-join pushdown (r15)
    "text_winnow_fingerprint",  # MOSS winnowing: per-position k-gram hash + window-min (r16)
    "events_volume_anomaly",  # daily-volume MAD outliers: 1 corpus shuffle + chained windows (r17)
    "cte_recursive",        # WITH RECURSIVE hierarchy walk: iterative frontier joins (r17)
    "scan_bloom_index",     # per-file bloom sidecar build + candidate-only point read (r17)
    "mview_join_incremental",  # two-table join-view delta rule off version diffs (r17)
    "table_bloom_lookup",   # managed bloom index: incremental REBUILD + candidate-only read (r17)
    "dml_column_defaults",  # NOT NULL guard riding the write + DEFAULT fill + partial UPSERT (r17)
    "dml_insert_select",    # bulk INSERT/UPSERT ... SELECT through the shared alignment path (r17)
    "table_changefeed",     # CDC read: per-commit diff terms, changed-tablet-only scans (r17)
    "sql_merge_cdc_apply",  # CHANGES BETWEEN feed -> MERGE mirror catch-up, one statement (r17)
]


# Scenario keys whose headline wall is dominated by one-time scaffold
# phases (r8 verdict item 6: BENCH_NOTES phase breakdowns show e.g.
# mview_incremental's 10 s is six lifecycle phases while the REBUILD —
# the number that matters at scale — is ~2 s).  For each, a phases
# helper builds the scaffold untimed and returns the operate thunk; the
# operate-only wall is emitted alongside the scenario wall under
# "phases" in the output JSON.
PHASE_SPLIT = {
    "mview_incremental": (
        "hivekudu_handler_spark.operators.snapshots",
        "mview_incremental_phases",
        "refresh_only",
    ),
    "scan_snapshot": (
        "hivekudu_handler_spark.operators.snapshots",
        "scan_snapshot_phases",
        "probe_only",
    ),
    "stream_upsert_sink": (
        "hivekudu_handler_spark.streaming.events",
        "stream_upsert_sink_phases",
        "stream_only",
    ),
    "join_dpp": (
        "hivekudu_handler_spark.operators.ddl",
        "join_dpp_phases",
        "pruned_join_only",
    ),
    "scan_bloom_index": (
        "hivekudu_handler_spark.operators.bloom_index",
        "scan_bloom_index_phases",
        "probe_only",
    ),
    "mview_join_incremental": (
        "hivekudu_handler_spark.operators.snapshots",
        "mview_join_incremental_phases",
        "refresh_only",
    ),
    "table_changefeed": (
        "hivekudu_handler_spark.operators.snapshots",
        "table_changefeed_phases",
        "feed_read_only",
    ),
    "sql_merge_cdc_apply": (
        "hivekudu_handler_spark.operators.snapshots",
        "sql_merge_cdc_apply_phases",
        "merge_only",
    ),
    # phases-only (not in HEADLINE — r17 adjudication: the 28 s scenario
    # wall is ~19 s DML scaffold + fixed availableNow latency); this
    # tracks the CDC consumer's per-batch steady state
    "stream_cdc_mirror": (
        "hivekudu_handler_spark.streaming.events",
        "stream_cdc_mirror_phases",
        "stream_only",
    ),
}


# Keys withheld from the STDOUT line only — full timings always land in
# BENCH_LOCAL.json and tools/bench_history.  At 79 suite entries the
# (1,1)-rounded line hit 1939 chars in r19, so the structural fallback
# fired and dropped the load array — blinding driver-side load gating
# (r19 verdict item 4).  A STATIC list keeps stdout membership
# deterministic across rounds (per-key driver history stays comparable
# key-for-key); each omitted key keeps a same-family sibling on the
# line, so no operator family loses its driver-side signal.  Membership
# is pinned against HEADLINE by tests/test_bench_compare.py.
STDOUT_OMIT = frozenset({
    "sql_q2_min_cost_supplier",   # 11 sql_q* siblings remain
    "sql_q21_waiting_supplier",
    "join_asof_nearest",          # join_asof / join_asof_forward stay
    "events_volume_anomaly",      # 3 events_* siblings remain
    "sample_global_shuffle",      # sub-0.3 s; curation family stays
})


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = default_sf_dir()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_start = os.getloadavg()
    spark = get_spark("bench")
    specs = load_all()
    # warm the JVM/codegen and the Python worker pool once so the first
    # timed query isn't charged session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    (
        spark.range(64)
        .repartition(64)
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # warm the Structured Streaming engine too (r15 verdict item 6): the
    # first streaming query of a session pays several seconds of
    # one-time engine init (state-store/offset-log classloading, trigger
    # machinery JIT) that otherwise lands inside stream_upsert_sink's
    # single-cold-pass phase wall — a fixed session cost, not data work
    import shutil
    import tempfile

    wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    try:
        spark.range(2).write.mode("overwrite").parquet(f"{wdir}/in")
        wq = (
            spark.readStream.schema("id long")
            .parquet(f"{wdir}/in")
            .writeStream.foreachBatch(lambda b, i: b.count())
            .option("checkpointLocation", f"{wdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not wq.awaitTermination(120):
            # stop BEFORE the finally rmtree pulls the dirs out from
            # under a still-running query (the run_upsert_sink rule)
            wq.stop()
            raise TimeoutError("streaming warm-up did not finish in 120 s")
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    timings: dict[str, float] = {}
    # host-load telemetry (r10 verdict item 3): one 1-minute loadavg
    # sample per query so a contention-dirty record self-describes —
    # the repo's own work shows up here too, so the signal is "load far
    # above the repo's own concurrency", not "load > 0".
    loadavg: dict[str, float] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run_query(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
            # queries are self-contained: drop any caches an operator
            # persisted so successive timings don't interfere
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        loadavg[name] = round(os.getloadavg()[0], 2)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # operate-phase walls for the scaffold-dominated scenario keys:
    # setup runs untimed, only the steady-state phase is measured
    # (single pass — the operate phases mutate scratch state and a
    # second run would not repeat the same work)
    import importlib

    phases: dict[str, float] = {}
    for key, (mod_name, fn_name, phase_label) in PHASE_SPLIT.items():
        phases_fn = getattr(importlib.import_module(mod_name), fn_name)
        operate, cleanup = phases_fn(spark, sf_dir)
        try:
            t0 = time.time()
            run_query(operate())
            phases[f"{key}:{phase_label}"] = round(time.time() - t0, 3)
        finally:
            cleanup()
        spark.catalog.clearCache()
        print(
            f"  {key}:{phase_label}: {phases[f'{key}:{phase_label}']}s",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 3)
    # compact host-load summary for the DRIVER-committed record (r17
    # verdict item 6: every regression adjudication leaned on loadavg
    # figures living only in BENCH_NOTES prose — BENCH_r{N}.json must
    # carry them machine-checkably).  Full per-query map stays in the
    # file record below; the stdout line gets this summary.
    qloads = sorted(loadavg.values())
    final_load = os.getloadavg()
    load_summary = {
        "start_1m": round(load_start[0], 2),
        "start_15m": round(load_start[2], 2),
        "q_1m_min": qloads[0],
        "q_1m_med": qloads[len(qloads) // 2],
        "q_1m_max": qloads[-1],
        "final_1m": round(final_load[0], 2),
        "final_15m": round(final_load[2], 2),
    }
    record = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "phases": phases,
        # per-query 1-min loadavg sampled right after each best-of-2
        # pair; lets the judge distinguish engine regression from host
        # contention without builder notes
        "loadavg_1m": loadavg,
        "loadavg": load_summary,
        "loadavg_final": [round(x, 2) for x in final_load],
        # methodology tag (r9 ADVICE): headline timings are best-of-2
        # warm; phase walls are one cold pass (the operate phases mutate
        # scratch state, so a second run would not repeat the same work)
        # — don't compare the two series against each other without this
        # caveat
        "phases_method": "single_cold_pass",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Durable full record: the driver captures only the last ~2000 chars
    # of output, and r10 (2049-char line), r11 (loadavg map added ~450
    # more) and r17 (79-entry suite, 2273 chars) all overflowed it,
    # leaving those BENCH_r{N}.json with parsed:null.  Write the
    # complete record to a file so the official numbers are never
    # front-truncated; the stdout line is built adaptively below to fit
    # the window with margin.
    # the local record lives under tools/bench_history/ (r21 verdict
    # item: at repo root it could be mistaken for a driver artifact)
    _hist_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_history"
    )
    os.makedirs(_hist_dir, exist_ok=True)
    with open(os.path.join(_hist_dir, "BENCH_LOCAL.json"), "w") as f:
        json.dump(record, f)
        f.write("\n")
    print("loadavg_1m: " + json.dumps(loadavg), file=sys.stderr, flush=True)
    # The stdout line must fit WHOLE inside the driver's 2000-char
    # output window or the official record gets parsed:null — which is
    # exactly what happened to BENCH_r17.json when the suite grew to 79
    # entries (2273 chars).  Changes vs r17: the phases map moves to the
    # file records (BENCH_LOCAL.json + tools/bench_history, which the
    # adjudications read anyway), the compact loadavg summary rides
    # along (r17 verdict item 6: [start_1m, start_15m, q_1m_min,
    # q_1m_med, q_1m_max, final_1m, final_15m]), and value rounding
    # degrades adaptively until the line fits with margin — full
    # 3-decimal timings always live in the file records.
    load_arr = [
        load_summary[k]
        for k in (
            "start_1m", "start_15m", "q_1m_min", "q_1m_med", "q_1m_max",
            "final_1m", "final_15m",
        )
    ]

    def _slim_line(ndigits_small: int, ndigits_big: int) -> str:
        shown = {k: v for k, v in timings.items() if k not in STDOUT_OMIT}
        slim = {
            "metric": record["metric"],
            "value": round(record["value"], 1),
            "unit": "sec",
            "queries": {
                k: round(v, ndigits_small if v < 1 else ndigits_big)
                for k, v in shown.items()
            },
            "load": load_arr,
            "sf": record["sf"],
        }
        if len(shown) != len(timings):
            slim["q_omitted"] = len(timings) - len(shown)
        return json.dumps(slim, separators=(",", ":"))

    # accept at <= 1850, not the window-proxy 1900: the driver caps at
    # ~2000 and the r20 verdict contract wants >= 50 chars of headroom
    # on the EMITTED line, not just on the cutoff
    for digits in ((2, 2), (2, 1), (1, 1)):
        line = _slim_line(*digits)
        if len(line) <= 1850:
            break
    else:
        # terminal fallback (r18 advice): if even (1,1) digits overflow
        # (the suite kept growing), degrade structurally rather than
        # print an over-window line that reverts the record to
        # parsed:null — drop the load array first, then truncate the
        # per-query map to the slowest entries that fit (headline value
        # and sf always survive; the FULL record is in tools/bench_history/BENCH_LOCAL.json
        # either way).
        print(
            f"bench: stdout line {len(line)} chars exceeds the driver's "
            "~2000-char window even at minimum rounding — degrading "
            "structurally (see tools/bench_history/BENCH_LOCAL.json)",
            file=sys.stderr,
            flush=True,
        )
        slim = json.loads(line)
        slim.pop("load", None)
        line = json.dumps(slim, separators=(",", ":"))
        # build from the omit-FILTERED map (r20 advice): rebuilding from
        # the full `timings` dict reintroduced the STDOUT_OMIT keys
        # while the (1,1) line's stale q_omitted rode along — the
        # emitted metadata must stay self-consistent on this path, with
        # q_omitted counting omit-list keys and queries_truncated
        # counting the cost-dropped remainder
        by_cost = sorted(
            ((k, v) for k, v in timings.items() if k not in STDOUT_OMIT),
            key=lambda kv: kv[1],
            reverse=True,
        )
        n_shown_full = len(by_cost)
        while len(line) > 1850 and by_cost:
            by_cost.pop()  # drop the cheapest remaining entry
            slim["queries"] = {
                k: round(v, 1) for k, v in sorted(by_cost)
            }
            slim["queries_truncated"] = n_shown_full - len(by_cost)
            line = json.dumps(slim, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
