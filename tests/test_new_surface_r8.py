"""Invariants for the round-8 additions and scale fixes: the bounded
BPE training collect, SQL catalog verbs, mview commit batching, and the
external-layout attach seam.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_bpe_vocab_collect_is_capped(spark):
    """r7 verdict's one scale flag: bpe_fit collected the FULL word-count
    vocabulary driver-side (multi-GB at 100 TB).  Pin the fix: (a) the
    collect is bounded by max_word_types; (b) the cap is planned as a
    top-N (TakeOrderedAndProject), not a global sort shuffle; (c) the
    fixture vocabulary sits under the default cap, so the learned merge
    table is unchanged by the cap's introduction."""
    from hivekudu_handler_spark.pipeline.bpe_train import (
        _MAX_WORD_TYPES,
        bpe_fit,
        word_counts,
    )
    from hivekudu_handler_spark.tables import load_table

    d = load_table(spark, SF, "documents")
    vocab_n = word_counts(d).count()
    assert vocab_n < _MAX_WORD_TYPES  # (c) precondition at fixture scale

    # (a) a tiny cap really bounds what merge learning sees: train with
    # cap 10 (< the fixture's vocabulary) and verify it equals training
    # on the exact top-10 list
    assert vocab_n > 10
    d2, merges_capped = bpe_fit(spark, SF, n_merges=8, max_word_types=10)
    top10 = [
        (r["word"], r["cnt"])
        for r in word_counts(d2)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(10)
        .collect()
    ]
    assert len(top10) == 10
    from hivekudu_handler_spark.pipeline.bpe_train import learn_merges

    assert merges_capped == learn_merges(sorted(top10), 8)

    # (b) plan shape: sort+limit must fold into TakeOrderedAndProject
    capped_plan = (
        word_counts(d)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(_MAX_WORD_TYPES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in capped_plan

    # (c) default-cap merges == unbounded merges on the fixture
    _, merges_default = bpe_fit(spark, SF, n_merges=8)
    _, merges_unbounded = bpe_fit(spark, SF, n_merges=8, max_word_types=1 << 30)
    assert merges_default == merges_unbounded


def test_sql_show_verbs(spark, tmp_path):
    """SHOW TABLES / LIKE globs / SHOW CREATE TABLE semantics the
    ddl_show_tables oracle can't see: view listing, external rendering
    with honest re-parse rejection, LIKE with no match, parse errors."""
    import pytest

    from hivekudu_handler_spark.sources.sql_ddl import SqlDdlError, execute
    from hivekudu_handler_spark.sources.table_store import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    execute(
        store,
        "CREATE TABLE t1 (id int, name string) "
        "TBLPROPERTIES ('kudu.key_columns'='id')",
    )
    execute(store, "CREATE VIEW v1 AS SELECT id FROM t1")

    # external attach renders EXTERNAL + LOCATION and re-parse REJECTS it
    ext_path = str(tmp_path / "ext.parquet")
    spark.range(3).selectExpr("id AS k", "CAST(id AS STRING) AS s").write.parquet(
        ext_path
    )
    store.attach_external("ext_t", ext_path, ["k"])

    names = [r["tab_name"] for r in execute(store, "SHOW TABLES").collect()]
    assert names == sorted(names)
    assert {"t1", "v1", "ext_t"} <= set(names)

    assert [
        r["tab_name"] for r in execute(store, "SHOW TABLES LIKE 'zzz*'").collect()
    ] == []
    assert [
        r["tab_name"] for r in execute(store, "SHOW TABLES LIKE 't1|v*'").collect()
    ] == ["t1", "v1"]

    ext_ddl = execute(store, "SHOW CREATE TABLE ext_t").collect()[0][
        "createtab_stmt"
    ]
    assert "CREATE EXTERNAL TABLE" in ext_ddl and f"LOCATION '{ext_path}'" in ext_ddl
    with pytest.raises(SqlDdlError):
        execute(store, ext_ddl.replace("ext_t", "ext_t2"))

    view_ddl = execute(store, "SHOW CREATE TABLE v1").collect()[0][
        "createtab_stmt"
    ]
    execute(store, view_ddl.replace(" v1 ", " v2 "))
    assert "v2" in store.list_views()

    with pytest.raises(SqlDdlError):
        execute(store, "SHOW GRANTS")


def test_mview_recover_key_is_sensitive(spark):
    """mview_recover's oracle only proves recovery if the poison row
    would otherwise SURVIVE: replay the same scenario but omit the
    pending marker (so REBUILD has nothing to recover from) and assert
    the poisoned aggregate is then visibly wrong — i.e. the driver key
    genuinely fails when the two-phase recovery machinery is bypassed."""
    import shutil

    from pyspark.sql import functions as F

    from hivekudu_handler_spark.operators.ddl import _scratch_store
    from hivekudu_handler_spark.sources.sql_ddl import sql as run_sql
    from hivekudu_handler_spark.tables import load_events

    ev = load_events(spark, SF).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    store, d = _scratch_store(spark)
    try:
        run_sql(
            store,
            "CREATE TABLE evr (event_id bigint, event_type string, "
            "cents bigint) TBLPROPERTIES ('kudu.key_columns'='event_id')",
        )
        store.insert("evr", ev.filter(F.col("event_id") % 2 == 0))
        run_sql(
            store,
            "CREATE MATERIALIZED VIEW mvr AS "
            "SELECT event_type, COUNT(*) AS n_rows, SUM(cents) AS sum_cents "
            "FROM evr GROUP BY event_type",
        )
        store.upsert("evr", ev.filter(F.col("event_id") % 2 == 1))
        poison = store.scan("mvr").limit(1).select(
            "event_type",
            (F.col("n_rows") + 999_999).alias("n_rows"),
            (F.col("sum_cents") + 123_456_789).alias("sum_cents"),
        )
        store.upsert("mvr", poison)  # torn merge, but NO pending marker

        run_sql(store, "ALTER MATERIALIZED VIEW mvr REBUILD")
        total = store.scan("mvr").agg(F.sum("n_rows")).collect()[0][0]
        true_total = ev.count()
        # without the marker the poison is not rolled back: the refresh
        # applies deltas on top of the poisoned state
        assert total != true_total
        assert total >= true_total + 999_999
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_external_master_seam_errors(spark):
    """The cluster option surface: a real host:port quorum raises the
    documented unavailable-seam error naming the quorum; malformed
    addresses and missing options raise parse errors; write modes are
    validated."""
    import pytest

    from hivekudu_handler_spark.sources.cluster import (
        ExternalClusterUnavailableError,
        kudu,
    )
    from hivekudu_handler_spark.sources.table_store import TableStoreError

    r = (
        kudu(spark)
        .option("kudu.master_addresses", "kudu-master-1:7051,kudu-master-2:7051")
        .option("kudu.table_name", "t")
    )
    with pytest.raises(ExternalClusterUnavailableError) as exc:
        r.load()
    assert "kudu-master-1:7051" in str(exc.value)

    with pytest.raises(TableStoreError):
        kudu(spark).option("kudu.table_name", "t").load()  # no masters
    with pytest.raises(TableStoreError):
        kudu(spark).option(
            "kudu.master_addresses", "not an address"
        ).option("kudu.table_name", "t").load()
    with pytest.raises(TableStoreError):
        kudu(spark).mode("overwrite")


def test_semantic_dedup_keep_rule(spark):
    """dedup_semantic (SemDeDup-style): per-row keep/drop correctness
    against exact recomputed cosines, plus determinism.

    A vector is dropped iff SOME smaller-id vector in its cluster has
    cosine >= tau with it; so (a) every dropped vector must have such a
    witness, (b) every kept vector must have none, and (c) the minimum
    vec_id of every cluster is always kept."""
    import numpy as np

    from hivekudu_handler_spark.registry import load_all

    specs = load_all()
    out1 = sorted(tuple(r) for r in specs["dedup_semantic"].fn(spark, SF).collect())
    out2 = sorted(tuple(r) for r in specs["dedup_semantic"].fn(spark, SF).collect())
    assert out1 == out2  # deterministic end-to-end (no RNG)

    from hivekudu_handler_spark.pipeline.dedup import _SEM_TAU
    from hivekudu_handler_spark.tables import load_table

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }

    def cos(a, b):
        return float(
            np.dot(vecs[a], vecs[b])
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )

    by_cluster: dict[int, list[tuple[int, bool]]] = {}
    for vec_id, cent_id, is_dup in out1:
        by_cluster.setdefault(cent_id, []).append((vec_id, is_dup))
    assert len(out1) == len(vecs)  # every vector classified exactly once

    n_dropped = 0
    for members in by_cluster.values():
        members.sort()
        ids = [m[0] for m in members]
        assert not members[0][1]  # (c) cluster minimum always kept
        for vec_id, is_dup in members:
            witnesses = [o for o in ids if o < vec_id and cos(o, vec_id) >= _SEM_TAU]
            if is_dup:
                n_dropped += 1
                assert witnesses, f"dropped {vec_id} has no witness"  # (a)
            else:
                assert not witnesses, f"kept {vec_id} despite {witnesses}"  # (b)
    assert n_dropped > 0  # fixture must exercise the drop path


def test_simhash_banding_is_lossless(spark):
    """r8 oracle promotion of dedup_simhash rests on the pigeonhole
    claim: 4 bands × 15 bits means ≤3 flipped bits always leave one band
    intact, so the banded candidate join emits EXACTLY the brute-force
    all-pairs Hamming ≤ 3 set.  Verify by comparing the operator against
    a band-free crossJoin over the same signatures (affordable at
    fixture scale), and pin the cross-engine hash seam: Spark's
    conv(md5-prefix) must equal DuckDB's hex cast for the same token."""
    import duckdb

    from hivekudu_handler_spark.pipeline.dedup import (
        _SIMHASH_MAX_HAMMING,
        dedup_simhash,
    )

    out = {tuple(r) for r in dedup_simhash(spark, SF).collect()}

    # brute-force all-pairs over the derived signatures (no banding)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from hivekudu_handler_spark.pipeline.dedup import _SIMHASH_BITS
    from hivekudu_handler_spark.pipeline.text import tokens

    tf = (
        d.select("doc_id", F.explode(F.filter(tokens(), lambda x: x != "")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    )
    sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("th", j).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"b{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(_SIMHASH_BITS):
        t = F.shiftleft(F.when(F.col(f"b{j}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), j)
        sig = t if sig is None else sig.bitwiseOR(t)
    sigs = sums.select("doc_id", sig.alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        tuple(r)
        for r in a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id"),
            F.col("b.doc_id"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("h"),
        )
        .filter(F.col("h") <= _SIMHASH_MAX_HAMMING)
        .collect()
    }
    assert out == brute and out  # lossless banding, non-empty fixture

    # cross-engine token-hash seam (the oracle's entire validity)
    tok = "hello"
    spark_h = (
        spark.range(1)
        .select(F.conv(F.substring(F.md5(F.lit(tok)), 1, 15), 16, 10).cast("long"))
        .first()[0]
    )
    duck_h = duckdb.sql(
        f"SELECT CAST(concat('0x', substr(md5('{tok}'), 1, 15)) AS BIGINT)"
    ).fetchone()[0]
    assert spark_h == duck_h


def test_bloom_prefilter_admits_exactly_new_docs(spark, tmp_path):
    """Planted-fixture check of the bloom admission path: batch docs
    that normalize to an existing corpus fingerprint are rejected (even
    when raw text differs in case/punctuation), new docs are admitted,
    and the bloom has no false negatives (every corpus key probes hit
    against its own bitmap)."""
    from hivekudu_handler_spark.pipeline.bloom import (
        bloom_build,
        bloom_probe,
        dedup_bloom_prefilter,
    )

    rows = [
        # corpus (non-batch sources)
        (1, "the quick brown fox", "en", "src0", 19),
        (2, "hello world example", "en", "src1", 19),
        (3, "unrelated corpus doc", "en", "src2", 20),
        # batch: 10/11 are normalized dups of 1/2, 12/13 are new
        (10, "The QUICK, brown fox!!", "en", "src15", 22),
        (11, "hello   world — example", "en", "src16", 23),
        (12, "a genuinely new document", "en", "src17", 24),
        (13, "another brand new one", "en", "src18", 21),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r["doc_id"] for r in dedup_bloom_prefilter(spark, str(tmp_path)).collect()}
    assert out == {12, 13}

    # no false negatives: probing the corpus keys against their own
    # bitmap must hit on every key (the property the oracle rests on)
    from pyspark.sql import functions as SF_
    from hivekudu_handler_spark.pipeline.text import normalized

    corpus = df.filter(~SF_.col("source").isin("src15", "src16", "src17", "src18")).select(
        SF_.md5(normalized()).alias("fp")
    )
    probed = bloom_probe(corpus, bloom_build(corpus))
    assert probed.filter(~SF_.col("bloom_hit")).count() == 0


def test_bloom_prefilter_plan_shape(spark):
    """The bitmap and per-key hit tables broadcast (the batch side never
    shuffles into the probe), and nothing plans a cartesian.  The probe
    stage is asserted directly because the registered key checkpoints
    the probed batch (so both union branches reuse one execution) which
    truncates its plan from the final DataFrame."""
    from pyspark.sql import functions as SF_

    from hivekudu_handler_spark.pipeline.bloom import bloom_build, bloom_probe
    from hivekudu_handler_spark.pipeline.text import normalized
    from hivekudu_handler_spark.plans import checks
    from hivekudu_handler_spark.registry import load_all as _load

    df = _load()["dedup_bloom_prefilter"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    d = spark.read.parquet(f"{SF}/documents.parquet")
    fp = SF_.md5(normalized()).alias("fp")
    corpus = d.filter(~SF_.col("source").isin("src15", "src16")).select(fp)
    batch = d.filter(SF_.col("source").isin("src15", "src16")).select("doc_id", fp)
    probe_plan = checks.plan_string(bloom_probe(batch, bloom_build(corpus)))
    assert "CartesianProduct" not in probe_plan, probe_plan
    assert probe_plan.count("BroadcastExchange") >= 2, probe_plan  # bitmap + hits


def test_ivfpq_recall_and_cell_containment(spark):
    """sim_ivfpq stacks two approximations (IVF cell pruning + PQ
    scoring); pin (a) recall@10 ≥ 0.8 vs the exact operator, (b) every
    emitted neighbor lies in one of its query's probed cells (the scan
    really is cell-restricted), (c) the probe-restricted join broadcasts
    the probe list — no corpus shuffle, no cartesian."""
    import numpy as np

    from hivekudu_handler_spark.pipeline.pq import _normalize, sim_ivfpq
    from hivekudu_handler_spark.pipeline.similarity import (
        _IVF_CENTROIDS,
        _IVF_NPROBE,
        _ivf_assign,
    )
    from hivekudu_handler_spark.plans import checks
    from hivekudu_handler_spark.tables import load_table

    import re

    df = sim_ivfpq(spark, SF)
    plan = checks.plan_string(df)
    assert "CartesianProduct" not in plan, plan
    # the single BroadcastNestedLoopJoin NODE is _ivf_assign's
    # deliberate one-row broadcast centroid fold (a literal, not a
    # relation); count plan nodes, not text mentions (formatted explain
    # prints each node in the tree AND the detail list)
    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj_nodes) <= 1, plan

    out = df.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in out}
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in load_all()["sim_topk_cosine"].fn(spark, SF).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8

    # (b) emitted neighbors ⊆ probed cells
    e = _normalize(load_table(spark, SF, "embeddings"))
    cents = e.filter(F.col("vec_id") < _IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    cell = {
        r["vec_id"]: r["cent_id"]
        for r in _ivf_assign(e.select("vec_id", "v"), cents).collect()
    }
    qmat = {r["vec_id"]: np.array(r["v"]) for r in e.filter(F.col("vec_id") < 5).collect()}
    cmat = {r["cent_id"]: np.array(r["cv"]) for r in cents.collect()}

    def probe_list(q):
        sims = sorted(
            (
                (-(qmat[q] @ cv) / (np.linalg.norm(qmat[q]) * np.linalg.norm(cv)), cid)
                for cid, cv in cmat.items()
            )
        )
        return {cid for _, cid in sims[:_IVF_NPROBE]}

    for qid, nid in got:
        assert cell[nid] in probe_list(qid), (qid, nid)


def test_knn_graph_recall_and_coverage(spark):
    """sim_knn_graph: (a) recall@5 ≥ 0.8 vs exact numpy kNN over the
    fixture, (b) per-vector lists are rank-consecutive, neighbor-distinct
    and ≤ k, (c) emitted cosines are exact (match numpy to 4 dp), (d) the
    candidate join is banded — no cartesian in the plan."""
    import numpy as np

    from hivekudu_handler_spark.pipeline.similarity import _TOP_K_GRAPH
    from hivekudu_handler_spark.plans import checks
    from hivekudu_handler_spark.tables import load_table

    df = load_all()["sim_knn_graph"].fn(spark, SF)
    plan = checks.plan_string(df)
    assert "CartesianProduct" not in plan, plan
    out = df.collect()

    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    idx = {int(v): i for i, v in enumerate(ids)}

    per_vec: dict[int, list] = {}
    for r in out:
        per_vec.setdefault(r["vec_id"], []).append(r)
    hits = tot = 0
    for vid, rs in per_vec.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOP_K_GRAPH
        assert len({r["neighbor_id"] for r in rs}) == len(rs)
        for r in rs:  # (c) exact cosine on every edge
            true = S[idx[vid], idx[r["neighbor_id"]]]
            assert abs(r["cosine"] - round(float(true), 4)) < 1e-9, r
    for i, vid in enumerate(ids):
        exact = {int(ids[j]) for j in np.lexsort((ids, -S[i]))[:_TOP_K_GRAPH]}
        got = {r["neighbor_id"] for r in per_vec.get(int(vid), [])}
        hits += len(got & exact)
        tot += _TOP_K_GRAPH
    assert hits / tot >= 0.8, hits / tot
