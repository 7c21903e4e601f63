"""Unit tests for the driver-facing coverage ordering
(tools/coverage_order.py + tools/source_hashes.py): the 50-row official
record window must spend itself on keys that lack, failed, or outgrew
their official verification — ordering bugs silently waste a round."""

from __future__ import annotations

from hivekudu_handler_spark.registry import QuerySpec
from tools.coverage_order import order_keys


def _spec(name, tags=(), oracle="SELECT 1"):
    return QuerySpec(name=name, fn=lambda spark, sf: None, oracle=oracle, tags=tags)


SPECS = {
    n: _spec(n)
    for n in ("a_err_new", "b_changed", "c_fresh", "d_err_repeat", "e_unknown", "f_ok")
}
SPECS["g_fresh_slow"] = _spec("g_fresh_slow", tags=("dedup",))

OK = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
ERR = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
NO_ORACLE = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"}

RECORDS = [
    (2, {"a_err_new": OK, "d_err_repeat": ERR, "b_changed": OK}),
    (3, {"a_err_new": ERR, "d_err_repeat": ERR, "e_unknown": OK, "f_ok": OK}),
]

SIDECAR = {
    "b_changed": {"2": "hash_old"},
    "f_ok": {"3": "hash_f"},
    # e_unknown: recorded in r3 but never stamped (pre-sidecar round)
}

CURRENT = {
    "a_err_new": "x",
    "b_changed": "hash_new",   # differs from stamped r2 hash -> changed
    "c_fresh": "x",
    "d_err_repeat": "x",
    "e_unknown": "x",
    "f_ok": "hash_f",          # matches stamped r3 hash -> verified-current
    "g_fresh_slow": "x",
}


def test_tier_order():
    got = order_keys(SPECS, RECORDS, sidecar=SIDECAR, current=CURRENT)
    assert got == [
        "a_err_new",     # newest record errored, previous was green
        "c_fresh",       # never recorded, cheap — a coverage HOLE, first
        "g_fresh_slow",  # never recorded, slow-tagged -> after cheap fresh
        "b_changed",     # source rewritten since its r2 record
        "e_unknown",     # recorded, no stamp -> presumed stale, above rest
        "d_err_repeat",  # errored in BOTH r2 and r3 -> demoted
        "f_ok",          # recorded and hash-verified current
    ]


def test_no_oracle_rows_only_is_not_an_error():
    specs = {"x": _spec("x", oracle=None), "y": _spec("y")}
    records = [(1, {"x": NO_ORACLE, "y": OK})]
    sidecar = {"x": {"1": "h"}, "y": {"1": "h"}}
    current = {"x": "h", "y": "h"}
    # x's no_oracle marker is a clean rows-only record, not a crash: both
    # keys are verified-current, registration order preserved
    assert order_keys(specs, records, sidecar=sidecar, current=current) == ["x", "y"]


def test_oracle_added_after_rows_only_record_promotes():
    """A key recorded as no_oracle whose spec NOW has an oracle is
    oracle-backed-but-never-oracle-recorded: it must enter the window
    ahead of stale and current keys regardless of source-hash state
    (r6 verdict: doc_pack_sequences/mm_audio_windows/mm_resize)."""
    specs = {
        "ok_current": _spec("ok_current"),
        "promoted_fresh_hash": _spec("promoted_fresh_hash"),
        "promoted_stale_hash": _spec("promoted_stale_hash"),
        "still_rows_only": _spec("still_rows_only", oracle=None),
    }
    records = [
        (4, {k: NO_ORACLE for k in specs if k != "ok_current"} | {"ok_current": OK})
    ]
    sidecar = {k: {"4": "h"} for k in specs}
    current = {
        "ok_current": "h",
        "promoted_fresh_hash": "h",      # hash unchanged — promoted anyway
        "promoted_stale_hash": "h2",     # hash changed — promoted, not tier-2
        "still_rows_only": "h",
    }
    got = order_keys(specs, records, sidecar=sidecar, current=current)
    assert got == [
        "promoted_fresh_hash",
        "promoted_stale_hash",
        "ok_current",
        "still_rows_only",
    ]


def test_missing_sidecar_degrades_to_unknown_stale():
    specs = {n: _spec(n) for n in ("recorded", "fresh")}
    records = [(1, {"recorded": OK})]
    got = order_keys(specs, records)
    # r5 policy: a NEVER-recorded key is a coverage hole and outranks a
    # recorded key that merely can't be proven current (which still has
    # an old green row behind it)
    assert got == ["fresh", "recorded"]


def test_registration_order_within_tiers():
    specs = {n: _spec(n) for n in ("k3", "k1", "k2")}
    assert order_keys(specs, []) == ["k3", "k1", "k2"]


def test_stale_rows_only_yields_window_to_fresh_oracle_keys():
    """A stale rows-only key re-certifies only "runs, returns N rows" —
    the weakest evidence class — so it must not crowd a never-recorded
    oracle-backed key out of the bounded window (r6: 39 stale keys
    would have displaced the r5 verdict's nine-key priority)."""
    specs = {
        "stale_rows_only": _spec("stale_rows_only", oracle=None),
        "stale_oracle": _spec("stale_oracle"),
        "fresh_oracle": _spec("fresh_oracle"),
    }
    records = [(1, {"stale_rows_only": NO_ORACLE, "stale_oracle": OK})]
    sidecar = {"stale_rows_only": {"1": "h1"}, "stale_oracle": {"1": "h1"}}
    current = {k: "h2" for k in specs}  # both recorded keys went stale
    got = order_keys(specs, records, sidecar=sidecar, current=current)
    assert got == ["fresh_oracle", "stale_oracle", "stale_rows_only"]


def test_sidecar_covers_every_latest_record():
    """On the real repo, every registry key's LATEST official record round
    must carry a source-hash stamp (tools/source_hashes.py backfill derives
    them from git), so the presumed-stale tier stays empty and staleness is
    always decided by hash comparison, never by absence of evidence."""
    import os

    from hivekudu_handler_spark.registry import load_all
    from tools.coverage_order import _history, load_correctness_records
    from tools.source_hashes import load_sidecar

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = _history(load_correctness_records(root))
    sidecar = load_sidecar(root)
    missing = [
        key
        for key in load_all()
        if key in hist and str(hist[key][-1][0]) not in sidecar.get(key, {})
    ]
    assert missing == []


def test_entry_surface_orders_registry(tmp_path):
    """__spark_entry__._ordered_specs must emit every registry key exactly
    once (the driver consumes this dict directly)."""
    import __spark_entry__ as entry
    from hivekudu_handler_spark.registry import load_all

    ordered = entry._ordered_specs()
    assert set(ordered) == set(load_all())
    assert len(ordered) == len(load_all())


def test_changed_tier_orders_oldest_evidence_first():
    """When multiple recorded keys have gone stale, the one whose record
    is OLDEST re-records first — its green row is the most misleading."""
    specs = {n: _spec(n) for n in ("stale_new", "stale_old")}
    records = [
        (1, {"stale_old": OK}),
        (4, {"stale_new": OK}),
    ]
    sidecar = {"stale_old": {"1": "h1"}, "stale_new": {"4": "h4"}}
    current = {"stale_old": "h1x", "stale_new": "h4x"}
    got = order_keys(specs, records, sidecar=sidecar, current=current)
    assert got == ["stale_old", "stale_new"]


def test_rest_tier_orders_oldest_record_first():
    """Hash-verified-current keys fill leftover window slots oldest
    record first: an r1 green row is worth re-certifying before an r4
    one even when both provably match the current source."""
    specs = {n: _spec(n) for n in ("ok_new", "ok_old")}
    records = [
        (1, {"ok_old": OK}),
        (4, {"ok_new": OK}),
    ]
    sidecar = {"ok_old": {"1": "h1"}, "ok_new": {"4": "h4"}}
    current = {"ok_old": "h1", "ok_new": "h4"}
    got = order_keys(specs, records, sidecar=sidecar, current=current)
    assert got == ["ok_old", "ok_new"]


def test_source_hash_includes_dependency_closure():
    """r7: a key's verified behavior is the code it RUNS — rewriting
    sources/table_store.py must change operators/ddl.py keys' hashes
    (the r6 round edited table_store materially without staling a single
    ddl key).  The registration hub (registry.py) must NOT propagate its
    load-everything imports, or every edit would stale every key."""
    from tools.source_hashes import _combined_hash, _fs_reader

    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    read = _fs_reader(root)

    def closure_of(entry):
        seen = {entry}
        # reuse the real hash fn via a tracing reader
        traced = set()

        def tread(rel):
            data = read(rel)
            if data is not None:
                traced.add(rel)
            return data

        _combined_hash(entry, tread)
        return traced

    ddl = closure_of("hivekudu_handler_spark/operators/ddl.py")
    assert "hivekudu_handler_spark/sources/table_store.py" in ddl
    # registry's imports don't propagate: windows.py stays narrow
    win = closure_of("hivekudu_handler_spark/operators/windows.py")
    assert "hivekudu_handler_spark/operators/windows.py" in win
    assert "hivekudu_handler_spark/sources/table_store.py" not in win
    assert len(win) < 8, win

    # and the hash really moves with a dependency edit
    base = _combined_hash("hivekudu_handler_spark/operators/ddl.py", read)

    def patched(rel):
        data = read(rel)
        if rel == "hivekudu_handler_spark/sources/table_store.py":
            return data + b"\n# changed"
        return data

    assert _combined_hash("hivekudu_handler_spark/operators/ddl.py", patched) != base


def test_per_key_hash_granularity():
    """r8: per-key function-closure hashing.  The r7 module-level
    granularity meant one additive edit (agg_mode) re-staled all 20
    aggregate keys; 159/209 keys entered r8 stale with almost no real
    behavior changes.  Pin the four properties that prevent that:

    1. appending an unrelated function to the defining module does NOT
       change an existing key's hash;
    2. editing the key's own body DOES;
    3. editing a same-module helper the key references DOES;
    4. editing an unreferenced part of a hub module (registry.load_all's
       import list) does NOT — but editing the cross-module helper the
       key actually calls (tables.load_table) DOES.
    """
    import os

    from tools.source_hashes import _ClosureWalker, _fs_reader

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    read = _fs_reader(root)
    agg_rel = "hivekudu_handler_spark/operators/aggregates.py"

    def hashes(patch=None):
        def pread(rel):
            data = read(rel)
            if patch and data is not None and rel in patch:
                return patch[rel](data)
            return data

        w = _ClosureWalker(pread)
        return {k: w.closure_hash(agg_rel, fn) for k, fn in w.query_keys(agg_rel).items()}

    base = hashes()
    assert "agg_count_star" in base and "agg_groupby" in base

    # 1. unrelated addition to the same module: no key hash moves
    added = hashes({agg_rel: lambda d: d + b"\n\ndef _brand_new_helper():\n    return 1\n"})
    assert added == base

    # 2. editing one key's body moves only that key
    def edit_count_star(data):
        # first occurrence only: the same expression text appears in
        # other aggregate bodies, and those must NOT be touched
        return data.replace(b'F.count(F.lit(1)).alias("cnt")', b'F.count(F.lit(2)).alias("cnt")', 1)

    edited = hashes({agg_rel: edit_count_star})
    assert edited["agg_count_star"] != base["agg_count_star"]
    assert edited["agg_groupby"] == base["agg_groupby"]

    # 3. editing the cross-module helper every key calls moves them all
    tables_rel = "hivekudu_handler_spark/tables.py"

    def edit_load_table(data):
        return data.replace(b"def load_table(", b"def load_table(  # edited\n")

    dep = hashes({tables_rel: edit_load_table})
    assert dep["agg_count_star"] != base["agg_count_star"]

    # 4. hub-module churn the key never references is absorbed
    reg_rel = "hivekudu_handler_spark/registry.py"

    def edit_load_all(data):
        return data.replace(b"def load_all(", b"def load_all(  # edited\n")

    hub = hashes({reg_rel: edit_load_all})
    assert hub == base

    # oracle SQL lives in the decorator: changing it must move the hash
    def edit_oracle(data):
        return data.replace(
            b'oracle="SELECT COUNT(*) AS cnt FROM lineitem"',
            b'oracle="SELECT COUNT(*) AS cnt2 FROM lineitem"',
        )

    orc = hashes({agg_rel: edit_oracle})
    assert orc["agg_count_star"] != base["agg_count_star"]


def test_fn_level_import_following_flag():
    """r18 landed the flag; r19 flipped the DEFAULT to ON (with a full
    historical backfill under the same algorithm).  Three pins:

    1. explicit flag OFF still reproduces the historical (pre-r19)
       algorithm — the backfill's reference semantics stay available;
    2. flag ON (now the default), an edit inside sql_ddl.execute moves
       exactly the keys that bind it via a function-level import
       (sql_describe_history), not bystanders in the same module
       (table_history);
    3. flag OFF, the same edit moves nothing — the blind spot the
       default flip closed.
    """
    import os

    from tools.source_hashes import _ClosureWalker, _fs_reader

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    read = _fs_reader(root)
    rel = "hivekudu_handler_spark/operators/snapshots.py"
    dep = "hivekudu_handler_spark/sources/sql_ddl.py"
    target = b'if verb == "TRUNCATE":'  # inside execute()'s body
    assert target in read(dep)

    def hashes(flag, patch=False):
        def pread(r):
            data = read(r)
            if patch and data is not None and r == dep:
                return data.replace(target, b'if verb == "TRUNCATED":', 1)
            return data

        w = _ClosureWalker(pread, follow_fn_imports=flag)
        return {
            k: w.closure_hash(rel, f) for k, f in w.query_keys(rel).items()
        }

    off_base, off_edit = hashes(False), hashes(False, patch=True)
    on_base, on_edit = hashes(True), hashes(True, patch=True)

    # 1. historical algorithm (explicit OFF) stays blind to the edit
    assert off_base == off_edit  # blind spot: edit invisible (pin 3)
    # ... and the constructor default IS the ON behavior since r19
    assert _ClosureWalker(read).follow_fn_imports is True
    # 2. flag ON sees through the function-level import ...
    assert on_base["sql_describe_history"] != on_edit["sql_describe_history"]
    # ... without staling same-module bystanders
    assert on_base["table_history"] == on_edit["table_history"]
