"""r18 lexer-seam regressions (r17 ADVICE + verdict item 4).

Three holes in the SQL front-end's hand-rolled fragment parsing, each
pinned here against its advice item:

* ``split_statements`` dropped comment characters without emitting a
  separator, merging adjacent tokens (``SELECT 1/*c*/FROM t`` ->
  ``SELECT 1FROM t``).
* the MERGE WHEN-clause splitter mis-split on ``CASE WHEN`` inside an
  ON/SET expression when a column is literally named ``matched``.
* ``_SUBQUERY_RE`` searched raw DML text, so a string literal
  containing ``(select`` spuriously paid ``register_views()`` (which
  re-plans every stored view and can clobber same-named session temp
  views).
"""

from __future__ import annotations

import pytest

from hivekudu_handler_spark.sources.sql_ddl import (
    _has_subquery,
    _split_keyword,
    execute,
    split_statements,
)
from hivekudu_handler_spark.sources.table_store import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh"))


# ---- comment = token separator --------------------------------------------

def test_block_comment_between_tokens_separates_them():
    assert split_statements("SELECT 1/*c*/FROM t; SELECT 2") == [
        "SELECT 1 FROM t",
        "SELECT 2",
    ]


def test_line_comment_and_string_semicolons_still_honored():
    got = split_statements(
        "SELECT 'a;b' AS s -- trailing; comment\n; SELECT 2/*x;y*/+1"
    )
    assert got == ["SELECT 'a;b' AS s", "SELECT 2 +1"]


# ---- CASE WHEN vs clause-level WHEN in the MERGE splitter ------------------

def test_split_keyword_skips_case_when_matched():
    segs = _split_keyword(
        "t.k = s.k AND CASE WHEN matched THEN 1 ELSE 0 END = 1 "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)",
    )
    assert len(segs) == 2
    assert "CASE WHEN matched THEN 1" in segs[0]
    assert segs[1].startswith("MATCHED THEN UPDATE")


def test_split_keyword_nested_case_and_string_literals():
    segs = _split_keyword(
        "x = 'WHEN MATCHED' AND CASE WHEN CASE WHEN matched THEN 1 END = 1 "
        "THEN 2 END = 2 WHEN NOT MATCHED THEN INSERT VALUES (1)",
        r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)",
    )
    assert len(segs) == 2
    assert segs[1].startswith("NOT MATCHED THEN INSERT")


def test_merge_with_column_named_matched(spark, store):
    store.create_table("tgt", "id int, matched int, v string", ["id"])
    store.insert_values("tgt", [(1, 0, "old"), (2, 1, "keep")])
    store.create_table("src", "id int, v string", ["id"])
    store.insert_values("src", [(1, "new"), (3, "ins")])
    execute(
        store,
        "MERGE INTO tgt t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET "
        "v = CASE WHEN t.matched = 1 THEN t.v ELSE s.v END "
        "WHEN NOT MATCHED THEN INSERT (id, matched, v) "
        "VALUES (s.id, 0, s.v)",
    )
    got = sorted(tuple(r) for r in store.scan("tgt").collect())
    assert got == [(1, 0, "new"), (2, 1, "keep"), (3, 0, "ins")]


# ---- subquery detection masks literals/comments ----------------------------

def test_has_subquery_masks_string_literals_and_comments():
    assert not _has_subquery("v = '(select x)'")
    assert not _has_subquery('v = "(SELECT 1)"')
    assert not _has_subquery("v = 1 /* (select hidden) */")
    assert _has_subquery("k IN (SELECT k FROM u)")
    assert _has_subquery("k IN ( /*c*/ SELECT k FROM u)")


def test_update_with_subquery_lookalike_literal_skips_view_replan(
    spark, store
):
    store.create_table("t", "id int, v string", ["id"])
    store.insert_values("t", [(1, "a"), (2, "b")])
    calls = []
    orig = store.register_views
    store.register_views = lambda *a, **k: (calls.append(1), orig(*a, **k))
    execute(store, "UPDATE t SET v = '(select x)' WHERE id = 1")
    assert not calls, "literal-only DML must not re-plan stored views"
    execute(store, "DELETE FROM t WHERE id IN (SELECT id FROM t WHERE v = 'b')")
    assert calls, "a real subquery still binds the views"
    assert sorted(r["v"] for r in store.scan("t").collect()) == ["(select x)"]
