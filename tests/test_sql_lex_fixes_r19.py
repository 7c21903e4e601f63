"""r19 lexer-seam regressions (r18 ADVICE, medium item).

The r18 CASE/END depth tracker in the MERGE clause splitter treated
QUALIFIED identifiers as keywords — CASE and END are non-reserved words
in Spark SQL, so both spellings below are valid column references, not
CASE-expression brackets:

* ``s.case`` in an ON condition incremented ``case_depth`` and silently
  swallowed every later real ``WHEN MATCHED`` clause head (the whole
  MERGE tail came back as one segment);
* ``t.end`` inside a genuine ``CASE ... END`` decremented the depth
  early, so a ``WHEN NOT matched`` CASE branch was mis-split as a
  clause head.

Two fixes, both pinned here:

* :func:`_dot_qualified` — a CASE/END/pattern word whose nearest
  non-space code neighbor on either side is ``.`` is skipped by the
  depth counter and the split pattern;
* the shared lexer (``sql_lex.sql_char_states``) now marks
  backtick-quoted identifiers as ``'ident'`` (non-code), so `` `end` ``
  / `` `case` `` column names — and commas/semicolons inside quoted
  identifiers — never reach any splitter at all.
"""

from __future__ import annotations

import pytest

from hivekudu_handler_spark.sources.sql_ddl import (
    _find_boundary_then,
    _split_keyword,
    _split_top,
    execute,
    split_statements,
)
from hivekudu_handler_spark.sources.sql_lex import sql_char_states
from hivekudu_handler_spark.sources.table_store import TableStore

_WHEN_HEAD = r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)"


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh"))


# ---- qualified CASE/END are column references, not brackets ----------------

def test_qualified_case_does_not_swallow_clause_heads():
    segs = _split_keyword(
        "t.k = s.k AND s.case = 1 "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
        _WHEN_HEAD,
    )
    assert len(segs) == 3  # ON text + two clause heads


def test_qualified_end_does_not_close_case_early():
    # the CASE is still open at the `WHEN NOT matched` branch — that
    # WHEN belongs to the CASE, not to the MERGE clause list
    segs = _split_keyword(
        "t.k = s.k AND CASE WHEN t.end > 0 THEN 1 "
        "WHEN NOT matched THEN 2 ELSE 0 END = 1 "
        "WHEN MATCHED THEN DELETE",
        _WHEN_HEAD,
    )
    assert len(segs) == 2
    assert "WHEN NOT matched THEN 2" in segs[0]


def test_whitespace_around_dot_still_qualifies():
    segs = _split_keyword(
        "t.k = s.k AND s . case = 1 WHEN MATCHED THEN DELETE",
        _WHEN_HEAD,
    )
    assert len(segs) == 2


def test_boundary_then_ignores_qualified_case_end():
    # AND <cond> THEN <action>: s.case must not open a CASE (which
    # would hide the clause-level THEN), t.end must not close the real
    # CASE early (which would surface the CASE's own THEN)
    text = "AND s.case = 1 THEN DELETE"
    i = _find_boundary_then(text)
    assert text[i:].startswith("THEN DELETE")
    text2 = "AND CASE WHEN t.end > 0 THEN 1 ELSE 0 END = 1 THEN DELETE"
    j = _find_boundary_then(text2)
    assert text2[j:].startswith("THEN DELETE")


def test_unqualified_case_end_still_tracked():
    # the r18 behavior this fix must NOT regress
    segs = _split_keyword(
        "t.k = s.k AND CASE WHEN matched THEN 1 ELSE 0 END = 1 "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        _WHEN_HEAD,
    )
    assert len(segs) == 2


# ---- backtick-quoted identifiers are non-code ------------------------------

def test_char_states_marks_backtick_identifiers():
    text = "SELECT `a;b``c`, 'x' FROM t"
    states = sql_char_states(text)
    start, stop = text.index("`"), text.rindex("`") + 1
    assert set(states[start:stop]) == {"ident"}
    assert states[text.index("'")] == "str"
    assert states[0] == "code"


def test_backtick_end_case_never_reach_depth_counter():
    segs = _split_keyword(
        "t.k = s.k AND `case` = 1 AND `end` = 2 "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        _WHEN_HEAD,
    )
    assert len(segs) == 2


def test_semicolon_and_comma_inside_backticks_do_not_split():
    assert split_statements("SELECT `a;b` FROM t; SELECT 2") == [
        "SELECT `a;b` FROM t",
        "SELECT 2",
    ]
    assert _split_top("`a,b`, c") == ["`a,b`", " c"]


# ---- end-to-end: MERGE over a table with a column named `case` -------------

def test_merge_with_qualified_case_column(spark, store):
    """doc/DesignDocument.md:9 upsert goal — a source column literally
    named ``case`` (non-reserved) referenced as ``s.case`` in the ON
    condition must not swallow the WHEN clauses."""
    store.create_table("mc", "k int, v int", ["k"])
    store.insert_values("mc", [(1, 10), (2, 20)])
    store.create_table("mc_src", "k int, v int, case int", ["k"])
    store.insert_values("mc_src", [(1, 100, 1), (3, 300, 1)])
    execute(
        store,
        "MERGE INTO mc AS t USING mc_src AS s "
        "ON t.k = s.k AND s.case = 1 "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    got = {r["k"]: r["v"] for r in store.scan("mc").collect()}
    assert got == {1: 100, 2: 20, 3: 300}


def test_trailing_dot_numeric_literal_before_end_still_closes_case():
    # `THEN 1. END` — the dot is a numeric literal's tail, not a
    # qualifier; END must still close the CASE so the clause-level
    # WHEN MATCHED splits
    segs = _split_keyword(
        "t.k = s.k AND CASE WHEN x THEN 1. ELSE 0. END = 1 "
        "WHEN MATCHED THEN DELETE",
        _WHEN_HEAD,
    )
    assert len(segs) == 2
