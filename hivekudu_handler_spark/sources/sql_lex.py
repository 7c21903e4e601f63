"""Shared SQL lexical scanner — the ONE place the engine decides what
is a string literal and what is a comment.

Every hand-rolled splitter in the SQL front-end (statement splitting,
clause/fragment parsing, the version-clause rewrite mask) and the
table layer's DDL column-list parser ride this scanner, so the dialect
decision — Spark non-ANSI, where BOTH quote styles are string literals
(``session.py`` pins ``spark.sql.ansi.enabled=false``), doubling and
backslash escapes are live, and ``--`` / ``/* */`` comments exist —
is made exactly once.  Five independent single-quote-only trackers
predated this module; a comma or keyword inside a double-quoted or
backslash-escaped literal mis-split fragments (r17 review).
"""

from __future__ import annotations


def sql_char_states(text: str) -> list[str]:
    """Per-character lexical state of SQL text — ``'str'`` inside a
    string literal (quotes included), ``'ident'`` inside a
    backtick-quoted identifier (backticks included), ``'comment'``
    inside a ``--`` line or ``/* */`` bracketed comment (markers
    included), ``'code'`` otherwise.

    * BOTH quote characters open string literals (Spark non-ANSI).
    * Doubling (``''`` / ``""``) and backslash escapes are honored
      inside literals (both are live in Spark's default lexer).
    * Backticks quote identifiers (Spark's only identifier-quoting
      style in non-ANSI mode); a doubled backtick is the escape.
      Splitters treat ``'ident'`` like any non-code state, so a column
      literally named `` `end` `` / `` `case` `` / `` `when` `` (all
      non-reserved in Spark) never reaches a keyword counter, and a
      comma or semicolon inside a quoted identifier never splits
      (r18 advice).
    * Comments are quote-opaque (``-- don't`` doesn't open a string)
      and strings are comment-opaque (``'a -- b'`` keeps its tail).
    """
    states = ["code"] * len(text)
    i, n = 0, len(text)
    quote: str | None = None
    while i < n:
        ch = text[i]
        if quote:
            kind = "ident" if quote == "`" else "str"
            states[i] = kind
            if quote != "`" and ch == "\\" and i + 1 < n:
                states[i + 1] = kind
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and text[i + 1] == quote:
                    states[i + 1] = kind
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"'):
            states[i] = "str"
            quote = ch
        elif ch == "`":
            states[i] = "ident"
            quote = ch
        elif ch == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j == -1 else j
            for k in range(i, j):
                states[k] = "comment"
            i = j
            continue
        elif ch == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n if j == -1 else j + 2
            for k in range(i, j):
                states[k] = "comment"
            i = j
            continue
        i += 1
    return states
