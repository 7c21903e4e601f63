"""Physical-plan assertions (SURVEY.md §7 M3): prove the pushdowns the
reference only stubbed (``KuduStorageHandler.java:187-193`` returns an
empty DecomposedPredicate; goal ``doc/DesignDocument.md:10,40``) actually
happen in this engine, instead of trusting that they do.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the formatted plan's scan nodes."""
    return "\n".join(
        line for line in plan_string(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    return "\n".join(
        line for line in plan_string(df).splitlines() if "ReadSchema" in line
    )


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, f"no pushed filter on {column!r}; plan scans say:\n{pf}"


def assert_column_pruned(df: DataFrame, absent_column: str) -> None:
    rs = read_schema(df)
    assert rs, "no ReadSchema found in plan"
    assert absent_column not in rs, (
        f"column {absent_column!r} is read but should be pruned:\n{rs}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in:\n" + plan
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "expected no shuffle join in:\n" + plan
    )


def assert_top_k(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, (
        "expected TakeOrderedAndProject (top-k, no global sort) in:\n" + plan
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (AQE may later
    coalesce them, but plan-time exchanges bound the shuffle count).

    Formatted explain lists each node once in the tree and once in the
    details ("(4) Exchange"); count only the detail headers.
    """
    import re

    plan = plan_string(df)
    return len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.MULTILINE))
