"""Regenerate SURVEY.md §8 from the registry (single source of truth).

Round-1 lesson: the hand-maintained §8 table drifted from ``queries()``
(100 vs 99 vs 101 in three places).  This tool derives the table from
``load_all()`` so the inventory can't disagree with the code.  Run after
adding/removing keys:

    python tools/gen_survey_status.py
"""

from __future__ import annotations

import os
import re
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hivekudu_handler_spark.registry import load_all

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")

HEADER = "## 8. Implementation status"


def module_of(fn) -> str:
    mod = fn.__module__
    return mod.replace("hivekudu_handler_spark.", "").replace(".", "/") + ".py"


def generate() -> str:
    specs = load_all()
    by_module: "OrderedDict[str, list]" = OrderedDict()
    for spec in specs.values():
        by_module.setdefault(module_of(spec.fn), []).append(spec)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    n_rows = len(specs) - n_oracle
    lines = [
        f"{HEADER} (generated)",
        "",
        "This table is MACHINE-GENERATED from `registry.load_all()` by",
        "`tools/gen_survey_status.py` — the registry is the single source of",
        "truth for the key inventory.  `oracle` = DuckDB-differential-checked;",
        "`rows` = rows-only driver check (approx/LSH/stream semantics not",
        "SQL-expressible) with pytest invariant tests instead.",
        "",
        "| module | keys | oracle | rows-only |",
        "|---|---|---|---|",
    ]
    for mod, mod_specs in by_module.items():
        oracle_keys = [s.name for s in mod_specs if s.oracle is not None]
        rows_keys = [s.name for s in mod_specs if s.oracle is None]
        lines.append(
            f"| {mod} | {len(mod_specs)} | "
            f"{' '.join(f'`{k}`' for k in oracle_keys) or '—'} | "
            f"{' '.join(f'`{k}`' for k in rows_keys) or '—'} |"
        )
    lines += [
        "",
        f"**{len(specs)} keys total: {n_oracle} oracle-backed, {n_rows} "
        "rows-only.** Scale rationale per family: `SCALE.md`; plan-shape "
        "assertions: `tests/test_plans.py`; recall/invariant coverage for "
        "rows-only keys: `tests/test_pipeline.py`, `tests/test_streaming.py`, "
        "`tests/test_aggregates.py`.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    text = open(SURVEY).read()
    block = generate()
    pat = re.compile(r"## 8\. Implementation status.*\Z", re.DOTALL)
    if not pat.search(text):
        raise SystemExit("SURVEY.md has no §8 to replace")
    open(SURVEY, "w").write(pat.sub(block, text))
    print(f"rewrote §8 with {len(load_all())} keys")


if __name__ == "__main__":
    main()
