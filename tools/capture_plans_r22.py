"""Capture .explain("formatted") output for headline queries into
plans/r22/<key>_{before,after}.txt (r22 optimization round, guide §1).

Usage:
    python -m tools.capture_plans_r22 before [key ...]
    python -m tools.capture_plans_r22 after  [key ...]

With no keys given, captures every HEADLINE key.  Scenario keys whose
query function mutates scratch state are captured from the same
queries() callable the driver runs, so the plan is the returned
DataFrame's plan (for _materialize'd scenario results this is a
driver-side LocalRelation — noted in the file header; for those keys
the interesting plan is the operate() phase, captured separately when
a *_phases helper exists in bench.PHASE_SPLIT).
"""

from __future__ import annotations

import importlib
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import HEADLINE, PHASE_SPLIT  # noqa: E402
from hivekudu_handler_spark.registry import load_all  # noqa: E402
from hivekudu_handler_spark.session import default_sf_dir, get_spark  # noqa: E402


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    stage = sys.argv[1]
    assert stage in ("before", "after"), stage
    keys = sys.argv[2:] or HEADLINE
    sf_dir = default_sf_dir()
    spark = get_spark("plans-r22")
    specs = load_all()
    out_dir = Path(os.environ.get("PLANS_OUT_DIR", str(Path(__file__).resolve().parents[1] / "plans" / "r22")))
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in keys:
        path = out_dir / f"{name}_{stage}.txt"
        try:
            df = specs[name].fn(spark, sf_dir)
            text = formatted_plan(df)
        except Exception as exc:  # capture the failure, keep going
            text = f"ERROR capturing plan: {exc!r}\n"
        header = f"== {name} ({stage}, sf_dir={sf_dir}) ==\n"
        body = header + text
        # scenario keys return driver-materialized results; their real
        # compute plan is the operate() phase below
        if name in PHASE_SPLIT:
            mod_name, fn_name, phase_label = PHASE_SPLIT[name]
            try:
                phases_fn = getattr(importlib.import_module(mod_name), fn_name)
                operate, cleanup = phases_fn(spark, sf_dir)
                try:
                    body += (
                        f"\n== {name}:{phase_label} operate() phase plan ==\n"
                        + formatted_plan(operate())
                    )
                finally:
                    cleanup()
            except Exception as exc:
                body += f"\nERROR capturing phase plan: {exc!r}\n"
        path.write_text(body)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
