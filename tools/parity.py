"""Local differential harness: replicate the driver's DuckDB-oracle check.

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [key ...]

For every registered query key (or the given subset), runs the Spark
implementation and the DuckDB oracle on the same parquet tables and
compares row count, column names, and order-insensitive values.  Strict by
default (exact equality after canonicalization) so that passing here
predicts passing the driver's hash comparison.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from hivekudu_handler_spark.registry import load_all
from hivekudu_handler_spark.session import get_spark
from hivekudu_handler_spark.tables import TABLE_NAMES


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("|".join(canon_value(row[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    args = ap.parse_args()

    specs = load_all()
    keys = args.keys or [k for k, s in specs.items() if s.oracle]
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for key in keys:
        spec = specs[key]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if spec.oracle is None:
                print(f"  {key}: rows-only, {len(srows)} rows "
                      f"({time.time()-t0:.1f}s)")
                n_pass += 1
                continue
            ddf = con.sql(spec.oracle)
            dcols = [d[0] for d in ddf.description]
            drows = [tuple(r) for r in ddf.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"✗ {key}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sc = canon_rows(scols, srows)
            dc = canon_rows(dcols, drows)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b]
                problems.append(f"values differ in {len(diff)} of {len(sc)} rows")
                if args.show_diff and diff:
                    for a, b in diff[:5]:
                        print(f"    spark: {a}\n    duck : {b}")
        if problems:
            print(f"✗ {key}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"✓ {key}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
