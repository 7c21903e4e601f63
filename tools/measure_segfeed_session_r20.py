"""One-off measurement for SCALE.md r20 (r19 verdict item 8): deep-feed
cost in a LONG-LIVED session.

The r19 curve recorded depth-400 first touch at 12.8 s in a fresh
session but 51 s in a session that had already materialized three
shallower sweeps — "accumulated JVM/session state" was the suspected
cause.  Under the r20 span-aligned cache the same long-lived pattern
changes shape: the three shallower sweeps' aligned spans are exactly
the prefix the deep sweep needs, so the deep read materializes only
the NEW spans.  This script measures, in ONE session:

  1. sweep 0..100, 0..200, 0..300 (K=32) — the long-lived history;
  2. the deep read 0..400 — formerly the 51 s pathology;
  3. the same 0..400 after dropping every cached span (DROP-equivalent
     invalidation) — isolates cache reuse from other session state.

Run: python -m tools.measure_segfeed_session_r20
"""

from __future__ import annotations

import shutil
import tempfile
import time

from hivekudu_handler_spark.session import get_spark
from hivekudu_handler_spark.sources.table_store import (
    TableStore,
    changefeed_segmented,
)


def main() -> None:
    spark = get_spark()
    d = tempfile.mkdtemp(prefix="segfeed_session_")
    store = TableStore(spark, d)
    try:
        store.create_table("t", "id int, v string", ["id"])
        store.insert_values("t", [(1, "a"), (2, "b")])
        store.insert_values("t", [(3, "c")])
        store.truncate("t")
        while store.current_version("t") < 400:
            store.truncate("t")
        k = 32
        for depth in (100, 200, 300):
            t0 = time.time()
            changefeed_segmented(store, "t", 0, depth, segment_commits=k).count()
            print(
                f"sweep 0..{depth}: {time.time()-t0:6.2f} s "
                f"({len(store._segfeed_cache)} spans cached)",
                flush=True,
            )
        t0 = time.time()
        changefeed_segmented(store, "t", 0, 400, segment_commits=k).count()
        print(
            f"deep 0..400 in the long-lived session: {time.time()-t0:6.2f} s "
            f"({len(store._segfeed_cache)} spans cached)",
            flush=True,
        )
        # drop every span (what DROP TABLE / VACUUM invalidation does)
        # and re-pay the whole materialization inside the same session
        store._invalidate_segfeeds("t")
        t0 = time.time()
        changefeed_segmented(store, "t", 0, 400, segment_commits=k).count()
        print(
            f"deep 0..400 after full invalidation (same session): "
            f"{time.time()-t0:6.2f} s",
            flush=True,
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
