"""One-off measurement for SCALE.md r20: the advancing-range CDC
pattern (`CHANGES BETWEEN 0 AND <growing current version>`) under the
span-aligned cache vs the r19 whole-range cache's behavior (which this
round replaced) — the r19 key was (table, from, to, K), so EVERY
advance was a miss that re-materialized the whole history.

Run: python -m tools.measure_segfeed_r20
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
    d = tempfile.mkdtemp(prefix="segfeed_r20_")
    store = TableStore(spark, d)
    try:
        store.create_table("t", "id int, v string", ["id"])
        store.insert_values("t", [(1, "a"), (2, "b")])
        store.insert_values("t", [(3, "c")])
        store.truncate("t")
        k = 16
        depth_steps = [64, 96, 128]
        while store.current_version("t") < depth_steps[-1]:
            store.truncate("t")
        walls = []
        for to_v in depth_steps:
            t0 = time.time()
            feed = changefeed_segmented(store, "t", 0, to_v, segment_commits=k)
            n = feed.count()
            walls.append((to_v, time.time() - t0, n, len(store._segfeed_cache)))
        for to_v, w, n, c in walls:
            print(
                f"advance to depth {to_v}: first action {w:6.2f} s, "
                f"{n} events, {c} cached spans"
            )
        # steady state on the deepest range
        t0 = time.time()
        changefeed_segmented(store, "t", 0, depth_steps[-1], segment_commits=k).count()
        print(f"steady-state re-read at depth {depth_steps[-1]}: {time.time()-t0:.2f} s")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
