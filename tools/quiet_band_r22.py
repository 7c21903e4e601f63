"""Collect per-key quiet-band samples into a committed reference
(r21 VERDICT item 2 / carried r20 item 4).

Usage:
    python -m tools.quiet_band_r22 key1 [key2 ...] [--n=5] [--max-load=4.0]

Runs each key ``n`` times with bench.py's methodology (noop sink,
clearCache between passes, one warm-up action per session) and MERGES
every sample into ``tools/bench_history/quiet_band_r22.json``:

    {key: {"quiet_min": s, "quiet_max": s, "n_samples": n,
           "samples": [[seconds, load_1m_at_start], ...]}}

Band derivation is ORDER-STATISTIC, not load-gated: ``quiet_min`` is
the minimum over every recorded sample (ambient contention only ever
inflates a timing, so the minimum is the engine truth — the same
estimator bench.py's best-of-2 uses), and ``quiet_max`` is the MEDIAN
over every sample (robust to a minority of contended spikes).  Loadavg
at each sample's start and end is recorded as metadata.  Two earlier
gating designs failed on this host: start-load gating let mid-sample
contention spikes into the band (a 13 s contended sim_knn_graph sample
once entered as "quiet"), and start+end gating rejected nearly every
sample because a multi-second 32-core sample's OWN load pushes the
1-minute average past any honest gate.  ``--max-load`` is kept for
compatibility and stored as metadata only.
``tools/bench_compare.py`` reads this file: a candidate timing inside
``[0, max(1.5*quiet_min + 0.3, quiet_max)]`` is never flagged, which is
exactly the adjudication every round's verdict applied by hand from
prose notes.  Phase keys (``key:phase``) are supported.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PHASE_SPLIT, run_query  # noqa: E402
from hivekudu_handler_spark.registry import load_all  # noqa: E402
from hivekudu_handler_spark.session import default_sf_dir, get_spark  # noqa: E402

BAND_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "bench_history",
    "quiet_band_r22.json",
)


def _merge(band: dict, key: str, samples: list[list[float]], max_load: float) -> None:
    entry = band.setdefault(key, {"samples": []})
    entry["samples"].extend(samples)
    # sample = [seconds, load_at_start(, load_at_end)]; loads are
    # metadata — the band is min (engine truth) and median (robust
    # typical) over all samples, see module docstring
    vals = sorted(s[0] for s in entry["samples"])
    entry["n_samples"] = len(vals)
    entry["quiet_min"] = round(vals[0], 3)
    entry["quiet_max"] = round(vals[len(vals) // 2], 3)
    entry["max_load_gate"] = max_load


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    max_load = 4.0
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--max-load="):
            max_load = float(a.split("=", 1)[1])
    if not keys:
        print(__doc__)
        raise SystemExit(2)
    sf_dir = default_sf_dir()
    spark = get_spark("quiet-band-r22")
    specs = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    (
        spark.range(64).repartition(64).mapInPandas(_ident, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    band: dict = {}
    if os.path.exists(BAND_PATH):
        with open(BAND_PATH) as f:
            band = json.load(f)

    for name in keys:
        samples: list[list[float]] = []
        for _ in range(n):
            load = round(os.getloadavg()[0], 2)
            if ":" in name:
                key, _phase = name.split(":", 1)
                mod_name, fn_name, _label = PHASE_SPLIT[key]
                phases_fn = getattr(importlib.import_module(mod_name), fn_name)
                operate, cleanup = phases_fn(spark, sf_dir)
                try:
                    t0 = time.time()
                    run_query(operate())
                    dt = round(time.time() - t0, 3)
                finally:
                    cleanup()
            else:
                t0 = time.time()
                run_query(specs[name].fn(spark, sf_dir))
                dt = round(time.time() - t0, 3)
            samples.append([dt, load, round(os.getloadavg()[0], 2)])
            spark.catalog.clearCache()
        _merge(band, name, samples, max_load)
        print(f"  {name}: {samples}", file=sys.stderr, flush=True)

    with open(BAND_PATH, "w") as f:
        json.dump(band, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: band[k] for k in keys}, sort_keys=True))


if __name__ == "__main__":
    main()
