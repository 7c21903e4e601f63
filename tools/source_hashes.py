"""Per-key source-hash sidecar for staleness-aware coverage ordering.

Problem (r3 verdict, "What's wrong" #2): the driver's official
CORRECTNESS record for a key certifies the code *as of the round that
recorded it*.  When an implementation is rewritten later (e.g.
``join_asof``: recorded green in r01, rewritten pure-JVM in r02), the
green row silently goes stale — nothing re-queues the key for official
re-verification.  This module makes staleness structural instead of
luck-of-the-window:

- ``current_hashes(specs)`` — sha256 of the *defining module's source
  file* for each registry key (module-level on purpose: helpers like
  ``_frame_sample`` live next to the registered fn, and an edit anywhere
  in the module is grounds for re-recording every key it defines).
- ``tools/source_hashes.json`` stores, per key, ``{round: hash}`` —
  the hash of the key's source at the end of each builder round N, i.e.
  the exact code state the driver verifies when it writes
  ``CORRECTNESS_r{N}.json``.
- ``snapshot(root, round)`` — run as the LAST step of a builder round
  (before the final commit): stamps every key's current hash under the
  upcoming record round.  ``tools/coverage_order.py`` then compares a
  key's latest-record-round hash against the current hash at ordering
  time; a mismatch (or a record from a pre-sidecar round with no stored
  hash) demotes the key into the needs-re-record tier.

CLI:
    python -m tools.source_hashes snapshot --round N   # end of round N-1,
                                                       # expecting record rN
    python -m tools.source_hashes bootstrap            # one-time: stamp the
        # newest CORRECTNESS round's keys with current hashes (valid ONLY
        # when run on the exact commit that round verified)
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
from typing import Mapping

SIDECAR = "tools/source_hashes.json"


def _module_hash_cache() -> dict[str, str]:
    return {}


def current_hashes(specs: Mapping[str, object]) -> dict[str, str]:
    """sha256 of each key's defining-module source file."""
    cache: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, spec in specs.items():
        mod = spec.fn.__module__
        if mod not in cache:
            src = inspect.getsourcefile(sys.modules[mod])
            with open(src, "rb") as f:
                cache[mod] = hashlib.sha256(f.read()).hexdigest()
        out[name] = cache[mod]
    return out


def load_sidecar(root: str) -> dict[str, dict[str, str]]:
    """{key: {round_str: hash}} or {} when the sidecar doesn't exist."""
    path = os.path.join(root, SIDECAR)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    hashes = data.get("hashes")
    return hashes if isinstance(hashes, dict) else {}


def save_sidecar(root: str, hashes: dict[str, dict[str, str]]) -> None:
    path = os.path.join(root, SIDECAR)
    with open(path, "w") as f:
        json.dump({"hashes": hashes}, f, indent=1, sort_keys=True)
        f.write("\n")


def stamp(root: str, round_no: int) -> int:
    """Record every registry key's current hash under ``round_no``."""
    from hivekudu_handler_spark.registry import load_all

    specs = load_all()
    cur = current_hashes(specs)
    hashes = load_sidecar(root)
    for key, h in cur.items():
        hashes.setdefault(key, {})[str(round_no)] = h
    save_sidecar(root, hashes)
    return len(cur)


def _newest_round(root: str) -> int:
    from tools.coverage_order import load_correctness_records

    rounds = [r for r, _ in load_correctness_records(root)]
    return max(rounds) if rounds else 0


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not argv:
        print(__doc__)
        return 2
    cmd = argv[0]
    if cmd == "snapshot":
        round_no = (
            int(argv[argv.index("--round") + 1])
            if "--round" in argv
            else _newest_round(root) + 1
        )
        n = stamp(root, round_no)
        print(f"stamped {n} keys for upcoming round r{round_no:02d}")
        return 0
    if cmd == "bootstrap":
        round_no = _newest_round(root)
        if round_no == 0:
            print("no CORRECTNESS records; nothing to bootstrap")
            return 1
        # Only stamp keys actually recorded in that round: for them (and
        # only them) the current tree is known to equal the verified tree.
        from hivekudu_handler_spark.registry import load_all
        from tools.coverage_order import load_correctness_records

        records = dict(load_correctness_records(root))
        recorded_keys = set(records[round_no])
        specs = load_all()
        cur = current_hashes(specs)
        hashes = load_sidecar(root)
        n = 0
        for key in recorded_keys & set(cur):
            hashes.setdefault(key, {})[str(round_no)] = cur[key]
            n += 1
        save_sidecar(root, hashes)
        print(f"bootstrapped {n} keys from CORRECTNESS_r{round_no:02d}")
        return 0
    print(f"unknown command: {cmd}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
