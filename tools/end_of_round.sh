#!/usr/bin/env bash
# End-of-round ritual — run as the LAST step of every builder round,
# immediately before the final commit.  This is the unskippable wrapper
# the r12-r14 verdicts asked for: it guarantees the source-hash sidecar
# is stamped for every (round, key) record that exists, stages the
# driver artifacts, and proves the coverage-order invariant green.
#
# Usage:  bash tools/end_of_round.sh            # stamp + stage + verify
#         bash tools/end_of_round.sh --commit   # ... then commit
set -euo pipefail
cd "$(dirname "$0")/.."

# 1. Stamp: backfill covers every verified CORRECTNESS record (past
#    rounds, from git blobs), snapshot pre-stamps the upcoming round
#    from the live tree so the driver's next record is never unstamped.
python -m tools.source_hashes backfill
python -m tools.source_hashes snapshot

# 1b. Keep SURVEY §8 (machine-generated key inventory) in sync with the
#     registry so new keys never leave it stale.
python -m tools.gen_survey_status

# 2. Stage the sidecar plus any driver artifacts left untracked.
#    Per-pattern adds: a single multi-glob `git add` aborts wholesale on
#    the first non-matching pathspec, silently staging NOTHING.
git add tools/source_hashes.json SURVEY.md
# BENCH_LOCAL.json is deliberately NOT staged: bench.py rewrites it on
# every run (including the driver's own per-round run AFTER the final
# commit), so tracking it left the tree dirty at every round boundary
# (r16 verdict item 7) — it is gitignored; BENCH_r{N}.json and
# BENCH_NOTES.md are the committed record.
for pat in 'CORRECTNESS_r*.json' 'BENCH_r*.json'; do
    if compgen -G "$pat" > /dev/null; then
        # shellcheck disable=SC2086
        git add -f $pat
    fi
done

# 3. Prove the invariant: every latest record has a sidecar stamp.
python -m pytest tests/test_coverage_order.py -q

if [[ "${1:-}" == "--commit" ]]; then
    git commit -m "end of round: sidecar stamps + driver artifacts" || true
fi
echo "end_of_round: OK"
