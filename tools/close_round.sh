#!/usr/bin/env bash
# Round-close record refresh (round-5 verdict #7): regenerate every
# committed evidence artifact AFTER the last code change, so the
# closing snapshot never ships records describing an older tree.
#
#   bash tools/close_round.sh            # full: both SFs + plan audit
#   bash tools/close_round.sh --fast     # sf0.01 sweep + plan audit only
#
# Stages (git add) the refreshed records; committing stays a human/agent
# decision so the diff is reviewable.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=0
[[ "${1:-}" == "--fast" ]] && FAST=1

echo "== contract sweep @ sf0.01 -> CORRECTNESS_FULL.json"
python tools/verify_contract.py /root/testdata/sf0.01

if [[ $FAST -eq 0 ]]; then
  echo "== contract sweep @ sf0.1 -> CORRECTNESS_FULL_SF01.json"
  python tools/verify_contract.py /root/testdata/sf0.1
fi

echo "== plan audit (incl. cached-subtree + checkpoint-subtree + eager-job columns) -> PLAN_AUDIT.md"
python tools/plan_report.py

if [[ $FAST -eq 0 ]]; then
  echo "== median-of-3 bench -> BENCH_MEDIAN.json (quiet machine required)"
  python tools/bench_median.py 3
fi

echo "== record consistency gate (n_queries == contract, calibration ref == bench.py pin)"
if [[ $FAST -eq 0 ]]; then
  python tools/check_records.py
else
  python tools/check_records.py --fast
fi

git add CORRECTNESS_FULL.json PLAN_AUDIT.md
[[ $FAST -eq 0 ]] && git add CORRECTNESS_FULL_SF01.json BENCH_MEDIAN.json BENCH_DETAIL.json

echo "== staged artifact freshness:"
git diff --cached --stat -- CORRECTNESS_FULL.json CORRECTNESS_FULL_SF01.json PLAN_AUDIT.md || true
echo "close_round: records regenerated $(date -u +%FT%TZ); review + commit."
