#!/usr/bin/env bash
# Round-5 capability campaign (VERDICT round-4 #1): bf16 control first (the
# attribution linchpin — no bf16 number exists at the trimmed schedule), then
# int8 seeds 1-3, all on the FIXED collector (411f7bb) at the identical
# protocol via run_seed_r5.sh. Sequential; each leg's budget is recomputed
# from the hard DEADLINE so a slow leg eats its own slack, not the driver's
# end-of-round bench window.
# Usage: scripts/round5_campaign.sh <outdir> <deadline_epoch_s>
set -u
OUT="${1:?outdir}"; DEADLINE="${2:?deadline epoch}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
LEGS=("bf16 1" "int8 1" "int8 2" "int8 3")
N=${#LEGS[@]}
for i in "${!LEGS[@]}"; do
  read -r MODE SEED <<< "${LEGS[$i]}"
  NOW=$(date +%s); LEFT=$(( DEADLINE - NOW ))
  [ "$LEFT" -lt 600 ] && { echo "$(date +%H:%M:%S) campaign: deadline reached, $((N - i)) legs unrun"; break; }
  REMAINING_LEGS=$(( N - i ))
  BUDGET=$(( LEFT / REMAINING_LEGS ))
  # A leg that finishes early returns its slack to the later legs automatically.
  echo "=== $(date +%H:%M:%S) leg $((i+1))/$N: MODE=$MODE seed=$SEED budget=${BUDGET}s (left=${LEFT}s)"
  MODE="$MODE" scripts/run_seed_r5.sh "$OUT" "$SEED" "$BUDGET" 2>&1 | tail -3
done
echo "=== $(date +%H:%M:%S) campaign done"
for d in "$OUT"/seed*_*/; do
  [ -f "$d/metrics.jsonl" ] && { echo "--- $d"; grep final_return_mean "$d/metrics.jsonl" | tail -1; }
done
