#!/usr/bin/env bash
# Round-5 slack-window measurements after 3b92fe9 (precomputed int8 weight quant +
# extras D2H fix): post-fix collection profile, then the headline bench at HEAD.
# Usage: scripts/round5c_slack.sh <deadline_epoch_s>
set -u
DEADLINE="${1:?deadline epoch}"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/diamond_tpu_jax_cache}"
LOG=/root/runs_r5/slack_c.log

left() { echo $(( DEADLINE - $(date +%s) )); }
stage() {
  local NAME="$1" MIN="$2"; shift 2
  local L; L=$(left)
  if [ "$L" -lt "$MIN" ]; then
    echo "=== $(date +%H:%M:%S) SKIP $NAME (${L}s left < ${MIN}s)" | tee -a "$LOG"; return 1
  fi
  echo "=== $(date +%H:%M:%S) START $NAME" | tee -a "$LOG"
  timeout -s TERM "$(( L - 120 ))" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%H:%M:%S) END $NAME rc=$?" | tee -a "$LOG"
}

stage profile_collection_1env_postfix 240 python scripts/profile_collection.py 100 1
stage bench_head 420 python bench.py
stage two_stage_head 420 python bench_two_stage.py
echo "=== $(date +%H:%M:%S) slack done ($(left)s to deadline)" | tee -a "$LOG"
