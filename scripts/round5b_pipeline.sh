#!/usr/bin/env bash
# Round-5 session-2 chip pipeline. Ordered by evidence value per minute, hard
# deadline-bounded so the driver's end-of-round bench gets a free chip:
#   1. final-protocol eval of the r5 seed1 EPOCH-10 agents (int8 + bf16 control) —
#      adjudicates the final-epoch collapse: both runs tested 2.0 at epochs 8-10
#      then finished at -2.01 / -2.37 after the 4 no-collect final epochs.
#   2. final-protocol eval of round-4 seed3's saved checkpoint (VERDICT #1b: the
#      in-run number was lost; the checkpoint survived on this VM).
#   3. resume round-4 seed2 from its epoch-9 checkpoint to completion (VERDICT #1a).
#   4. int8_sites=all bench A/B (VERDICT weak #2) + XLA backend-option sweeps on slack.
# Usage: scripts/round5b_pipeline.sh <deadline_epoch_s>
set -u
DEADLINE="${1:?deadline epoch}"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/diamond_tpu_jax_cache}"
OUT=/root/runs_r5
LOG="$OUT/pipeline_b.log"

left() { echo $(( DEADLINE - $(date +%s) )); }
stage() {  # stage <name> <min_budget_s> <cmd...>
  local NAME="$1" MIN="$2"; shift 2
  local L; L=$(left)
  if [ "$L" -lt "$MIN" ]; then
    echo "=== $(date +%H:%M:%S) SKIP $NAME (${L}s left < ${MIN}s)" | tee -a "$LOG"
    return 1
  fi
  echo "=== $(date +%H:%M:%S) START $NAME (budget $(( L - 240 ))s)" | tee -a "$LOG"
  timeout -s TERM "$(( L - 240 ))" "$@" >> "$LOG" 2>&1
  local RC=$?
  echo "=== $(date +%H:%M:%S) END $NAME rc=$RC" | tee -a "$LOG"
  return $RC
}

# 1a/1b: epoch-10 collapse adjudication (100 episodes, 32 envs, run-config defaults)
stage eval_seed1_int8_ep10 420 python scripts/final_eval.py "$OUT/seed1_int8" \
  --ckpt "$OUT/seed1_int8/checkpoints/agent_versions/agent_epoch_00010.npz"
stage eval_seed1_bf16_ep10 420 python scripts/final_eval.py "$OUT/seed1_bf16" \
  --ckpt "$OUT/seed1_bf16/checkpoints/agent_versions/agent_epoch_00010.npz"

# 2: round-4 seed3's lost final number (latest = epoch-14 agent)
stage eval_r4_seed3 420 python scripts/final_eval.py /root/runs_r4/seed3

# 3: resume round-4 seed2 (epoch 10 collect + 4 final epochs + final eval).
#    Caveat for the ledger: epochs 1-9 collected on the pre-411f7bb collector.
stage resume_r4_seed2 900 python -m diamond_tpu.main common.resume=True \
  --run-dir /root/runs_r4/seed2

# 4: measurements on slack — (a) hardware numbers for the packed-dispatch collection
#    fix (2971bba; pre-fix: 104.8/88.5 ms/step at 1/4 envs), (b) int8_sites=all
#    end-to-end A/B (VERDICT weak #2: dense/LSTM sites dismissed by size, not measured)
stage profile_collection_1env 300 python scripts/profile_collection.py 100 1
stage profile_collection_4env 300 python scripts/profile_collection.py 100 4
stage bench_int8_all 420 env DIAMOND_TPU_INT8_SITES=all python bench.py
echo "=== $(date +%H:%M:%S) pipeline done ($(left)s to deadline)" | tee -a "$LOG"
