#!/usr/bin/env bash
# NOTE: superseded by scripts/run_seed_r4.sh (this file uses num_final_epochs=6; the
# recorded round-4 protocol is 10 collect + 4 final as encoded in run_seed_r4.sh).
# Round-4 session-2 seed scheduler, v2 — replaces the seed phase of
# round4b_orchestrator.sh after two live findings on this VM:
#   1. Collection runs at ~4 env-steps/s (single host core, ~250 ms of host work +
#      RPC per step), so the 100-episode final protocol (~10k steps) costs ~40 min
#      at collection.test.num_envs=1. Fix: test collection at num_envs=8 (one
#      batched policy dispatch drives 8 envs; the reference exposes the same knob,
#      config/trainer.yaml collection.test.num_envs). Learning schedule unchanged.
#   2. The JAX persistent compilation cache works over the tunnel (probed), so
#      seeds 2/3 skip seed1's ~5 min of compiles via JAX_COMPILATION_CACHE_DIR.
# Seed1 (already mid-run at num_envs=1 everywhere) is killed at its first epoch
# checkpoint and resumed with the test-env override; seeds 2/3 launch fresh with
# train.num_envs=4 as well (collection throughput only — same steps, same epsilon,
# same epochs; the difference is recorded in VALIDATION.md).
# Usage: DEADLINE=<epoch> scripts/round4c_seeds.sh <outdir> <seed1_pid>
set -u
OUT="${1:?outdir}"
S1PID="${2:?seed1 python pid}"
DEADLINE="${DEADLINE:?epoch deadline}"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

left() { echo $(( DEADLINE - $(date +%s) )); }

wait_tunnel() {
  while true; do
    if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then return 0; fi
    [ "$(left)" -lt 240 ] && return 1
    echo "$(date +%H:%M:%S) tunnel unavailable - sleeping 120s ($(left)s left)"
    sleep 120
  done
}

resume_loop() {  # dir, end_epoch_s — run resume attempts until rc=0 or budget gone
  local DIR="$1" END="$2" rc=99 retries=0
  while [ "$rc" -ne 0 ]; do
    local L=$(( END - $(date +%s) ))
    [ "$L" -lt 120 ] && { echo "$(basename "$DIR"): budget exhausted (rc=$rc)"; return 1; }
    if [ "$rc" -ne 75 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 99 ] && [ "$rc" -ne 143 ]; then
      retries=$((retries + 1))
      [ "$retries" -gt 6 ] && { echo "$(basename "$DIR"): giving up (rc=$rc)"; return 1; }
    fi
    wait_tunnel || return 1
    timeout -s TERM "$L" python -m diamond_tpu.main common.resume=True \
      collection.test.num_envs=8 --run-dir "$DIR" >> "$DIR/run.log" 2>&1
    rc=$?
  done
  echo "=== $(date +%H:%M:%S) $(basename "$DIR") finished rc=0"
}

# ---- seed1: wait for the first checkpoint, then restart with the test-env fix
echo "=== $(date +%H:%M:%S) waiting for seed1 epoch-1 checkpoint"
while ! ls "$OUT/seed1/checkpoints"/* >/dev/null 2>&1; do
  sleep 15
  kill -0 "$S1PID" 2>/dev/null || break
done
sleep 10  # let the checkpoint write settle
if kill -0 "$S1PID" 2>/dev/null; then
  echo "=== $(date +%H:%M:%S) checkpoint present - stopping seed1 pid $S1PID"
  kill -TERM "$S1PID" 2>/dev/null
  for _ in $(seq 1 30); do kill -0 "$S1PID" 2>/dev/null || break; sleep 2; done
  kill -9 "$S1PID" 2>/dev/null || true
fi
S1END=$(( $(date +%s) + 2700 )); [ "$S1END" -gt "$DEADLINE" ] && S1END=$DEADLINE
resume_loop "$OUT/seed1" "$S1END" || true

# ---- seeds 2 and 3: fresh runs, parallel collection, shared compile cache
for SEED in 2 3; do
  L=$(left)
  [ "$L" -lt 900 ] && { echo "deadline: not starting seed $SEED"; break; }
  REMAINING=$(( 4 - SEED ))
  BUDGET=$(( L / REMAINING + 240 )); [ "$BUDGET" -gt "$L" ] && BUDGET=$L
  DIR="$OUT/seed${SEED}"; mkdir -p "$DIR"
  END=$(( $(date +%s) + BUDGET ))
  echo "=== $(date +%H:%M:%S) seed ${SEED} (budget ${BUDGET}s)"
  wait_tunnel || break
  timeout -s TERM "$BUDGET" python -m diamond_tpu.main env=fake common.seed="${SEED}" \
    collection.train.num_steps_total=2500 \
    collection.train.first_epoch.min=1500 collection.train.first_epoch.max=1500 \
    collection.train.num_envs=4 collection.test.num_envs=8 \
    denoiser.training.steps_first_epoch=3500 \
    rew_end_model.training.steps_first_epoch=3500 \
    actor_critic.training.steps_first_epoch=1750 \
    training.num_final_epochs=6 \
    tpu.max_host_rss_gb=60 \
    --run-dir "$DIR" > "$DIR/run.log" 2>&1
  rc=$?
  [ "$rc" -ne 0 ] && resume_loop "$DIR" "$END" || true
done

python scripts/summarize_seeds.py "$OUT"/seed* > "$OUT/seeds_summary.txt" 2>&1 || true
echo "=== $(date +%H:%M:%S) seed scheduler done ($(left)s left)"
