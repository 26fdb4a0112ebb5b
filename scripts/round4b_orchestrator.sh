#!/usr/bin/env bash
# NOTE: superseded by scripts/run_seed_r4.sh for seed runs (this file's seed phase
# uses training.num_final_epochs=6; the recorded round-4 protocol is 10 collect + 4
# final epochs as encoded in run_seed_r4.sh). Kept for the bench phases / history.
# Round-4 session-2 chip scheduler. The first round-4 session measured the int8 site
# ladder (bf16 2924.2 -> conv3x3 3447.4 -> +conv1x1 3549.6 fps) but the VM was recycled
# before the two-stage play-FPS bench and the 3-seed capability runs could land. This
# script owns the chip for the rest of the session: (a) the two-stage int8 interactive
# bench (the production play path, bounded), then (b) THREE seeds of the fake-env
# capability run at a trimmed-but-complete schedule (collect -> WM -> imagination RL ->
# 100-episode final protocol, production int8+pool-feats defaults from trainer.yaml),
# sized so all three finish before DEADLINE frees the chip for the driver's
# end-of-round bench; then (c) the bf16 two-stage A/B if slack remains.
# Usage: DEADLINE=<epoch> scripts/round4b_orchestrator.sh <outdir>
set -u
OUT="${1:?outdir}"
DEADLINE="${DEADLINE:?epoch deadline}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

left() { echo $(( DEADLINE - $(date +%s) )); }

wait_tunnel() {
  while true; do
    if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then return 0; fi
    [ "$(left)" -lt 300 ] && return 1
    echo "$(date +%H:%M:%S) tunnel unavailable - sleeping 120s ($(left)s to deadline)"
    sleep 120
  done
}

run_seed() {  # seed, budget_s
  local SEED="$1" BUDGET="$2" DIR rc retries=0
  DIR="${OUT}/seed${SEED}"
  mkdir -p "$DIR"
  echo "=== $(date +%H:%M:%S) seed ${SEED} -> ${DIR} (budget ${BUDGET}s)"
  local END=$(( $(date +%s) + BUDGET ))
  if [ ! -d "${DIR}/checkpoints" ]; then
    wait_tunnel || return 1
    timeout -s TERM "$BUDGET" python -m diamond_tpu.main env=fake common.seed="${SEED}" \
      collection.train.num_steps_total=2500 \
      collection.train.first_epoch.min=1500 collection.train.first_epoch.max=1500 \
      denoiser.training.steps_first_epoch=3500 \
      rew_end_model.training.steps_first_epoch=3500 \
      actor_critic.training.steps_first_epoch=1750 \
      training.num_final_epochs=6 \
      tpu.max_host_rss_gb=60 \
      --run-dir "${DIR}" > "${DIR}/run.log" 2>&1
    rc=$?
  else
    rc=99  # prior attempt exists: go straight to resume
  fi
  while [ "$rc" -ne 0 ]; do
    local L=$(( END - $(date +%s) ))
    [ "$L" -lt 120 ] && { echo "seed ${SEED}: budget exhausted (rc=$rc)"; return 1; }
    if [ "$rc" -ne 75 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 99 ]; then
      retries=$((retries + 1))
      [ "$retries" -gt 6 ] && { echo "seed ${SEED}: giving up (rc=$rc)"; return 1; }
      echo "seed ${SEED}: crashed (rc=$rc) - resuming (retry ${retries}/6)"
    else
      echo "seed ${SEED}: resumable exit ($rc) - resuming"
    fi
    wait_tunnel || return 1
    # recompute the budget AFTER wait_tunnel (it can sleep for minutes) and clamp to
    # the global deadline, so a resume never runs past END/DEADLINE into later phases
    L=$(( END - $(date +%s) ))
    local TO_DEADLINE=$(( DEADLINE - $(date +%s) ))
    [ "$TO_DEADLINE" -lt "$L" ] && L=$TO_DEADLINE
    [ "$L" -lt 120 ] && { echo "seed ${SEED}: budget exhausted after tunnel wait"; return 1; }
    timeout -s TERM "$L" python -m diamond_tpu.main common.resume=True \
      --run-dir "${DIR}" >> "${DIR}/run.log" 2>&1
    rc=$?
  done
  echo "=== $(date +%H:%M:%S) seed ${SEED} finished rc=0"
  return 0
}

wait_tunnel || { echo "tunnel never recovered before deadline"; exit 1; }
echo "=== $(date +%H:%M:%S) tunnel healthy ($(left)s to deadline)"

DIAMOND_TPU_BENCH_WATCHDOG_S=600 timeout 700 python bench_two_stage.py \
  > "$OUT/two_stage_int8.json" 2> "$OUT/two_stage_int8.err"
echo "=== $(date +%H:%M:%S) two-stage int8 bench done ($(left)s left):"
cat "$OUT/two_stage_int8.json" || true

for SEED in 1 2 3; do
  REMAINING=$(( 4 - SEED ))
  L=$(left)
  if [ "$L" -lt 900 ]; then echo "deadline: not starting seed $SEED"; break; fi
  BUDGET=$(( L / REMAINING + 300 ))
  [ "$BUDGET" -gt "$L" ] && BUDGET=$L
  run_seed "$SEED" "$BUDGET" || true
done

if [ "$(left)" -gt 800 ]; then
  DIAMOND_TPU_BENCH_WATCHDOG_S=600 timeout 700 \
    env DIAMOND_TPU_INT8=0 python bench_two_stage.py \
    > "$OUT/two_stage_bf16.json" 2> "$OUT/two_stage_bf16.err"
  echo "=== $(date +%H:%M:%S) two-stage bf16 A/B done:"
  cat "$OUT/two_stage_bf16.json" || true
fi
echo "=== $(date +%H:%M:%S) orchestrator done ($(left)s left)"
