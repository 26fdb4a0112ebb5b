#!/usr/bin/env bash
# One seed of the round-5 capability run (VERDICT round-4 #1): identical trimmed
# protocol to round 4 (2,500-step collect budget, 14 epochs = 10 collect + 4 final,
# 100-episode final protocol — now protocol-EXACT: final_return_mean truncates to
# num_final_episodes in completion order), run on the FIXED collector (the round-4
# multi-env prefix-duplication bug corrupted seeds 2/3's datasets; see VALIDATION.md
# round 5). Collection env counts stay pure throughput knobs: train at 4 envs,
# test/final at 32.
#
# MODE=int8 (default): production defaults from trainer.yaml (int8 conv3x3,conv1x1 +
# pool feats). MODE=bf16: identical schedule with tpu.int8_rollout=False — the control
# that attributes any capability gap to quantization vs schedule.
# Usage: [MODE=int8|bf16] scripts/run_seed_r5.sh <outdir> <seed> <budget_s>
set -u
OUT="${1:?outdir}"; SEED="${2:?seed}"; BUDGET="${3:?budget_s}"
MODE="${MODE:-int8}"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/diamond_tpu_jax_cache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
DIR="$OUT/seed${SEED}_${MODE}"; mkdir -p "$DIR"
END=$(( $(date +%s) + BUDGET ))

EXTRA=()
[ "$MODE" = "bf16" ] && EXTRA+=("tpu.int8_rollout=False")

wait_tunnel() {
  while true; do
    if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then return 0; fi
    [ $(( END - $(date +%s) )) -lt 240 ] && return 1
    echo "$(date +%H:%M:%S) tunnel unavailable - sleeping 120s"
    sleep 120
  done
}

rc=99
if [ ! -d "${DIR}/checkpoints" ]; then
  wait_tunnel || exit 1
  timeout -s TERM "$BUDGET" python -m diamond_tpu.main env=fake common.seed="${SEED}" \
    collection.train.num_steps_total=2500 \
    collection.train.first_epoch.min=1500 collection.train.first_epoch.max=1500 \
    collection.train.num_envs=4 collection.test.num_envs=32 \
    denoiser.training.steps_first_epoch=3500 \
    rew_end_model.training.steps_first_epoch=3500 \
    actor_critic.training.steps_first_epoch=1750 \
    training.num_final_epochs=4 \
    tpu.max_host_rss_gb=60 \
    "${EXTRA[@]+"${EXTRA[@]}"}" \
    --run-dir "$DIR" > "$DIR/run.log" 2>&1
  rc=$?
fi
retries=0
while [ "$rc" -ne 0 ]; do
  L=$(( END - $(date +%s) ))
  [ "$L" -lt 120 ] && { echo "seed ${SEED}: budget exhausted (rc=$rc)"; exit 1; }
  if [ "$rc" -ne 75 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 99 ] && [ "$rc" -ne 143 ]; then
    retries=$((retries + 1))
    [ "$retries" -gt 6 ] && { echo "seed ${SEED}: giving up (rc=$rc)"; exit 1; }
  fi
  wait_tunnel || exit 1
  L=$(( END - $(date +%s) ))
  [ "$L" -lt 120 ] && { echo "seed ${SEED}: budget exhausted after tunnel wait"; exit 1; }
  timeout -s TERM "$L" python -m diamond_tpu.main common.resume=True \
    --run-dir "$DIR" >> "$DIR/run.log" 2>&1
  rc=$?
done
echo "=== $(date +%H:%M:%S) seed ${SEED} (${MODE}) finished rc=0"
