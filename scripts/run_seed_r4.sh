#!/usr/bin/env bash
# One seed of the round-4 capability run (VERDICT #1): trimmed-but-complete schedule,
# production int8+pool-feats defaults from trainer.yaml, 100-episode final protocol.
# Collection env counts are throughput knobs only (collection is tunnel-RPC-latency-bound
# at ~250 ms/dispatch regardless of batch, so batched envs multiply steps/s; the
# reference exposes the same keys): train at 4 envs, test/final at 32.
# Usage: scripts/run_seed_r4.sh <outdir> <seed> <budget_s>
set -u
OUT="${1:?outdir}"; SEED="${2:?seed}"; BUDGET="${3:?budget_s}"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
DIR="$OUT/seed${SEED}"; mkdir -p "$DIR"
END=$(( $(date +%s) + BUDGET ))

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
  timeout -s TERM "$L" python -m diamond_tpu.main common.resume=True \
    --run-dir "$DIR" >> "$DIR/run.log" 2>&1
  rc=$?
done
echo "=== $(date +%H:%M:%S) seed ${SEED} finished rc=0"
