#!/usr/bin/env bash
# Round-3 multi-seed capability evidence (VERDICT #7) — v2 of run_seeds_r3.sh.
# Same budget/flags; adds a TUNNEL-HEALTH GATE: the platform backend wedges or goes
# UNAVAILABLE for tens of minutes at a time (VALIDATION.md), which burned the v1 script's
# crash-retry budget without a single training step. Here every (re)start first waits for
# `jax.devices()` to answer within 60 s, sleeping 120 s between probes, so crash retries
# are only spent on real crashes. Full-state checkpointing makes resume safe.
# Usage: scripts/run_seeds_r3b.sh <outdir> <seed> [seed ...]
set -u
OUT="${1:?outdir}"
shift
MAX_RETRIES=8

wait_tunnel() {
  while true; do
    if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "$(date +%H:%M:%S) tunnel unavailable — sleeping 120s"
    sleep 120
  done
}

for SEED in "$@"; do
  DIR="${OUT}/seed${SEED}"
  mkdir -p "${DIR}"
  echo "=== seed ${SEED} -> ${DIR} ==="
  retries=0
  if [ ! -d "${DIR}/checkpoints" ]; then
    wait_tunnel
    python -m diamond_tpu.main env=fake common.seed="${SEED}" \
      collection.train.num_steps_total=3500 \
      collection.train.first_epoch.min=2000 collection.train.first_epoch.max=2000 \
      denoiser.training.steps_first_epoch=5000 \
      rew_end_model.training.steps_first_epoch=5000 \
      actor_critic.training.steps_first_epoch=2500 \
      training.num_final_epochs=10 \
      tpu.int8_rollout=True tpu.pool_policy_feats=True tpu.max_host_rss_gb=60 \
      --run-dir "${DIR}" > "${DIR}/run.log" 2>&1
    rc=$?
  else
    rc=99  # force the resume loop below (an earlier attempt already crashed)
  fi
  while [ "$rc" -ne 0 ]; do
    if [ "$rc" -ne 75 ]; then
      retries=$((retries + 1))
      if [ "$retries" -gt "$MAX_RETRIES" ]; then
        echo "seed ${SEED}: giving up after ${MAX_RETRIES} crash retries (rc=$rc)"
        break
      fi
      echo "seed ${SEED}: crashed (rc=$rc) — resuming (retry ${retries}/${MAX_RETRIES})"
    else
      echo "seed ${SEED}: restartable exit (75) — resuming"
    fi
    wait_tunnel
    python -m diamond_tpu.main common.resume=True --run-dir "${DIR}" \
      >> "${DIR}/run.log" 2>&1
    rc=$?
  done
  echo "seed ${SEED} finished rc=$rc"
done
