#!/usr/bin/env bash
# Round-3 multi-seed capability evidence (VERDICT #7) under the PRODUCTION inference
# options (tpu.int8_rollout + tpu.pool_policy_feats — their capability gate, VERDICT #2).
# Schedule SHAPE matches the round-2 validated run (/root/runs_r2/long2: fake env 64x64,
# full-size agent, reference-shaped phases, 100-episode final protocol) at HALF the
# env-step/train-step budget so three seeds fit one round's wall clock:
#   long2: 8000 env steps (first epoch 5000), 10000/10000/5000 first-epoch train steps
#   here : 3500 env steps (first epoch 2000),  5000/5000/2500 first-epoch train steps
# Each seed resumes on exit 75 (restart guard) AND on tunnel-platform crashes (the
# backend occasionally kills a run with e.g. INVALID_ARGUMENT on a transfer — full-state
# checkpointing makes resume safe), bounded by MAX_RETRIES.
# Usage: scripts/run_seeds_r3.sh <outdir> <seed> [seed ...]
set -u
OUT="${1:?outdir}"
shift
MAX_RETRIES=4
for SEED in "$@"; do
  DIR="${OUT}/seed${SEED}"
  mkdir -p "${DIR}"
  echo "=== seed ${SEED} -> ${DIR} ==="
  retries=0
  if [ ! -d "${DIR}/checkpoints" ]; then
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
    rc=99  # force the resume loop below (fresh attempt already crashed once)
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
    python -m diamond_tpu.main common.resume=True --run-dir "${DIR}" \
      >> "${DIR}/run.log" 2>&1
    rc=$?
  done
  echo "seed ${SEED} finished rc=$rc"
done
