#!/usr/bin/env bash
# Relaunch training inside a run directory after a crash (reference scripts/resume.sh),
# looping on exit code 75 (EX_TEMPFAIL): the trainer exits with it after checkpointing
# when tpu.max_host_rss_gb is exceeded (elastic restart around the platform's
# per-transfer host-memory leak — see diamond_tpu/data/device_store.py).
# Platform crashes (the tunnel backend occasionally kills a run or goes UNAVAILABLE for
# hours) are also retried, gated on a tunnel-health probe so retries are spent on real
# crashes, bounded by MAX_RETRIES. Full-state checkpointing makes resume safe.
# Usage: from within outputs/<date>/<time>: ../../../scripts/resume.sh
MAX_RETRIES="${MAX_RETRIES:-8}"
retries=0
while true; do
  # wait out tunnel outages: a start attempt during a wedge would block or crash instantly
  until timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "$(date +%H:%M:%S) platform unavailable — sleeping 120s"
    sleep 120
  done
  python -m diamond_tpu.main common.resume=True --run-dir .
  rc=$?
  [ "$rc" -eq 0 ] && exit 0
  if [ "$rc" -eq 75 ]; then
    echo "restartable exit (75) — resuming"
  else
    retries=$((retries + 1))
    if [ "$retries" -gt "$MAX_RETRIES" ]; then
      echo "giving up after ${MAX_RETRIES} crash retries (rc=$rc)"
      exit "$rc"
    fi
    echo "crashed (rc=$rc) — resuming (retry ${retries}/${MAX_RETRIES})"
  fi
done
