#!/usr/bin/env bash
# Relaunch training inside a run directory after a crash (reference scripts/resume.sh),
# looping on exit code 75 (EX_TEMPFAIL): the trainer exits with it after checkpointing
# when tpu.max_host_rss_gb is exceeded (elastic restart around the platform's
# per-transfer host-memory leak — see diamond_tpu/data/device_store.py).
# Usage: from within outputs/<date>/<time>: ../../../scripts/resume.sh
while true; do
  python -m diamond_tpu.main common.resume=True --run-dir .
  rc=$?
  [ "$rc" -eq 75 ] || exit "$rc"
  echo "restartable exit (75) — resuming"
done
