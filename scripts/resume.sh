#!/usr/bin/env bash
# Relaunch training inside a run directory after a crash (reference scripts/resume.sh).
# Usage: from within outputs/<date>/<time>: ../../../scripts/resume.sh
exec python -m diamond_tpu.main common.resume=True --run-dir .
