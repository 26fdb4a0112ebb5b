#!/usr/bin/env bash
# Per-site int8 A/B ladder (VERDICT round-3 item #2 "measure each increment"):
# bf16 -> conv3x3 (round-3 baseline) -> +conv1x1 -> +dense -> +lstm(all).
# Run on the real TPU with the chip otherwise idle. Results append to $1 (default
# /tmp/int8_sites.jsonl) as one JSON line per variant with a "variant" field.
set -u
OUT="${1:-/tmp/int8_sites.jsonl}"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name ($*)" >&2
  local line
  line=$(env "$@" python bench.py) || { echo "FAILED: $name" >&2; return 1; }
  echo "${line%\}}, \"variant\": \"$name\"}" | tee -a "$OUT"
}

# pool feats held ON throughout (the round-3 production combination the 3524.1 fps
# number of record carries) so the ladder isolates the int8 site increments.
run bf16                    DIAMOND_TPU_POOL_FEATS=1 DIAMOND_TPU_INT8=0
run conv3x3                 DIAMOND_TPU_POOL_FEATS=1 DIAMOND_TPU_INT8=1 DIAMOND_TPU_INT8_SITES=conv3x3
run conv3x3+conv1x1         DIAMOND_TPU_POOL_FEATS=1 DIAMOND_TPU_INT8=1 DIAMOND_TPU_INT8_SITES=conv3x3,conv1x1
run conv3x3+conv1x1+dense   DIAMOND_TPU_POOL_FEATS=1 DIAMOND_TPU_INT8=1 DIAMOND_TPU_INT8_SITES=conv3x3,conv1x1,dense
run all                     DIAMOND_TPU_POOL_FEATS=1 DIAMOND_TPU_INT8=1 DIAMOND_TPU_INT8_SITES=all
