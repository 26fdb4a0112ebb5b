#!/usr/bin/env bash
# Round-4 chip scheduler. The one real TPU is the contended resource this round: the
# VERDICT demands (a) the per-site int8 A/B ladder, (b) the two-stage interactive play-FPS
# number, and (c) the 3-seed capability runs — (c) needs ~80 min/seed, (a)+(b) ~30-45 min
# total. Order: bounded benches first (durable numbers), then as many seeds as fit before
# DEADLINE (epoch seconds; the chip must be free for the driver's end-of-round bench).
# Usage: DEADLINE=<epoch> scripts/round4_orchestrator.sh <outdir>
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

wait_tunnel || { echo "tunnel never recovered before deadline"; exit 1; }
echo "=== $(date +%H:%M:%S) tunnel healthy: benches first ($(left)s left)"

timeout 2100 bash scripts/bench_int8_sites.sh "$OUT/int8_sites.jsonl" \
  > "$OUT/int8_sites.log" 2>&1
echo "=== $(date +%H:%M:%S) int8 ladder done ($(left)s left)"

DIAMOND_TPU_BENCH_WATCHDOG_S=600 timeout 700 python bench_two_stage.py \
  > "$OUT/two_stage_int8.json" 2> "$OUT/two_stage_int8.err"
DIAMOND_TPU_BENCH_WATCHDOG_S=600 timeout 700 \
  env DIAMOND_TPU_INT8=0 python bench_two_stage.py \
  > "$OUT/two_stage_bf16.json" 2> "$OUT/two_stage_bf16.err"
echo "=== $(date +%H:%M:%S) two-stage benches done ($(left)s left)"

for SEED in 1 2 3; do
  L=$(left)
  if [ "$L" -lt 1200 ]; then echo "deadline: not starting seed $SEED"; break; fi
  echo "=== $(date +%H:%M:%S) seed $SEED (budget ${L}s)"
  timeout -s TERM "$L" bash scripts/run_seeds_r3b.sh "$OUT" "$SEED"
done
echo "=== $(date +%H:%M:%S) orchestrator done"
