#!/usr/bin/env bash
# Launch Atari-100k runs game by game (the reference's per-game CLI workflow, README.md:95-100).
# Usage: scripts/run_atari100k.sh [seed] [game ...]   (default: all 26 games, seed 0)
set -euo pipefail
SEED="${1:-0}"
shift || true
GAMES=("$@")
if [ ${#GAMES[@]} -eq 0 ]; then
  GAMES=(Alien Amidar Assault Asterix BankHeist BattleZone Boxing Breakout ChopperCommand
         CrazyClimber DemonAttack Freeway Frostbite Gopher Hero Jamesbond Kangaroo Krull
         KungFuMaster MsPacman Pong PrivateEye Qbert RoadRunner Seaquest UpNDown)
fi
for GAME in "${GAMES[@]}"; do
  echo "=== ${GAME} (seed ${SEED}) ==="
  python -m diamond_tpu.main "env.train.id=${GAME}NoFrameskip-v4" "common.seed=${SEED}"
done
