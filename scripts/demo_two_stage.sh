#!/usr/bin/env bash
# Full-size two-stage (csgo-mode) world-model training demo on a static dataset
# produced by a previous run. Usage: demo_two_stage.sh <static_dataset_dir> <run_dir>
# (the static dir must contain train/ and test/ episode stores).
set -e
STATIC=${1:?static dataset dir}
RUN=${2:?run dir}
exec python -m diamond_tpu.main agent=csgo env=fake training.wm_only=True \
  "static_dataset.path=$STATIC" \
  training.num_final_epochs=4 evaluation.every=2 \
  denoiser.training.steps_first_epoch=1500 denoiser.training.steps_per_epoch=400 \
  upsampler.training.steps_first_epoch=1500 upsampler.training.steps_per_epoch=400 \
  --run-dir "$RUN"
