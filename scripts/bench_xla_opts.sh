#!/usr/bin/env bash
# XLA:TPU backend-option sweep over the hot rollout (VERDICT round-3 item #3: "run 2-3
# more DIAMOND_TPU_XLA_OPTS AOT sweeps"). Each candidate is compiled server-side via PJRT
# compiler_options (client XLA_FLAGS cannot carry TPU flags on this platform —
# VALIDATION.md round 3); an option the server rejects is recorded as "rejected" and the
# sweep continues. Run on the real TPU with the chip otherwise idle.
#
# Prior results: default = 3524.1 fps; xla_tpu_scoped_vmem_limit_kib=65536 (4x) = 3029
# fps (14% regression, VALIDATION.md round 3).
set -u
OUT="${1:-/tmp/xla_opts.jsonl}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" opts="$2"
  echo "=== $name [$opts]" >&2
  local line
  if line=$(DIAMOND_TPU_XLA_OPTS="$opts" python bench.py 2>/tmp/xla_opt_err.log); then
    echo "${line%\}}, \"variant\": \"$name\", \"opts\": \"$opts\"}" | tee -a "$OUT"
  else
    echo "{\"variant\": \"$name\", \"opts\": \"$opts\", \"result\": \"rejected_or_failed\"}" | tee -a "$OUT"
    tail -2 /tmp/xla_opt_err.log >&2
  fi
}

run baseline_default        ""
# scoped VMEM: 4x was a 14% loss; probe the other direction (tighter scoped budget
# frees more VMEM for the scheduler's conv double-buffering)
run scoped_vmem_half        "xla_tpu_scoped_vmem_limit_kib=8192"
# fusion cost models: the elementwise band between convs is the bottleneck — ask the
# compiler to make smarter fusion decisions
run exp_fusion_cost_model   "xla_tpu_enable_experimental_fusion_cost_model=true"
run bundle_aware_cost_model "xla_tpu_use_bundle_aware_cost_model_for_fusions=true"
# loop-invariant code motion inflation: allow hoisting bigger computations
run licm_inflation          "xla_tpu_licm_size_inflation_ratio=2.0"
# flash/vector ops scheduling knobs that sometimes matter for conv-heavy graphs
run rwb_fusion_off          "xla_tpu_rwb_fusion=false"
run dot_dot_fusion          "xla_tpu_dot_dot_fusion=true"
