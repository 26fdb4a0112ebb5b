"""Pallas TPU kernels for the profiled hot spots (SURVEY.md section 7, item 6).

Status: validated in interpreter mode on CPU (tests/test_ops.py) AND compiling + running
on hardware since round 2 (the round-1 Mosaic hang was the kernels' own unsupported ops —
lane-dim reshapes, in-kernel row slicing — not the platform; see fused_norms.py "Mosaic
notes"). They remain opt-in (DIAMOND_TPU_PALLAS=1) until they beat the XLA paths they
replace in the rollout benchmark.

Round-3 hardware verdict (2026-08-17, scripts/bench_conv_pallas.py — settles the round-2
ceiling question with data):
  * The platform toolchain improved between rounds: XLA's conv lowering now measures
    72.2 TF/s at (32,64,64,64)x(3,3,64,64) bf16 (round 2 measured 38.9) — ABOVE the old
    "49 TF/s half-lane ceiling" analysis, refuting it. At C=128 XLA reaches 171 TF/s.
  * conv3x3_im2col measured on hardware: 43.7 TF/s at C=64, 165 TF/s at C=128 — it LOSES
    to XLA at both widths, so the old "25%->50% of peak" prediction is moot: XLA's own
    lowering already beats the predicted 50% target. The kernel stays unwired.
  * The optimized HLO shows XLA already fuses each conv with the following GroupNorm's
    moment reduction (kOutput "convert_reduce_fusion" = conv + sum + sum-of-squares) and
    the normalize/FiLM/SiLU applies run at the C=64 elementwise bandwidth cap — the U-Net
    forward is at the XLA envelope end to end (VALIDATION.md round 3).
  * fused_norms re-measured on the new toolchain: still a net loss (1154 vs 2849 fps
    rollout) — pallas_call boundaries break XLA's conv+stats and apply-chain fusions.
"""

import os

USE_PALLAS = os.environ.get("DIAMOND_TPU_PALLAS", "0") == "1"

from .fused_norms import fused_adagn_silu, fused_groupnorm_silu
from .conv3x3 import conv3x3_im2col
