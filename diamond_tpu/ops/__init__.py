"""Pallas TPU kernels for the profiled hot spots (SURVEY.md section 7, item 6).

Status: validated in interpreter mode on CPU (tests/test_ops.py) AND compiling + running
on hardware since round 2 (the round-1 Mosaic hang was the kernels' own unsupported ops —
lane-dim reshapes, in-kernel row slicing — not the platform; see fused_norms.py "Mosaic
notes"). They remain opt-in (DIAMOND_TPU_PALLAS=1) until they beat the XLA paths they
replace in the rollout benchmark.

Profiling summary driving these kernels (v5e, batch 32):
  * 3x3 conv at 64x64x64: 0.26 ms = 36.6 TFLOP/s — 73% of the C=64 MXU ceiling
    ((64/128)^2 = 25% of peak); the same conv with C=256 reaches 114 TFLOP/s.
  * The denoiser forward is ~70% conv time; the rest is GroupNorm/FiLM/SiLU chains.
  * conv3x3_im2col lifts the matmul contraction dim to 9*C=576 (>128 lanes), raising the
    ceiling from 25% to 50% of peak for the dominant 64-channel convs.
"""

import os

USE_PALLAS = os.environ.get("DIAMOND_TPU_PALLAS", "0") == "1"

from .fused_norms import fused_adagn_silu, fused_groupnorm_silu
from .conv3x3 import conv3x3_im2col
