"""Fused normalize+affine+SiLU+int8-quantize Pallas kernel — MEASURED DEAD END, kept as
the evidence artifact (unit-tested, unwired).

The idea (round-3 trace, VALIDATION.md): with int8 MXU convs the conv+stats time halves
(0.95 ms/denoise vs 2.07 bf16) but XLA's dynamic per-tensor quantization costs two extra
HBM passes per conv — elementwise time doubles and eats the win (2,810 vs 2,849 fps).
This kernel was meant to close the loop: ONE read of the pre-norm activation,
normalize+FiLM/affine+SiLU in VMEM, per-batch-element max, quantize, ONE int8 write.

HARDWARE VERDICT (2026-08-17, v5e, full rollout with GroupNorm/AdaGroupNorm routed
through this kernel and QTensor-consuming convs): **1,419 fps vs 2,849 bf16 — 2x WORSE.**
Same failure mode as the round-2 fused norms: the pallas_call boundary breaks XLA's
conv+norm-stats producer fusion on both sides, and the per-batch grid serializes what XLA
overlaps. The production int8 path is instead STATIC calibrated per-channel scales
(ops/quant.py conv3x3_q8_static) where the quantize is a plain fusable elementwise op —
measured +16% end-to-end. Kept compilable + unit-tested (tests/test_ops.py) so the
refutation stays reproducible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QTensor(NamedTuple):
    """Symmetric-quantized activation: values int8, one scale per batch element."""

    q: jnp.ndarray       # (B, H, W, C) int8
    scale: jnp.ndarray   # (B, 1) float32 — dequant: x ≈ q * scale


def _kernel(x_ref, mean_ref, inv_ref, gamma_ref, beta_ref, q_ref, s_ref):
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                      # (H, W, C)
    mean = mean_ref[i].astype(jnp.float32)                # (C,) rows of (B, C) operands
    inv = inv_ref[i].astype(jnp.float32)
    gamma = gamma_ref[i].astype(jnp.float32)
    beta = beta_ref[i].astype(jnp.float32)
    y = (x - mean) * inv * gamma + beta
    y = y * jax.nn.sigmoid(y)                             # SiLU
    m = jnp.max(jnp.abs(y))
    s = jnp.maximum(m, 1e-8) / 127.0
    # the scale output is ONE (B,1) SMEM block shared by all grid steps (Mosaic requires
    # block dims divisible by (8,128) or equal to the array's); each step writes its row
    s_ref[i, 0] = s
    q_ref[0] = jnp.clip(jnp.round(y / s), -127.0, 127.0).astype(jnp.int8)


def norm_affine_silu_q8(x: jnp.ndarray, mean_c: jnp.ndarray, inv_c: jnp.ndarray,
                        gamma: jnp.ndarray, beta: jnp.ndarray,
                        interpret: bool = False) -> QTensor:
    """QTensor of SiLU((x - mean_c) * inv_c * gamma + beta).

    x: (B, H, W, C); mean_c/inv_c: (B, C) per-channel group statistics (broadcast from
    the group values on the tiny stats tensors — XLA side); gamma/beta: (B, C) — the FiLM
    affine (1+scale, shift) for AdaGroupNorm, or the learned (scale, bias) rows repeated
    over B for plain GroupNorm.
    """
    b, h, w, c = x.shape
    assert mean_c.shape == inv_c.shape == gamma.shape == beta.shape == (b, c)
    f32 = jnp.float32
    q, s = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), f32),
        ],
        interpret=interpret,
    )(x, mean_c.astype(f32), inv_c.astype(f32), gamma.astype(f32), beta.astype(f32))
    return QTensor(q=q, scale=s)


def conv3x3_qtensor(xq: QTensor, w: jnp.ndarray, strides: int = 1) -> jnp.ndarray:
    """3x3 SAME conv of a QTensor on the int8 MXU; returns f32 (caller adds bias).

    Per-output-channel weight scales; the rescale is
    y = conv_i32(q, wq) * (scale_b * sw_c), an epilogue XLA fuses with the following
    norm-statistics reduce."""
    w = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0  # (Cout,)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq.q, wq, (strides, strides), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xq.scale[:, :, None, None] * sw)


def group_stats_channels(x: jnp.ndarray, num_groups: int, eps: float = 1e-5):
    """(mean_c, inv_c) each (B, C): affine-free GroupNorm statistics, computed so the big
    reduce (per-channel moments over H, W) fuses into the op that PRODUCED x (models/
    blocks.py _group_norm uses the identical formulation)."""
    n, h, w, c = x.shape
    g = num_groups
    gs = c // g
    x32 = x.astype(jnp.float32)
    s = jnp.sum(x32, axis=(1, 2))
    sq = jnp.sum(x32 * x32, axis=(1, 2))
    cnt = float(h * w * gs)
    mean_g = s.reshape(n, g, gs).sum(-1) / cnt
    var_g = sq.reshape(n, g, gs).sum(-1) / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    return jnp.repeat(mean_g, gs, axis=1), jnp.repeat(inv_g, gs, axis=1)
