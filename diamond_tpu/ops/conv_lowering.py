"""Alternative XLA lowerings for the U-Net's hot 3x3 convs (pure jnp — no Pallas).

The imagination rollout is conv-bound (VALIDATION.md round 2: ~87% of the step is U-Net
time, ~27 TFLOP/s effective at C=64 vs ~197 peak bf16 on v5e). The root cause is MXU lane
under-utilization: an NHWC conv with C_out=64 drives the 128-wide MXU half-empty. These
formulations trade extra dense FLOPs or layout work for full lanes:

  * ``paired``  — pixel-paired conv: window (3,4) stride (1,2) with a (3,4,C,2C) kernel
    holding the weight twice at horizontal offsets 0/1, so two adjacent output pixels are
    computed per MXU row. N=2C fills the lanes at 1.33x dense FLOPs.
  * ``im2col``  — conv_general_dilated_patches + one dot: contraction dim 9*C=576.
  * ``s2d``     — space-to-depth: 2x2 blocks fold into channels, the 3x3 conv becomes an
    equivalent 3x3 conv in block space over 4C channels (structured-zero kernel; 4x dense
    FLOPs but both contraction and output dims are 4C).
  * ``xla``     — plain conv_general_dilated (baseline).

All modes are numerically exact reformulations (tests/test_conv_lowering.py) and selected
globally via DIAMOND_TPU_CONV (models/blocks.py Conv3x3); non-unit strides and odd widths
fall back to ``xla``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

CONV_MODES = ("xla", "paired", "im2col", "s2d")
CONV_MODE = os.environ.get("DIAMOND_TPU_CONV", "xla")
assert CONV_MODE in CONV_MODES, f"DIAMOND_TPU_CONV must be one of {CONV_MODES}"


def _conv_xla(x: jnp.ndarray, w: jnp.ndarray, strides: int = 1) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (strides, strides), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_paired(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Two horizontally-adjacent output pixels share the 3x4 window cols 2J-1..2J+2."""
    b, h, width, c_in = x.shape
    c_out = w.shape[-1]
    wp = jnp.zeros((3, 4, c_in, 2 * c_out), w.dtype)
    wp = wp.at[:, 0:3, :, :c_out].set(w)
    wp = wp.at[:, 1:4, :, c_out:].set(w)
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 2), ((1, 1), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, h, width // 2, 2, c_out).reshape(b, h, width, c_out)


def _conv_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Patches come out feature-ordered (C_in, KH, KW); transpose the kernel to match."""
    b, h, width, c_in = x.shape
    c_out = w.shape[-1]
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w_mat = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * c_in, c_out)
    y = p.reshape(b * h * width, 9 * c_in) @ w_mat
    return y.reshape(b, h, width, c_out)


def _build_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Equivalent block-space kernel: output block offset (oy,ox), tap (ky,kx) reads input
    block (By,Bx) at in-block offset (iy,ix) where 2*By+iy = oy+ky-1+2 (and same for x)."""
    kh, kw, c_in, c_out = w.shape
    wk = jnp.zeros((3, 3, 4 * c_in, 4 * c_out), w.dtype)
    for oy in range(2):
        for ox in range(2):
            for ky in range(3):
                for kx in range(3):
                    by, iy = divmod(oy + ky - 1 + 2, 2)
                    bx, ix = divmod(ox + kx - 1 + 2, 2)
                    in_off = (iy * 2 + ix) * c_in
                    out_off = (oy * 2 + ox) * c_out
                    wk = wk.at[by, bx, in_off:in_off + c_in,
                               out_off:out_off + c_out].add(w[ky, kx])
    return wk


def _conv_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, h, width, c = x.shape
    c_out = w.shape[-1]
    xs = x.reshape(b, h // 2, 2, width // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, width // 2, 4 * c)
    wk = _build_s2d_kernel(w)
    y = jax.lax.conv_general_dilated(
        xs, wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, h // 2, width // 2, 2, 2, c_out)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h, width, c_out)


def conv3x3_lowered(x: jnp.ndarray, w: jnp.ndarray, strides: int = 1,
                    mode: str = "xla") -> jnp.ndarray:
    """3x3 SAME conv in the requested lowering; falls back to xla where the mode's shape
    preconditions don't hold (strides, parity)."""
    b, h, width, _ = x.shape
    if strides != 1 or mode == "xla":
        return _conv_xla(x, w, strides)
    if mode == "paired":
        return _conv_paired(x, w) if width % 2 == 0 else _conv_xla(x, w)
    if mode == "im2col":
        return _conv_im2col(x, w)
    if mode == "s2d":
        return _conv_s2d(x, w) if (h % 2 == 0 and width % 2 == 0) else _conv_xla(x, w)
    raise ValueError(mode)
