"""3x3 same-padding conv as an im2col matmul in VMEM.

Why: the UNet's dominant convs have 64 output channels (models/blocks.py) — half the MXU's
128 lanes — and XLA's conv lowering measures 72 TF/s at (32,64,64,64)x(3,3,64,64) on v5e
(fit-timed, dispatch overhead removed). An im2col matmul with the 9x patch amplification
kept in VMEM avoids the HBM-level im2col's bandwidth blowup and lets us fuse epilogues.

Layout: x (B, H, W, C) bf16, kernel (3, 3, C, Cout) reshaped to (9C, Cout) in (ky, kx, c)
order. Grid over batch elements; each program's block is one full padded image
(1, H+2, W+2, C); patches are built in VMEM with 9 shifted copies and contracted in one
MXU matmul (M=H*W, K=9C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(h: int, w: int, c: int, cout: int, x_ref, k_ref, o_ref, patches):
    for dy in range(3):
        for dx in range(3):
            sl = x_ref[0, dy:dy + h, dx:dx + w, :]  # (h, w, c)
            patches[:, (dy * 3 + dx) * c:(dy * 3 + dx + 1) * c] = sl.reshape(h * w, c)
    out = jnp.dot(patches[:], k_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(h, w, cout).astype(o_ref.dtype)


def conv3x3_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """y = conv3x3(x, kernel), stride 1, SAME padding.
    x: (B, H, W, C); kernel: (3, 3, C, Cout)."""
    b, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw, kc) == (3, 3, c)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kmat = kernel.reshape(9 * c, cout)

    kern = functools.partial(_conv_kernel, h, w, c, cout)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h * w, 9 * c), x.dtype),
        ],
        interpret=interpret,
    )(xp, kmat)
