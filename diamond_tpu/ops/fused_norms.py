"""Fused GroupNorm(+FiLM)+SiLU Pallas kernels.

The ResBlock epilogue chain norm -> affine/FiLM -> SiLU sits between convs
(models/blocks.py ResBlock, reference src/models/blocks.py:129-147) and is HBM-bandwidth
bound: unfused it costs ~3 passes over a (B, H, W, C) activation. These kernels do the
statistics and the normalize+modulate+activate in a single VMEM-resident pass per batch row.

Grid: one program per batch element; the (H, W, C) slab (64*64*64*4B = 1MB at the default
sizes) fits comfortably in VMEM. Stats accumulate in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GN_EPS = 1e-5


def _gn_stats(x32: jnp.ndarray, num_groups: int):
    """x32: (H, W, C) float32 -> per-group mean/var, each (num_groups,)."""
    h, w, c = x32.shape
    xg = x32.reshape(h * w, num_groups, c // num_groups)
    mean = xg.mean(axis=(0, 2))
    var = (xg * xg).mean(axis=(0, 2)) - mean * mean
    return mean, var


def _gn_silu_kernel(num_groups: int, x_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    h, w, c = x.shape
    mean, var = _gn_stats(x, num_groups)
    inv = jax.lax.rsqrt(var + GN_EPS)
    mean_c = jnp.repeat(mean, c // num_groups)
    inv_c = jnp.repeat(inv, c // num_groups)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[:] + bias_ref[:]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def fused_groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                         num_groups: int, interpret: bool = False) -> jnp.ndarray:
    """SiLU(GroupNorm(x) * scale + bias); x: (B, H, W, C), scale/bias: (C,)."""
    b, h, w, c = x.shape
    kernel = functools.partial(_gn_silu_kernel, num_groups)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.astype(jnp.float32), bias.astype(jnp.float32))


def _adagn_silu_kernel(num_groups: int, x_ref, ss_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    h, w, c = x.shape
    mean, var = _gn_stats(x, num_groups)
    inv = jax.lax.rsqrt(var + GN_EPS)
    mean_c = jnp.repeat(mean, c // num_groups)
    inv_c = jnp.repeat(inv, c // num_groups)
    ss = ss_ref[0].astype(jnp.float32)  # (2C,) FiLM params of this batch element
    scale, shift = ss[:c], ss[c:]
    y = (x - mean_c) * inv_c
    y = y * (1.0 + scale) + shift
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def fused_adagn_silu(x: jnp.ndarray, scale_shift: jnp.ndarray, num_groups: int,
                     interpret: bool = False) -> jnp.ndarray:
    """SiLU(AdaGroupNorm): y = GN(x) * (1 + scale) + shift, then SiLU.
    x: (B, H, W, C); scale_shift: (B, 2C) — the FiLM projection of the conditioning vector
    (reference src/models/blocks.py:34-45 + the SiLU that always follows it)."""
    b, h, w, c = x.shape
    assert scale_shift.shape == (b, 2 * c)
    kernel = functools.partial(_adagn_silu_kernel, num_groups)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale_shift)
