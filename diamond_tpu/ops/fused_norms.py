"""Fused GroupNorm(+FiLM)+SiLU Pallas kernels.

The ResBlock chain norm -> affine/FiLM -> SiLU sits between convs (models/blocks.py
ResBlock, reference src/models/blocks.py:129-147) and is HBM-bandwidth bound: unfused it
costs ~3 passes over a (B, H, W, C) activation (measured 0.086 ms at 32x64x64x64 on v5e,
~390 GB/s effective). These kernels do the statistics and the normalize+modulate+activate
in a single VMEM-resident pass per batch element: one read + one write of x.

Mosaic notes (what it refuses, learned on hardware):
  * no reshapes that split/move the minor (lane) dim — group statistics are therefore
    computed per-CHANNEL first (reductions over the sublane dims only), then reduced to
    groups with a tiny (C, G) one-hot matmul and broadcast back with its transpose;
  * scalar per-program operands (the FiLM row) are read with a dynamic sublane index,
    which is legal, from a full-array VMEM block.

Stats accumulate in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GN_EPS = 1e-5


def _group_onehot(c: int, num_groups: int, dtype=jnp.float32):
    """(C, G) one-hot: channel ch belongs to group ch // (c // num_groups)."""
    gsize = c // num_groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (ch // gsize == g).astype(dtype)


def _gn_stats_channels(x32: jnp.ndarray, num_groups: int):
    """x32: (H, W, C) float32 -> broadcast-ready per-channel (mean_c, inv_c), each (C,)."""
    h, w, c = x32.shape
    gsize = c // num_groups
    n = h * w * gsize
    s = jnp.sum(x32, axis=(0, 1))[None, :]          # (1, C)
    sq = jnp.sum(x32 * x32, axis=(0, 1))[None, :]   # (1, C)
    m = _group_onehot(c, num_groups)                # (C, G)
    mean_g = (s @ m) / n                            # (1, G)
    var_g = (sq @ m) / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + GN_EPS)
    mean_c = (mean_g @ m.T)[0]                      # (C,)
    inv_c = (inv_g @ m.T)[0]
    return mean_c, inv_c


def _gn_silu_kernel(num_groups: int, silu: bool, x_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    mean_c, inv_c = _gn_stats_channels(x, num_groups)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[:] + bias_ref[:]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                         num_groups: int, silu: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """SiLU(GroupNorm(x) * scale + bias); x: (B, H, W, C), scale/bias: (C,)."""
    b, h, w, c = x.shape
    kernel = functools.partial(_gn_silu_kernel, num_groups, silu)
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


def _adagn_silu_kernel(num_groups: int, x_ref, scale_ref, shift_ref, o_ref):
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    mean_c, inv_c = _gn_stats_channels(x, num_groups)
    scale = scale_ref[i].astype(jnp.float32)  # (C,) FiLM params of this batch element
    shift = shift_ref[i].astype(jnp.float32)
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
    # split in XLA: an in-kernel lane slice at offset C would be misaligned for C < 128
    scale = scale_shift[:, :c].astype(jnp.float32)
    shift = scale_shift[:, c:].astype(jnp.float32)
    kernel = functools.partial(_adagn_silu_kernel, num_groups)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            # full (B, C) arrays resident; the kernel indexes its row by program id
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, shift)


# ---------------------------------------------------------------------------
# Differentiable wrappers
#
# pallas_call has no autodiff rule, but the norms sit inside training losses. Forward
# runs the kernel; backward is the VJP of the numerically-equivalent XLA formulation
# evaluated at the saved inputs (training-step throughput is not the north-star metric;
# the fused forward is what the inference-only rollout sees).


def _gn_silu_ref(x, scale, bias, num_groups: int, silu: bool):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = (xg * xg).mean(axis=(1, 2, 4), keepdims=True) - mean * mean
    y = ((xg - mean) * jax.lax.rsqrt(var + GN_EPS)).reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_silu(x, scale, bias, num_groups: int, silu: bool, interpret: bool):
    """Differentiable fused_groupnorm_silu."""
    return fused_groupnorm_silu(x, scale, bias, num_groups, silu=silu, interpret=interpret)


def _gns_fwd(x, scale, bias, num_groups, silu, interpret):
    return groupnorm_silu(x, scale, bias, num_groups, silu, interpret), (x, scale, bias)


def _gns_bwd(num_groups, silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _gn_silu_ref(x_, s_, b_, num_groups, silu),
                     x, scale, bias)
    return vjp(g)


groupnorm_silu.defvjp(_gns_fwd, _gns_bwd)


def _adagn_silu_ref(x, scale_shift, num_groups: int):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = (xg * xg).mean(axis=(1, 2, 4), keepdims=True) - mean * mean
    y = ((xg - mean) * jax.lax.rsqrt(var + GN_EPS)).reshape(b, h, w, c)
    scale = scale_shift[:, None, None, :c].astype(jnp.float32)
    shift = scale_shift[:, None, None, c:].astype(jnp.float32)
    y = y * (1.0 + scale) + shift
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def adagn_silu(x, scale_shift, num_groups: int, interpret: bool):
    """Differentiable fused_adagn_silu."""
    return fused_adagn_silu(x, scale_shift, num_groups, interpret=interpret)


def _ags_fwd(x, scale_shift, num_groups, interpret):
    return adagn_silu(x, scale_shift, num_groups, interpret), (x, scale_shift)


def _ags_bwd(num_groups, interpret, res, g):
    x, scale_shift = res
    _, vjp = jax.vjp(lambda x_, ss_: _adagn_silu_ref(x_, ss_, num_groups), x, scale_shift)
    return vjp(g)


adagn_silu.defvjp(_ags_fwd, _ags_bwd)
