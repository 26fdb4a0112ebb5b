"""NN building blocks shared by all models (TPU-native counterpart of reference
src/models/blocks.py).

Design notes (TPU-first):
  * NHWC layout throughout — the native layout for XLA:TPU convolutions.
  * Compute dtype is configurable (bfloat16 by default in training configs); parameters are
    float32. Norms accumulate in float32.
  * Initializers mirror the reference's torch defaults (kaiming-uniform convs/linears,
    zero-init output convs, orthogonal downsample convs) so converted reference checkpoints
    drop in and training dynamics match.

Parity map to the reference:
  GroupNorm           reference src/models/blocks.py:24-31  (groups = max(1, C//32), eps 1e-5)
  AdaGroupNorm        reference src/models/blocks.py:34-45  (x*(1+scale)+shift, FiLM from cond)
  SelfAttention2d     reference src/models/blocks.py:51-72  (head_dim 8, zero-init out proj,
                                                             residual taken from the NORMED x)
  FourierFeatures     reference src/models/blocks.py:78-87  (fixed random frequencies, buffer)
  Downsample/Upsample reference src/models/blocks.py:93-110
  SmallResBlock       reference src/models/blocks.py:116-123
  ResBlock            reference src/models/blocks.py:129-147 (zero-init conv2)
  ResBlocks           reference src/models/blocks.py:153-177
  UNet                reference src/models/blocks.py:183-246
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

GN_GROUP_SIZE = 32
GN_EPS = 1e-5
ATTN_HEAD_DIM = 8

Dtype = Any


# ---------------------------------------------------------------------------
# Torch-matching initializers


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    flax kernel layout HWIO -> fan_in = H*W*I."""
    fan_in = math.prod(shape[:-1])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Linear default. flax kernel layout (in, out) -> fan_in = in."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def fan_in_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal_conv_init(key, shape, dtype=jnp.float32):
    """Torch nn.init.orthogonal_ on an OIHW conv flattens dims>=1: orthogonal over (O, I*H*W).
    flax HWIO equivalent: orthogonal over (H*W*I, O) columns."""
    return jax.nn.initializers.orthogonal(column_axis=-1)(key, shape, dtype)


class _QuantConv1x1(nn.Module):
    """1x1 conv (== channel matmul) with the static-int8 rollout-inference path
    (ops/quant.py, site kind "conv1x1" — covers the UNet decoder's skip/residual
    projections and the attention qkv/out projections, VERDICT round-3 item #2).
    Identical parameter tree to nn.Conv ('kernel' (1,1,Cin,Cout) + 'bias')."""

    features: int
    dtype: Dtype
    use_bias: bool = True
    kernel_init: Any = torch_conv_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import quant

        w = self.param("kernel", self.kernel_init, (1, 1, x.shape[-1], self.features),
                       jnp.float32)
        if quant.active() and quant.calibrating():
            quant.record((*self.path, "act_scale"),
                         jnp.max(jnp.abs(x.astype(jnp.float32)),
                                 axis=tuple(range(x.ndim - 1))), "conv1x1", w=w[0, 0])
            y = x.astype(self.dtype) @ w[0, 0].astype(self.dtype)
        elif quant.active() and self.has_variable("quant", "act_scale"):
            y = quant.matmul_q8_static(
                x, w[0, 0], self.get_variable("quant", "act_scale"),
                w_q=self.get_variable("quant", "w_q")
                if self.has_variable("quant", "w_q") else None,
                w_scale=self.get_variable("quant", "w_scale")
                if self.has_variable("quant", "w_scale") else None)
            y = y.astype(self.dtype)
        else:
            y = x.astype(self.dtype) @ w[0, 0].astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def Conv1x1(features: int, dtype: Dtype, use_bias: bool = True,
            kernel_init=torch_conv_kernel_init, name: Optional[str] = None) -> nn.Module:
    return _QuantConv1x1(features, dtype, use_bias, kernel_init, name=name)


class QDense(nn.Module):
    """nn.Dense twin (same parameter tree: 'kernel' (in, out) + 'bias') with the
    static-int8 rollout-inference path (ops/quant.py, site kind "dense" — the AdaGN FiLM
    linears, the denoiser cond projections and the rew/end head linears, VERDICT round-3
    item #2). Training paths are untouched: without an active int8 scope (or without this
    site's calibrated leaf) it is exactly a Dense."""

    features: int
    dtype: Dtype
    use_bias: bool = True
    kernel_init: Any = torch_linear_kernel_init
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import quant

        w = self.param("kernel", self.kernel_init, (x.shape[-1], self.features),
                       jnp.float32)
        if quant.active() and quant.calibrating():
            quant.record((*self.path, "act_scale"),
                         jnp.max(jnp.abs(x.astype(jnp.float32)),
                                 axis=tuple(range(x.ndim - 1))), "dense", w=w)
            y = x.astype(self.dtype) @ w.astype(self.dtype)
        elif quant.active() and self.has_variable("quant", "act_scale"):
            y = quant.matmul_q8_static(
                x, w, self.get_variable("quant", "act_scale"),
                w_q=self.get_variable("quant", "w_q")
                if self.has_variable("quant", "w_q") else None,
                w_scale=self.get_variable("quant", "w_scale")
                if self.has_variable("quant", "w_scale") else None)
            y = y.astype(self.dtype)
        else:
            y = x.astype(self.dtype) @ w.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class _LoweredConv3x3(nn.Module):
    """3x3 conv with a selectable MXU-friendly lowering (ops/conv_lowering.py) and the
    int8 rollout-inference path (ops/quant.py — taken when tracing inside a
    DiffusionSampler int8 scope). Identical parameter tree to nn.Conv ('kernel' HWIO +
    'bias'), so checkpoints are interchangeable with the default path."""

    features: int
    dtype: Dtype
    strides: int = 1
    kernel_init: Any = torch_conv_kernel_init
    mode: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import quant
        from ..ops.conv_lowering import conv3x3_lowered

        c_in = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (3, 3, c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if quant.active():
            # int8 rollout (sampler scope only, ops/quant.py). Static calibrated
            # per-input-channel activation scales: the quantize is a constant elementwise
            # op XLA fuses into the producing norm chain, and the scales fold into the
            # weight quantization — no dynamic max-reduce pass (the dynamic per-tensor
            # variant measured as a wash, and a fused Pallas quantizing-norm measured 2x
            # slower by breaking producer fusion; VALIDATION.md round 3). Scales live in
            # the "quant" variables collection, written by an EAGER observe pass
            # (DiffusionSampler.calibrate) — so they are step-time inputs, not trace
            # constants, and recalibration never retraces the rollout.
            if quant.calibrating():
                quant.record((*self.path, "act_scale"),
                             jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2)),
                             "conv3x3", w=w)
                y = conv3x3_lowered(x.astype(self.dtype), w.astype(self.dtype),
                                    self.strides, self.mode)
            elif self.has_variable("quant", "act_scale"):
                act_max = self.get_variable("quant", "act_scale")
                y = quant.conv3x3_q8_static(
                    x, w, act_max, self.strides,
                    w_q=self.get_variable("quant", "w_q")
                    if self.has_variable("quant", "w_q") else None,
                    w_scale=self.get_variable("quant", "w_scale")
                    if self.has_variable("quant", "w_scale") else None) \
                    .astype(self.dtype)
            else:
                # site filtered out by tpu.int8_sites (no calibrated leaf): stay bf16
                y = conv3x3_lowered(x.astype(self.dtype), w.astype(self.dtype),
                                    self.strides, self.mode)
        else:
            y = conv3x3_lowered(x.astype(self.dtype), w.astype(self.dtype), self.strides,
                                self.mode)
        return y + b.astype(self.dtype)


def Conv3x3(features: int, dtype: Dtype, strides: int = 1,
            kernel_init=torch_conv_kernel_init, name: Optional[str] = None) -> nn.Module:
    from ..ops.conv_lowering import CONV_MODE

    return _LoweredConv3x3(features, dtype, strides, kernel_init, CONV_MODE, name=name)


# ---------------------------------------------------------------------------
# Norms


def _group_norm(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Affine-free group norm over NHWC, accumulating in float32.

    Layout-critical formulation: statistics are computed per-CHANNEL first (reductions
    over the sublane H/W axes with the lane dim C intact), then combined into groups on
    the tiny (N, C) moment tensors. The naive reshape-to-(N,H,W,G,C/G) puts a C/G-wide
    minor dim (2 for the reference's 32-channel groups) on every multi-MB activation,
    collapsing lane utilization ~64x — profiled at 55% of the whole U-Net forward before
    this change (VALIDATION.md round 3). Same math: E[x^2]-E[x]^2 single-pass moments."""
    orig_dtype = x.dtype
    n, h, w, c = x.shape
    g = num_groups
    gs = c // g
    x32 = x.astype(jnp.float32)
    s = jnp.sum(x32, axis=(1, 2))         # (N, C) — one fused pass over x for both
    sq = jnp.sum(x32 * x32, axis=(1, 2))  # moments
    cnt = float(h * w * gs)
    mean_g = s.reshape(n, g, gs).sum(-1) / cnt           # (N, G)
    var_g = sq.reshape(n, g, gs).sum(-1) / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + GN_EPS)
    mean_c = jnp.repeat(mean_g, gs, axis=1)              # (N, C), trivial size
    inv_c = jnp.repeat(inv_g, gs, axis=1)
    y = (x32 - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    return y.astype(orig_dtype)


class GroupNorm(nn.Module):
    """GroupNorm with group size 32 and learned affine (reference src/models/blocks.py:24-31).

    ``fuse_silu``: apply SiLU inside the norm (the norm->silu->conv chain of the ResBlocks);
    with DIAMOND_TPU_PALLAS=1 the whole norm(+silu) runs as a single-pass VMEM-resident
    Pallas kernel (ops/fused_norms.py)."""

    dtype: Dtype = jnp.float32
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        num_groups = max(1, c // GN_GROUP_SIZE)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        from ..ops import USE_PALLAS

        if USE_PALLAS and x.ndim == 4:
            from ..ops.fused_norms import groupnorm_silu

            interpret = jax.default_backend() != "tpu"
            return groupnorm_silu(x, scale, bias, num_groups, self.fuse_silu,
                                  interpret).astype(self.dtype)
        y = _group_norm(x, num_groups)
        y = (y * scale.astype(y.dtype) + bias.astype(y.dtype)).astype(self.dtype)
        return nn.silu(y) if self.fuse_silu else y


class AdaGroupNorm(nn.Module):
    """FiLM-conditioned group norm: affine-free GN then x*(1+scale)+shift from a linear on the
    conditioning vector (reference src/models/blocks.py:34-45). ``fuse_silu`` as GroupNorm."""

    dtype: Dtype = jnp.float32
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        num_groups = max(1, c // GN_GROUP_SIZE)
        ss = QDense(2 * c, dtype=self.dtype, kernel_init=torch_linear_kernel_init,
                    bias_init=fan_in_bias_init(cond.shape[-1]), name="linear")(cond)

        from ..ops import USE_PALLAS

        if USE_PALLAS and self.fuse_silu and x.ndim == 4:
            from ..ops.fused_norms import adagn_silu

            interpret = jax.default_backend() != "tpu"
            return adagn_silu(x, ss, num_groups, interpret).astype(self.dtype)
        scale, shift = jnp.split(ss[:, None, None, :], 2, axis=-1)
        y = _group_norm(x, num_groups).astype(self.dtype)
        y = y * (1 + scale) + shift
        return nn.silu(y) if self.fuse_silu else y


# ---------------------------------------------------------------------------
# Attention (8x8 = 64 spatial tokens at the UNet mid-block)


class SelfAttention2d(nn.Module):
    """Spatial MHA over h*w tokens, head_dim 8, zero-init out projection. NB the residual is
    taken from the *normalized* input, matching the reference exactly
    (reference src/models/blocks.py:62-72: `x = self.norm(x); ...; return x + out_proj(y)`)."""

    dtype: Dtype = jnp.float32
    head_dim: int = ATTN_HEAD_DIM

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        n_head = max(1, c // self.head_dim)
        assert c % n_head == 0
        x = GroupNorm(dtype=self.dtype, name="norm")(x)
        qkv = Conv1x1(3 * c, self.dtype, name="qkv_proj")(x)
        qkv = qkv.reshape(n, h * w, 3, n_head, c // n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n, hw, heads, hd)
        att = jnp.einsum("nqhd,nkhd->nhqk", q, k) / math.sqrt(c // n_head)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, h, w, c)
        y = Conv1x1(c, self.dtype, kernel_init=nn.initializers.zeros, name="out_proj")(y)
        return x + y


# ---------------------------------------------------------------------------
# Noise-level embedding


class FourierFeatures(nn.Module):
    """Random-frequency embedding of the (log) noise level. The frequency matrix is a fixed
    buffer, NOT a trainable parameter (reference src/models/blocks.py:78-87 registers it with
    register_buffer) — stored in the 'constants' variable collection."""

    cond_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.cond_channels % 2 == 0
        assert x.ndim == 1
        weight = self.variable(
            "constants", "weight",
            lambda: jax.random.normal(self.make_rng("params"), (1, self.cond_channels // 2),
                                      jnp.float32),
        ).value
        f = 2 * math.pi * x.astype(jnp.float32)[:, None] @ weight
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1).astype(self.dtype)


# ---------------------------------------------------------------------------
# Resampling


class Downsample(nn.Module):
    """Stride-2 3x3 conv, orthogonal init (reference src/models/blocks.py:93-100)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv3x3(x.shape[-1], self.dtype, strides=2, kernel_init=orthogonal_conv_init,
                       name="conv")(x)


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv (reference src/models/blocks.py:103-110)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
        return Conv3x3(c, self.dtype, name="conv")(x)


# ---------------------------------------------------------------------------
# Residual blocks


class SmallResBlock(nn.Module):
    """GN -> SiLU -> Conv3x3 with 1x1-projected skip (reference src/models/blocks.py:116-123)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        y = GroupNorm(dtype=self.dtype, fuse_silu=True, name="norm")(x)
        y = Conv3x3(self.out_channels, self.dtype, name="conv")(y)
        skip = x if in_channels == self.out_channels else Conv1x1(
            self.out_channels, self.dtype, name="skip_projection")(x)
        return skip + y


class ResBlock(nn.Module):
    """AdaGN->SiLU->Conv twice, zero-init second conv, optional self-attention
    (reference src/models/blocks.py:129-147)."""

    out_channels: int
    attn: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        r = x if in_channels == self.out_channels else Conv1x1(
            self.out_channels, self.dtype, name="proj")(x)
        y = AdaGroupNorm(dtype=self.dtype, fuse_silu=True, name="norm1")(x, cond)
        y = Conv3x3(self.out_channels, self.dtype, name="conv1")(y)
        y = AdaGroupNorm(dtype=self.dtype, fuse_silu=True, name="norm2")(y, cond)
        y = Conv3x3(self.out_channels, self.dtype, kernel_init=nn.initializers.zeros,
                    name="conv2")(y)
        y = y + r
        if self.attn:
            y = SelfAttention2d(dtype=self.dtype, name="attn")(y)
        return y


class ResBlocks(nn.Module):
    """Sequence of ResBlocks with optional per-block skip concatenation
    (reference src/models/blocks.py:153-177)."""

    list_out_channels: Sequence[int]
    attn: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        to_cat: Optional[List[jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        outputs = []
        for i, out_ch in enumerate(self.list_out_channels):
            if to_cat is not None:
                x = jnp.concatenate([x, to_cat[i]], axis=-1)
            x = ResBlock(out_ch, self.attn, dtype=self.dtype, name=f"resblocks_{i}")(x, cond)
            outputs.append(x)
        return x, outputs


# ---------------------------------------------------------------------------
# UNet


class UNet(nn.Module):
    """Encoder-decoder with skip concats; pads H,W up to a multiple of 2^num_down then crops
    (reference src/models/blocks.py:183-246). Decoder block i consumes the reversed outputs of
    encoder block i (including the downsampled input), concatenated channelwise."""

    depths: Sequence[int]
    channels: Sequence[int]
    attn_depths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        assert len(self.depths) == len(self.channels) == len(self.attn_depths)
        num_down = len(self.channels) - 1
        n, h, w, _ = x.shape
        pad_h = math.ceil(h / 2 ** num_down) * 2 ** num_down - h
        pad_w = math.ceil(w / 2 ** num_down) * 2 ** num_down - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        d_outputs: List[List[jnp.ndarray]] = []
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            if i > 0:
                x = Downsample(dtype=self.dtype, name=f"downsamples_{i}")(x)
            x_down = x
            x, block_outputs = ResBlocks([ch] * depth, bool(self.attn_depths[i]),
                                         dtype=self.dtype, name=f"d_blocks_{i}")(x, cond)
            d_outputs.append([x_down, *block_outputs])

        x, _ = ResBlocks([self.channels[-1]] * 2, True, dtype=self.dtype, name="mid_blocks")(
            x, cond)

        for j, skip in enumerate(reversed(d_outputs)):
            i = len(self.channels) - 1 - j  # encoder level this decoder block mirrors
            if j > 0:
                x = Upsample(dtype=self.dtype, name=f"upsamples_{j}")(x)
            depth, ch = self.depths[i], self.channels[i]
            out_ch = [ch] * depth + [self.channels[max(0, i - 1)]]
            x, _ = ResBlocks(out_ch, bool(self.attn_depths[i]), dtype=self.dtype,
                             name=f"u_blocks_{j}")(x, cond, to_cat=skip[::-1])

        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        return x
