"""Int8 rollout inference for the diffusion world model's convolutions.

Why (VERDICT round-2 item #2, measured round 3): the imagination rollout is conv-bound at
the C=64 bf16 MXU envelope (72 TF/s, scripts/bench_conv_pallas.py) and everything inside
the rollout is stop-gradient inference (envs/world_model_env.py — the reference runs the
same loop under @torch.no_grad, reference src/envs/world_model_env.py:64-105). The v5e MXU
int8 peak is ~2x bf16; the realistic quantize→int8-conv→rescale path measured 1.38x on the
hot shapes (scripts/bench_conv_int8.py: 0.089 vs 0.123 ms at 64→64@64², 0.164 vs 0.227 at
128→64@64²).

Scheme: per-output-channel symmetric weight scales (weights are jit-time constants, so the
quantization folds into the graph once), dynamic per-tensor symmetric activation scale
(one fused max-reduce over the activation — XLA fuses it into the producing elementwise
chain), int32 accumulation, single f32 rescale. Training paths never see this: the context
is only entered inside DiffusionSampler.sample / the play-time stateful env, so the
denoiser/upsampler LOSSES (and every other model) stay bf16/f32 exactly as before.

Enable with DIAMOND_TPU_INT8=1 (benchmark A/B) or config tpu.int8_rollout=True.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp

# default: process-wide switch (env var or trainer config); the contextvar scopes it to
# sampler traces so training losses are never quantized even when the switch is on.
_DEFAULT = os.environ.get("DIAMOND_TPU_INT8", "0") == "1"
_ACTIVE = contextvars.ContextVar("diamond_tpu_int8_active", default=False)


def set_default(enabled: bool) -> None:
    """Process-wide opt-in (trainer reads config tpu.int8_rollout and calls this)."""
    global _DEFAULT
    _DEFAULT = bool(enabled)


def default_enabled() -> bool:
    return _DEFAULT


def active() -> bool:
    """True while tracing a region that should use int8 convs."""
    return _ACTIVE.get()


@contextlib.contextmanager
def int8_rollout_scope(enabled: bool):
    """Mark a trace region (the sampler loop) as int8-inference. Tracing is synchronous,
    so every Conv3x3 __call__ traced inside sees active()==True."""
    tok = _ACTIVE.set(bool(enabled))
    try:
        yield
    finally:
        _ACTIVE.reset(tok)


def conv3x3_q8(x: jnp.ndarray, w: jnp.ndarray, strides: int = 1) -> jnp.ndarray:
    """3x3 SAME conv computed on the int8 MXU: y ≈ conv(x, w) in f32.

    x: (B, H, W, Cin) float; w: (3, 3, Cin, Cout) float (f32 master weights).
    Per-output-channel weight scales, per-tensor dynamic activation scale, int32
    accumulation. The caller adds bias (unquantized) afterwards.
    """
    w = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0  # (Cout,)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        xq, wq, (strides, strides), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw)
