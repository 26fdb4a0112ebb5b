"""Int8 rollout inference for the diffusion world model's convolutions.

Why (VERDICT round-2 item #2, measured round 3): the imagination rollout is conv-bound at
the C=64 bf16 MXU envelope (72 TF/s, scripts/bench_conv_pallas.py) and everything inside
the rollout is stop-gradient inference (envs/world_model_env.py — the reference runs the
same loop under @torch.no_grad, reference src/envs/world_model_env.py:64-105). The v5e MXU
int8 peak is ~2x bf16; the realistic quantize→int8-conv→rescale path measured 1.38x on the
hot shapes (scripts/bench_conv_int8.py: 0.089 vs 0.123 ms at 64→64@64², 0.164 vs 0.227 at
128→64@64²).

PRODUCTION SCHEME (the one that banks the win end-to-end, +16% rollout fps): STATIC
calibrated per-INPUT-channel activation scales (conv3x3_q8_static). The scales come from
an eager observe pass (DiffusionSampler.calibrate → record()/calibration_scope) and live
in the "quant" variables collection, so (a) the activation quantize is a constant
elementwise op XLA fuses into the producing norm/SiLU chain — zero extra HBM passes —
and (b) the per-channel scales FOLD INTO the weight quantization, so accuracy tolerates
1000x per-channel range spread. Two measured dead ends kept for the record
(VALIDATION.md round 3): DYNAMIC per-tensor scales (conv3x3_q8 below) are a wash — the
activation max-reduce + requantize cost two extra HBM passes per conv, eating the MXU
win; a fused Pallas normalize+SiLU+quantize kernel (ops/fused_q8.py) is 2x WORSE — the
kernel boundary breaks XLA's conv+stats producer fusion.

Weights use per-output-channel symmetric scales (f32 masters are jit inputs; the fold +
round is hoisted out of the rollout scan by XLA's loop-invariant code motion). int32
accumulation, single f32 rescale. Training paths never see any of this: the scope is
only entered inside DiffusionSampler.sample, so the denoiser/upsampler LOSSES (and every
other model) stay bf16/f32 exactly as before, and uncalibrated variables (no "quant"
collection) run the bf16 path even when the switch is on.

Enablement is STRUCTURAL: convs quantize iff the variables carry a calibrated "quant"
collection AND the trace is inside a sampler int8 scope. The opt-in switches
(config tpu.int8_rollout, bench.py's DIAMOND_TPU_INT8) only decide whether calibration
runs and the collection is injected — there is deliberately no process-global in the
trace-time decision, because a global is not part of the jit cache key: an
already-compiled rollout would keep its baked-in choice after the global flipped
(code-review round 3).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# scopes the int8 path to sampler traces so training losses are never quantized even
# when the same calibrated variables are in scope.
_ACTIVE = contextvars.ContextVar("diamond_tpu_int8_active", default=False)


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


_CALIBRATING = contextvars.ContextVar("diamond_tpu_int8_calibrating", default=None)


def calibrating() -> bool:
    """True while running an (eager) calibration pass: convs observe per-input-channel
    activation maxima into the active registry instead of quantizing."""
    return _CALIBRATING.get() is not None


@contextlib.contextmanager
def calibration_scope(registry: dict):
    """Run eagerly (NOT under jit): convs call record() with concrete arrays."""
    tok = _CALIBRATING.set(registry)
    try:
        yield
    finally:
        _CALIBRATING.reset(tok)


# Every quantizable site kind; the calibration site filter (tpu.int8_sites /
# DIAMOND_TPU_INT8_SITES) selects a subset — enablement stays structural per site:
# a module quantizes iff ITS leaf is present in the "quant" collection.
SITES_ALL = ("conv3x3", "conv1x1", "dense", "lstm")


def parse_sites(spec) -> frozenset:
    """'all' | comma-separated kinds | sequence of kinds -> frozenset (validated)."""
    if spec is None or spec == "all":
        return frozenset(SITES_ALL)
    names = [s.strip() for s in spec.split(",")] if isinstance(spec, str) else list(spec)
    names = [s for s in names if s]
    unknown = set(names) - set(SITES_ALL)
    if unknown:
        raise ValueError(f"unknown int8 site kind(s) {sorted(unknown)}; "
                         f"valid: {SITES_ALL} or 'all'")
    if not names:
        raise ValueError("empty int8 site selection (use 'all' or a kind list)")
    return frozenset(names)


def record(path_and_leaf, act_max, kind: str, w=None) -> None:
    """Max-merge one site's observed per-input-channel |x| maxima into the registry.
    ``path_and_leaf``: module path tuple (relative to the apply root) + leaf name,
    e.g. ``(*self.path, "act_scale")``. ``kind``: one of SITES_ALL, for site filtering.
    ``w``: the site's weight in its quantization layout ((3,3,Cin,Cout) for conv3x3,
    (Cin,Cout) for matmul-shaped sites) — when given, registry_to_collection also emits
    the folded+quantized weight, so the rollout never re-quantizes loop-invariant
    weights per step (the compiled scan body re-ran that fold every iteration —
    VALIDATION.md round 5 HLO probe)."""
    assert kind in SITES_ALL, kind
    reg = _CALIBRATING.get()
    key = tuple(path_and_leaf)
    prev = reg.get(key)
    reg[key] = (kind, act_max if prev is None else jnp.maximum(prev[1], act_max),
                w if prev is None else prev[2])


def fold_quantize_weight(w: jnp.ndarray, act_max: jnp.ndarray):
    """Fold per-input-channel act scales into ``w`` and quantize per-output-channel:
    returns (w_q int8, w_scale f32 (Cout,)). ``w``: (..., Cin, Cout) — (3,3,Cin,Cout)
    for conv3x3, (Cin,Cout) for matmul sites; the fold axis is always -2 and the
    output-channel axis -1. Single definition shared by the on-the-fly paths and the
    calibration-time precompute so the two are identical by construction."""
    s_c = jnp.maximum(act_max.astype(jnp.float32), 1e-8) * ACT_SCALE_HEADROOM / 127.0
    wf = w.astype(jnp.float32) * s_c[(None,) * (w.ndim - 2) + (slice(None), None)]
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1))), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def registry_to_collection(registry: dict, sites=None) -> dict:
    """Nest {(*path, leaf): (kind, act_max, w)} into a variables collection: the
    "quant" twin of the params tree, one ``act_scale`` leaf per calibrated site plus —
    for sites that stashed their weight — precomputed ``w_q``/``w_scale`` siblings.
    ``sites``: keep only these site kinds (None = all)."""
    out: dict = {}
    for path, (kind, v, w) in registry.items():
        if sites is not None and kind not in sites:
            continue
        node = out
        for name in path[:-1]:
            node = node.setdefault(name, {})
        node[path[-1]] = v
        if w is not None:
            node["w_q"], node["w_scale"] = fold_quantize_weight(w, v)
    return out


# Calibration records the exact observed max; give the runtime distribution a little
# room to drift between recalibrations (the denoiser trains between AC phases).
ACT_SCALE_HEADROOM = 1.05


def conv3x3_q8_static(x: jnp.ndarray, w: jnp.ndarray, act_max: jnp.ndarray,
                      strides: int = 1, w_q=None, w_scale=None) -> jnp.ndarray:
    """3x3 SAME conv on the int8 MXU with STATIC per-input-channel activation scales.

    The production int8 path: ``act_max`` (per-input-channel |x| maxima from a
    calibration pass) is a trace-time-constant-shaped vector, so the activation quantize
    is a plain elementwise op with no dynamic max-reduce pass (which measured away the
    whole int8 win, VALIDATION.md round 3). The channel scales fold into the weights:
    conv(x, w) = conv(x/s * s, w) = conv(xq, s_c*w), then per-output-channel symmetric
    weight quantization. Pass the calibration-precomputed ``w_q``/``w_scale`` (the
    "quant" collection siblings) to skip the in-graph weight fold — the compiled scan
    body otherwise re-quantizes the loop-invariant weights every step.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) f32; act_max: (Cin,) f32 from calibration.
    Returns f32 (caller adds bias).
    """
    s_c = jnp.maximum(act_max.astype(jnp.float32), 1e-8) * ACT_SCALE_HEADROOM / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c), -127, 127).astype(jnp.int8)

    if w_q is None or w_scale is None:
        w_q, w_scale = fold_quantize_weight(w, act_max)

    y = jax.lax.conv_general_dilated(
        xq, w_q, (strides, strides), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * w_scale


def matmul_q8_static(x: jnp.ndarray, w: jnp.ndarray, act_max: jnp.ndarray,
                     w_q=None, w_scale=None) -> jnp.ndarray:
    """Contraction over the last axis on the int8 MXU with STATIC per-input-channel
    activation scales — the matmul twin of conv3x3_q8_static, shared by the conv1x1,
    dense and LSTM-gate sites (a 1x1 conv IS a matmul over the channel axis).

    Same scheme: ``act_max`` (per-input-channel |x| maxima from calibration, or a static
    bound like the LSTM's |h|<1) makes the activation quantize a constant elementwise op,
    and the channel scales fold into the per-output-channel weight quantization —
    precomputed at calibration when ``w_q``/``w_scale`` are given. x: (..., Cin);
    w: (Cin, Cout) f32; act_max: (Cin,) f32. Returns f32 (caller adds bias)."""
    s_c = jnp.maximum(act_max.astype(jnp.float32), 1e-8) * ACT_SCALE_HEADROOM / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c), -127, 127).astype(jnp.int8)

    if w_q is None or w_scale is None:
        w_q, w_scale = fold_quantize_weight(w, act_max)

    y = jax.lax.dot_general(xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * w_scale


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
