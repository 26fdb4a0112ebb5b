"""Pallas kernels validated in interpreter mode against their XLA references
(the target platform's Mosaic compile path is currently unavailable — see ops/__init__.py)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from diamond_tpu.ops import conv3x3_im2col, fused_adagn_silu, fused_groupnorm_silu

B, H, W, C = 2, 8, 8, 8
GROUPS = 2


def ref_gn(x, num_groups):
    xf = np.asarray(x, np.float32)
    b, h, w, c = xf.shape
    xg = xf.reshape(b, h * w, num_groups, c // num_groups)
    m = xg.mean(axis=(1, 3), keepdims=True)
    v = xg.var(axis=(1, 3), keepdims=True)
    return ((xg - m) / np.sqrt(v + 1e-5)).reshape(b, h, w, c)


def silu(x):
    return x / (1 + np.exp(-x))


def test_fused_groupnorm_silu_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)) * 3 + 1
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    y = fused_groupnorm_silu(x, scale, bias, GROUPS, interpret=True)
    ref = ref_gn(x, GROUPS) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(y), silu(ref), rtol=2e-4, atol=2e-4)


def test_fused_adagn_silu_matches_blocks_semantics():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ss = jnp.asarray(rng.normal(size=(B, 2 * C)).astype(np.float32))
    y = fused_adagn_silu(x, ss, GROUPS, interpret=True)
    scale = np.asarray(ss)[:, None, None, :C]
    shift = np.asarray(ss)[:, None, None, C:]
    ref = ref_gn(x, GROUPS) * (1 + scale) + shift
    np.testing.assert_allclose(np.asarray(y), silu(ref), rtol=2e-4, atol=2e-4)


def test_conv3x3_im2col_matches_xla_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, C, 2 * C)).astype(np.float32) * 0.2)
    y = conv3x3_im2col(x, k, interpret=True)
    ref = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_groupnorm_silu_grad_matches_xla():
    """The differentiable wrappers backprop through the XLA formulation (custom_vjp)."""
    from diamond_tpu.ops.fused_norms import _gn_silu_ref, groupnorm_silu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    g1 = jax.grad(lambda x_, s_, b_: groupnorm_silu(x_, s_, b_, GROUPS, True, True).sum(),
                  argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(lambda x_, s_, b_: _gn_silu_ref(x_, s_, b_, GROUPS, True).sum(),
                  argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_adagn_silu_grad_matches_xla():
    from diamond_tpu.ops.fused_norms import _adagn_silu_ref, adagn_silu

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ss = jnp.asarray(rng.normal(size=(B, 2 * C)).astype(np.float32))
    g1 = jax.grad(lambda x_, s_: adagn_silu(x_, s_, GROUPS, True).sum(),
                  argnums=(0, 1))(x, ss)
    g2 = jax.grad(lambda x_, s_: _adagn_silu_ref(x_, s_, GROUPS).sum(),
                  argnums=(0, 1))(x, ss)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pallas_model_path_equivalence():
    """DIAMOND_TPU_PALLAS=1 routes the ResBlock norms through the kernels (interpret mode
    off-TPU) with identical params and matching outputs. Subprocess: the flag is read at
    import."""
    import os
    import subprocess
    import sys

    code = """
import os, sys
assert os.environ["DIAMOND_TPU_PALLAS"] == sys.argv[1]
import jax
jax.config.update("jax_platform_name", "cpu")
import jax.numpy as jnp, numpy as np
from diamond_tpu.models import Denoiser, DenoiserConfig, InnerModelConfig
d = Denoiser(DenoiserConfig(
    inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                 cond_channels=16, depths=[1], channels=[64],
                                 attn_depths=[0], num_actions=3),
    sigma_data=0.5, sigma_offset_noise=0.3))
v = d.init(jax.random.PRNGKey(0), img_size=8)
rng = np.random.default_rng(0)
noisy = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
obs = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 6)).astype(np.float32))
act = jnp.asarray(rng.integers(0, 3, (2, 2)).astype(np.int32))
y = d.denoise(v, noisy, 1.3, obs, act)
np.save(f"/tmp/pallas_equiv_{sys.argv[1]}.npy", np.asarray(y))
print("OK")
"""
    for flag in ("0", "1"):
        # CPU forced in the child's ENVIRONMENT (sitecustomize pre-imports jax before the
        # -c body runs) and PALLAS_AXON_* dropped so the tunnel PJRT registration — which
        # blocks `import jax` for minutes when the platform is wedged — never runs.
        env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
        env.update({"DIAMOND_TPU_PALLAS": flag,
                    "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"})
        r = subprocess.run([sys.executable, "-c", code, flag], capture_output=True,
                           text=True, cwd="/root/repo", timeout=600, env=env)
        assert r.returncode == 0, r.stderr[-3000:]
    a = np.load("/tmp/pallas_equiv_0.npy")
    b = np.load("/tmp/pallas_equiv_1.npy")
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# int8 rollout inference (ops/quant.py)


def test_conv3x3_q8_approximates_f32_conv():
    from diamond_tpu.ops.quant import conv3x3_q8

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 16, 8)) * 0.1).astype(np.float32))
    y_ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q = conv3x3_q8(x, w)
    # per-tensor act + per-channel weight symmetric int8: relative error ~1%
    err = float(jnp.abs(y_q - y_ref).max())
    scale = float(jnp.abs(y_ref).max())
    assert err <= 0.03 * scale, (err, scale)
    # strided variant (Downsample path)
    y_ref2 = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q2 = conv3x3_q8(x, w, strides=2)
    assert float(jnp.abs(y_q2 - y_ref2).max()) <= 0.03 * scale


@pytest.mark.slow
def test_int8_scope_confines_quantization_to_sampler():
    """With calibrated variables, DiffusionSampler.sample quantizes (output differs from
    the f32 sample but stays frame-close), while Denoiser.loss traced OUTSIDE the scope
    is bit-identical to the unquantized loss — even when the variables carry the quant
    collection (structural enablement, ops/quant.py)."""
    from diamond_tpu.models import (Denoiser, DenoiserConfig, DiffusionSampler,
                                    DiffusionSamplerConfig, InnerModelConfig,
                                    SigmaDistributionConfig)
    from diamond_tpu.ops import quant

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[16],
                                     attn_depths=[0], num_actions=3),
        sigma_data=0.5, sigma_offset_noise=0.3))
    v = den.init(jax.random.PRNGKey(0), img_size=8)
    # randomize the zero-initialized output convs (reference quirk): an untrained model's
    # inner output is exactly zero, which would mask any internal quantization
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(len(str(p))), x.shape) * 0.05
        if x.ndim == 4 and not np.any(np.asarray(x)) else x, v)
    sampler = DiffusionSampler(den, DiffusionSamplerConfig(num_steps_denoising=2))

    rng = np.random.default_rng(6)
    prev_obs = jnp.asarray(rng.uniform(-1, 1, (2, 2, 8, 8, 3)).astype(np.float32))
    act = jnp.asarray(rng.integers(0, 3, (2, 2)).astype(np.int32))
    x_init = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))

    x_f32, _ = sampler.sample(v, jax.random.PRNGKey(1), prev_obs, act, x_init=x_init)

    sig = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20.0)
    bobs = jnp.asarray(rng.uniform(-1, 1, (2, 4, 8, 8, 3)).astype(np.float32))
    bact = jnp.asarray(rng.integers(0, 3, (2, 4)).astype(np.int32))
    bmask = jnp.ones((2, 4), bool)
    loss_f32, _ = den.loss(v, bobs, bact, bmask, jax.random.PRNGKey(2), sig)

    # enablement is STRUCTURAL (ops/quant.py): uncalibrated variables always run bf16
    x_nocal, _ = sampler.sample(v, jax.random.PRNGKey(1), prev_obs, act, x_init=x_init)
    assert np.array_equal(np.asarray(x_nocal), np.asarray(x_f32))
    # calibration augments variables with static per-conv activation scales
    v_cal = sampler.calibrate(v, jax.random.PRNGKey(9), prev_obs, act)
    assert "quant" in v_cal and len(jax.tree_util.tree_leaves(v_cal["quant"])) > 0
    x_q8, _ = sampler.sample(v_cal, jax.random.PRNGKey(1), prev_obs, act,
                             x_init=x_init)
    # the raw inner-model output (pre uint8-grid rounding) must show quantization:
    # different from f32 but close (int8 error, not garbage)
    obs_cat = jnp.moveaxis(prev_obs, 1, 3).reshape(2, 8, 8, 6)
    cs = den.compute_conditioners(jnp.full((2,), 1.3))
    with quant.int8_rollout_scope(True):
        # same call shape as the sampler (cached obs features): the calibration pass
        # only visits the conv sites of this path
        feats_q = den.compute_obs_features(v_cal, obs_cat)
        mo_q = den.compute_model_output(v_cal, x_init, obs_cat, act, cs, feats_q)
    feats_f = den.compute_obs_features(v, obs_cat)
    mo_f = den.compute_model_output(v, x_init, obs_cat, act, cs, feats_f)
    d_mo = float(jnp.abs(mo_q - mo_f).max())
    assert d_mo > 0, "calibrated int8 convs should perturb the raw model output"
    assert d_mo <= 0.1 * float(jnp.abs(mo_f).max()) + 0.05, d_mo
    # the training loss never enters the sampler scope, so even variables CARRYING the
    # quant collection must produce the bit-identical unquantized loss
    loss_q8, _ = den.loss(v_cal, bobs, bact, bmask, jax.random.PRNGKey(2), sig)

    assert np.array_equal(np.asarray(loss_f32), np.asarray(loss_q8)), \
        "training loss must never be quantized"
    assert np.all(np.isfinite(np.asarray(x_q8)))
    # both land on the uint8 grid; quantized sampling should stay within a few grid steps
    diff = np.abs(np.asarray(x_q8) - np.asarray(x_f32))
    assert diff.max() <= 32 / 255 * 2, diff.max()
    assert np.mean(diff <= 6 / 255 * 2) >= 0.95, np.mean(diff <= 6 / 255 * 2)


@pytest.mark.slow
def test_int8_prequant_weights_match_infraph_fold():
    """The calibration collection carries precomputed w_q/w_scale siblings (round 5);
    sampling with them must be BIT-identical to a legacy collection holding only
    act_scale (the in-graph weight fold taken by checkpoints saved before the change)."""
    from diamond_tpu.models import (Denoiser, DenoiserConfig, DiffusionSampler,
                                    DiffusionSamplerConfig, InnerModelConfig)

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[16],
                                     attn_depths=[0], num_actions=3),
        sigma_data=0.5, sigma_offset_noise=0.3))
    v = den.init(jax.random.PRNGKey(0), img_size=8)
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(len(str(p))), x.shape) * 0.05
        if x.ndim == 4 and not np.any(np.asarray(x)) else x, v)
    sampler = DiffusionSampler(den, DiffusionSamplerConfig(num_steps_denoising=2))

    rng = np.random.default_rng(3)
    prev_obs = jnp.asarray(rng.uniform(-1, 1, (2, 2, 8, 8, 3)).astype(np.float32))
    act = jnp.asarray(rng.integers(0, 3, (2, 2)).astype(np.int32))
    x_init = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))

    v_cal = sampler.calibrate(v, jax.random.PRNGKey(9), prev_obs, act, sites="all")
    leaves = jax.tree_util.tree_leaves_with_path(v_cal["quant"])
    assert any("w_q" in str(p) for p, _ in leaves), "precomputed w_q missing"
    assert any("w_scale" in str(p) for p, _ in leaves), "precomputed w_scale missing"

    x_pre, _ = sampler.sample(v_cal, jax.random.PRNGKey(1), prev_obs, act, x_init=x_init)

    # legacy collection: strip the precomputed siblings, forcing the in-graph fold
    def strip(node):
        if isinstance(node, dict):
            return {k: strip(x) for k, x in node.items() if k not in ("w_q", "w_scale")}
        return node

    v_legacy = dict(v_cal, quant=strip(v_cal["quant"]))
    x_leg, _ = sampler.sample(v_legacy, jax.random.PRNGKey(1), prev_obs, act,
                              x_init=x_init)
    np.testing.assert_array_equal(np.asarray(x_pre), np.asarray(x_leg))


def test_int8_rew_end_inference_path():
    """RewEndModel.calibrate + the rollout's int8 scope (world_model_env._wm_transition):
    calibrated int8 logits perturb but stay close to f32, and the training loss traced
    outside the scope is bit-identical to the unquantized loss."""
    from diamond_tpu.models.rew_end_model import RewEndModel, RewEndModelConfig
    from diamond_tpu.ops import quant

    cfg = RewEndModelConfig(lstm_dim=32, img_channels=3, img_size=8, cond_channels=16,
                            depths=[1, 1], channels=[16, 16], attn_depths=[0, 0],
                            num_actions=3)
    m = RewEndModel(cfg)
    v = m.init(jax.random.PRNGKey(0))
    # randomize the zero-initialized out convs (reference quirk) so quantization inside
    # the ResBlocks is visible in the output
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(len(str(p))), x.shape) * 0.05
        if x.ndim == 4 and not np.any(np.asarray(x)) else x, v)

    rng = np.random.default_rng(7)
    obs = jnp.asarray(rng.uniform(-1, 1, (2, 1, 8, 8, 3)).astype(np.float32))
    nxt = jnp.asarray(rng.uniform(-1, 1, (2, 1, 8, 8, 3)).astype(np.float32))
    act = jnp.asarray(rng.integers(0, 3, (2, 1)).astype(np.int32))

    lr_f, le_f, _ = m.predict_rew_end(v, obs, act, nxt)

    bobs = jnp.asarray(rng.uniform(-1, 1, (2, 4, 8, 8, 3)).astype(np.float32))
    bact = jnp.asarray(rng.integers(0, 3, (2, 4)).astype(np.int32))
    brew = jnp.asarray(rng.integers(-1, 2, (2, 4)).astype(np.float32))
    bend = jnp.zeros((2, 4), jnp.int32)
    bmask = jnp.ones((2, 4), bool)
    fobs = jnp.zeros((2, 8, 8, 3), jnp.float32)
    hasf = jnp.zeros((2,), bool)
    loss_f32, _ = m.loss(v, bobs, bact, brew, bend, bmask, fobs, hasf)

    v_cal = m.calibrate(v, obs, act, nxt)
    assert "quant" in v_cal and len(jax.tree_util.tree_leaves(v_cal["quant"])) > 0
    with quant.int8_rollout_scope(True):
        lr_q, le_q, _ = m.predict_rew_end(v_cal, obs, act, nxt)
    d = float(jnp.abs(lr_q - lr_f).max())
    scale = float(jnp.abs(lr_f).max())
    assert d > 0, "calibrated int8 convs should perturb the logits"
    assert d <= 0.1 * scale + 0.05, (d, scale)
    assert float(jnp.abs(le_q - le_f).max()) <= 0.1 * float(jnp.abs(le_f).max()) + 0.05
    # loss never enters the int8 scope: bit-identical even with the quant collection
    loss_q8, _ = m.loss(v_cal, bobs, bact, brew, bend, bmask, fobs, hasf)

    assert np.array_equal(np.asarray(loss_f32), np.asarray(loss_q8)), \
        "rew/end training loss must never be quantized"


def test_fused_norm_silu_q8_kernel_math():
    """ops/fused_q8.py: the fused normalize+affine+SiLU+quantize kernel (interpret mode)
    matches the unfused reference math within one int8 quantization step, and
    conv3x3_qtensor dequantizes to the f32 conv within the symmetric-int8 error bound."""
    from diamond_tpu.ops.fused_q8 import (conv3x3_qtensor, group_stats_channels,
                                          norm_affine_silu_q8)

    rng = np.random.default_rng(7)
    b, h, w, c = 4, 8, 8, 16
    g = 2
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32) * 3)
    gamma = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))

    mean_c, inv_c = group_stats_channels(x, g)
    # unfused reference
    xn = (np.asarray(x) - np.asarray(mean_c)[:, None, None, :]) \
        * np.asarray(inv_c)[:, None, None, :]
    y = xn * np.asarray(gamma)[:, None, None, :] + np.asarray(beta)[:, None, None, :]
    y = y / (1 + np.exp(-y))

    qt = norm_affine_silu_q8(x, mean_c, inv_c, gamma, beta, interpret=True)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (b, 1)
    deq = np.asarray(qt.q).astype(np.float32) * np.asarray(qt.scale)[:, 0, None, None, None]
    np.testing.assert_allclose(deq, y, atol=float(np.asarray(qt.scale).max()) * 1.01)

    # group statistics equal the plain-GN formulation
    gs = c // g
    xg = np.asarray(x).reshape(b, h, w, g, gs)
    m = xg.mean(axis=(1, 2, 4))
    v = xg.var(axis=(1, 2, 4))
    np.testing.assert_allclose(np.asarray(mean_c).reshape(b, g, gs)[:, :, 0], m, atol=1e-4)
    np.testing.assert_allclose(1 / np.asarray(inv_c).reshape(b, g, gs)[:, :, 0] ** 2 - 1e-5,
                               v, atol=1e-3)

    # int8 conv of the QTensor vs f32 conv of the dequantized activation
    wk = jnp.asarray((rng.normal(size=(3, 3, c, 8)) * 0.1).astype(np.float32))
    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(deq), wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q = conv3x3_qtensor(qt, wk)
    err = float(jnp.abs(y_q - y_ref).max())
    assert err <= 0.03 * float(jnp.abs(y_ref).max()) + 1e-3, err


def test_conv3x3_q8_static_folds_channel_scales():
    """Static per-input-channel activation scales (ops/quant.py conv3x3_q8_static):
    accuracy comparable to the f32 conv even with wildly different per-channel ranges
    (where a per-tensor scale would crush small channels)."""
    from diamond_tpu.ops.quant import conv3x3_q8_static

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    x *= np.logspace(-2, 1, 16, dtype=np.float32)  # 1000x channel range spread
    w = jnp.asarray((rng.normal(size=(3, 3, 16, 8)) * 0.1).astype(np.float32))
    act_max = jnp.asarray(np.abs(x).max(axis=(0, 1, 2)))
    xj = jnp.asarray(x)
    y_ref = jax.lax.conv_general_dilated(
        xj, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q = conv3x3_q8_static(xj, w, act_max)
    err = float(jnp.abs(y_q - y_ref).max())
    assert err <= 0.03 * float(jnp.abs(y_ref).max()), err
    # strided
    y_ref2 = jax.lax.conv_general_dilated(
        xj, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q2 = conv3x3_q8_static(xj, w, act_max, strides=2)
    assert float(jnp.abs(y_q2 - y_ref2).max()) <= 0.03 * float(jnp.abs(y_ref).max())
    # inputs beyond the calibrated range clip instead of exploding
    y_big = conv3x3_q8_static(xj * 100, w, act_max)
    assert np.all(np.isfinite(np.asarray(y_big)))


def test_matmul_q8_static_approximates_f32_matmul():
    """ops/quant.py matmul_q8_static (the conv1x1/dense/lstm site kernel): accuracy
    comparable to the f32 contraction under a 1000x per-channel range spread, for both
    2D (dense/lstm) and 4D (conv1x1) inputs."""
    from diamond_tpu.ops.quant import matmul_q8_static

    rng = np.random.default_rng(9)
    w = jnp.asarray((rng.normal(size=(16, 8)) * 0.1).astype(np.float32))
    for shape in [(4, 16), (2, 8, 8, 16)]:
        x = rng.normal(size=shape).astype(np.float32)
        x *= np.logspace(-2, 1, 16, dtype=np.float32)
        act_max = jnp.asarray(np.abs(x).reshape(-1, 16).max(axis=0))
        xj = jnp.asarray(x)
        y_ref = xj @ w
        y_q = matmul_q8_static(xj, w, act_max)
        assert y_q.shape == y_ref.shape
        err = float(jnp.abs(y_q - y_ref).max())
        assert err <= 0.03 * float(jnp.abs(y_ref).max()), (shape, err)
    # out-of-range inputs clip instead of exploding
    y_big = matmul_q8_static(jnp.asarray(x) * 100, w, act_max)
    assert np.all(np.isfinite(np.asarray(y_big)))


def test_int8_site_selection_and_lstm_dense_sites():
    """VERDICT round-3 item #2: every matmul site inside the stop-gradient rollout is
    quantizable — conv3x3, conv1x1 (skip/attention projections), dense (FiLM/cond-proj/
    head linears) and the LSTM gate matmuls — with per-site structural enablement via
    tpu.int8_sites: calibrating a subset leaves the other kinds bf16 (their leaves are
    absent), and sites='all' covers every kind."""
    from diamond_tpu.models.rew_end_model import RewEndModel, RewEndModelConfig
    from diamond_tpu.ops import quant

    # depths/channels chosen so the encoder has attention (conv1x1 qkv/out) resblocks
    cfg = RewEndModelConfig(lstm_dim=32, img_channels=3, img_size=8, cond_channels=16,
                            depths=[1], channels=[16], attn_depths=[1], num_actions=3)
    m = RewEndModel(cfg)
    v = m.init(jax.random.PRNGKey(0))
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(len(str(p))), x.shape) * 0.05
        if x.ndim >= 2 and not np.any(np.asarray(x)) else x, v)

    rng = np.random.default_rng(11)
    obs = jnp.asarray(rng.uniform(-1, 1, (2, 3, 8, 8, 3)).astype(np.float32))
    nxt = jnp.asarray(rng.uniform(-1, 1, (2, 3, 8, 8, 3)).astype(np.float32))
    act = jnp.asarray(rng.integers(0, 3, (2, 3)).astype(np.int32))

    def leaf_paths(coll):
        flat = jax.tree_util.tree_flatten_with_path(coll)[0]
        return {tuple(getattr(k, "key", getattr(k, "idx", None)) for k in p)
                for p, _ in flat}

    # all sites: the collection must contain conv3x3, conv1x1 (attn), dense (heads)
    # and lstm (cell) leaves
    v_all = m.calibrate(v, obs, act, nxt, sites="all")
    paths = leaf_paths(v_all["quant"])
    assert any("lstm" in p and "cell" in p for p in paths), paths
    assert any("head_0" in p for p in paths) and any("head_2" in p for p in paths)
    assert any("qkv_proj" in p for p in paths) and any("out_proj" in p for p in paths)
    assert any("conv_in" in p for p in paths)

    # conv3x3-only selection: the round-3 baseline — no dense/lstm/conv1x1 leaves
    v_c3 = m.calibrate(v, obs, act, nxt, sites="conv3x3")
    p_c3 = leaf_paths(v_c3["quant"])
    assert not any("lstm" in p for p in p_c3)
    assert not any("head_0" in p or "qkv_proj" in p for p in p_c3)
    assert any("conv_in" in p for p in p_c3)

    # outputs: every selection stays close to f32; more sites => still bounded error
    lr_f, le_f, _ = m.predict_rew_end(v, obs, act, nxt)
    scale = float(jnp.abs(lr_f).max()) + 0.05
    with quant.int8_rollout_scope(True):
        lr_all, _, _ = m.predict_rew_end(v_all, obs, act, nxt)
        lr_c3, _, _ = m.predict_rew_end(v_c3, obs, act, nxt)
    d_all = float(jnp.abs(lr_all - lr_f).max())
    d_c3 = float(jnp.abs(lr_c3 - lr_f).max())
    assert 0 < d_all <= 0.15 * scale, (d_all, scale)
    assert 0 < d_c3 <= 0.15 * scale, (d_c3, scale)
    # the lstm/dense/conv1x1 sites actually change the compute (all != conv3x3-only)
    assert not np.array_equal(np.asarray(lr_all), np.asarray(lr_c3))

    # training loss still bit-identical with the FULL quant collection present
    bobs = jnp.asarray(rng.uniform(-1, 1, (2, 4, 8, 8, 3)).astype(np.float32))
    bact = jnp.asarray(rng.integers(0, 3, (2, 4)).astype(np.int32))
    brew = jnp.asarray(rng.integers(-1, 2, (2, 4)).astype(np.float32))
    bend = jnp.zeros((2, 4), jnp.int32)
    bmask = jnp.ones((2, 4), bool)
    fobs = jnp.zeros((2, 8, 8, 3), jnp.float32)
    hasf = jnp.zeros((2,), bool)
    l_f, _ = m.loss(v, bobs, bact, brew, bend, bmask, fobs, hasf)
    l_q, _ = m.loss(v_all, bobs, bact, brew, bend, bmask, fobs, hasf)
    assert np.array_equal(np.asarray(l_f), np.asarray(l_q))

    # spec validation
    assert quant.parse_sites("all") == frozenset(quant.SITES_ALL)
    assert quant.parse_sites(" conv3x3 , lstm ") == frozenset({"conv3x3", "lstm"})
    for bad in ("convXL", "", "conv3x3,bogus"):
        try:
            quant.parse_sites(bad)
            assert False, f"parse_sites({bad!r}) should raise"
        except ValueError:
            pass


@pytest.mark.slow
def test_int8_calibration_robust_across_training():
    """VERDICT round-3 item #7: calibration quality must not silently degrade as training
    moves the weights. Train a small denoiser for several stages; at EVERY stage,
    calibrate on one batch (the trainer recalibrates whenever the denoiser steps — this
    mirrors trainer._wm_infer_variables) and compare the int8 sample against the bf16
    sample on HELD-OUT conditioning (distribution-shift proxy for the thin live-buffer
    calibration sample). A drifting/stale scale scheme would blow the bound at later
    stages even if step-0 passes."""
    import optax

    from diamond_tpu.data.segment import DeviceBatch
    from diamond_tpu.models import (Denoiser, DenoiserConfig, DiffusionSampler,
                                    DiffusionSamplerConfig, InnerModelConfig,
                                    SigmaDistributionConfig)
    from diamond_tpu.training import TrainState, make_denoiser_train_step

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[16],
                                     attn_depths=[1], num_actions=3),
        sigma_data=0.5, sigma_offset_noise=0.3))
    v = den.init(jax.random.PRNGKey(0), img_size=8)
    constants = v.get("constants", {})
    tx = optax.adamw(3e-4)
    state = TrainState.create(v["params"], tx)
    sig = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20.0)
    step = make_denoiser_train_step(den, tx, sig)

    # fixed learnable dataset: per-action constant drift of a textured frame
    rng = np.random.default_rng(12)
    base = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    obs_seq = np.stack([np.clip(base + 0.12 * t, -1, 1) for t in range(6)])  # (T,8,8,3)
    obs_tr = jnp.asarray(np.round((obs_seq + 1) * 127.5).astype(np.uint8))[None].repeat(
        4, axis=0)  # uint8 (B, T, H, W, C)
    batch = DeviceBatch(
        obs=obs_tr, act=jnp.zeros((4, 6), jnp.int32), rew=jnp.zeros((4, 6)),
        end=jnp.zeros((4, 6), jnp.int32), trunc=jnp.zeros((4, 6), jnp.int32),
        mask_padding=jnp.ones((4, 6), bool), final_obs=jnp.zeros((4, 8, 8, 3), jnp.uint8),
        has_final_obs=jnp.zeros((4,), bool))

    sampler = DiffusionSampler(den, DiffusionSamplerConfig(num_steps_denoising=2))
    # calibration batch != evaluation batch (the trainer calibrates on live imagination
    # buffers — a thin sample of the true conditioning distribution)
    cal_obs = jnp.asarray(rng.uniform(-1, 1, (4, 2, 8, 8, 3)).astype(np.float32))
    cal_act = jnp.asarray(rng.integers(0, 3, (4, 2)).astype(np.int32))
    held_obs = jnp.asarray(rng.uniform(-1, 1, (4, 2, 8, 8, 3)).astype(np.float32))
    held_act = jnp.asarray(rng.integers(0, 3, (4, 2)).astype(np.int32))
    x_init = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))

    k = jax.random.PRNGKey(1)
    devs = []
    for stage in range(4):
        vars_now = {"params": state.params, "constants": constants}
        x_f, _ = sampler.sample(vars_now, jax.random.PRNGKey(2), held_obs, held_act,
                                x_init=x_init)
        v_cal = sampler.calibrate(vars_now, jax.random.PRNGKey(3), cal_obs, cal_act)
        x_q, _ = sampler.sample(v_cal, jax.random.PRNGKey(2), held_obs, held_act,
                                x_init=x_init)
        dev = float(jnp.abs(x_q - x_f).max())
        devs.append(dev)
        assert np.isfinite(dev)
        # output frames live in [-1, 1]: int8 error must stay a small fraction of range,
        # at every training stage (2*32/255 = the existing single-stage grid bound)
        assert dev <= 32 / 255 * 2, (stage, dev, devs)
        for _ in range(15):
            k, kk = jax.random.split(k)
            state, metrics = step(state, constants, batch, kk)
    # the weights really moved (the robustness claim is vacuous otherwise)
    assert int(state.step) == 60


def test_int8_site_selection_matching_nothing_stays_bf16():
    """A site selection that matches nothing in a model (e.g. 'lstm' on the denoiser,
    which has no LSTM) must leave the variables unquantized — sample() then runs the
    bf16 path bit-identically (trainer._wm_infer_variables relies on this not crashing)."""
    from diamond_tpu.models import (Denoiser, DenoiserConfig, DiffusionSampler,
                                    DiffusionSamplerConfig, InnerModelConfig)

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[16],
                                     attn_depths=[0], num_actions=3),
        sigma_data=0.5, sigma_offset_noise=0.3))
    v = den.init(jax.random.PRNGKey(0), img_size=8)
    sampler = DiffusionSampler(den, DiffusionSamplerConfig(num_steps_denoising=2))

    rng = np.random.default_rng(13)
    prev_obs = jnp.asarray(rng.uniform(-1, 1, (2, 2, 8, 8, 3)).astype(np.float32))
    act = jnp.asarray(rng.integers(0, 3, (2, 2)).astype(np.int32))
    x_init = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))

    v_cal = sampler.calibrate(v, jax.random.PRNGKey(9), prev_obs, act, sites="lstm")
    assert "quant" not in v_cal
    x_f, _ = sampler.sample(v, jax.random.PRNGKey(1), prev_obs, act, x_init=x_init)
    x_s, _ = sampler.sample(v_cal, jax.random.PRNGKey(1), prev_obs, act, x_init=x_init)
    assert np.array_equal(np.asarray(x_f), np.asarray(x_s))
