"""Converter + model validation against the REFERENCE'S OWN torch modules.

Round 1 validated the checkpoint converter only against twins we wrote ourselves
(tests/torch_twin.py); this imports the actual reference implementation from
/root/reference/src (read-only; used as a numerical test oracle, never copied), builds the
full default-size agent, and checks that converting its real state dict makes our models
reproduce its outputs. This removes the twin-fidelity assumption entirely; the one thing it
cannot replace — loading the published HF checkpoint — is network-blocked in this image
(documented in VALIDATION.md).

Missing reference deps (omegaconf/wandb/torcheval/ale_py) are stubbed in sys.modules: they
are only touched by training/env code paths, not by the forwards under test.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_models():
    # stub modules the reference imports at module scope but the forwards never use
    for name in ("wandb", "ale_py"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "omegaconf" not in sys.modules:
        m = types.ModuleType("omegaconf")
        m.OmegaConf = object
        m.DictConfig = dict
        sys.modules["omegaconf"] = m
    if "torcheval" not in sys.modules:
        m = types.ModuleType("torcheval")
        mm = types.ModuleType("torcheval.metrics")
        mf = types.ModuleType("torcheval.metrics.functional")
        mf.multiclass_confusion_matrix = lambda *a, **k: None
        sys.modules["torcheval"] = m
        sys.modules["torcheval.metrics"] = mm
        sys.modules["torcheval.metrics.functional"] = mf
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.actor_critic import ActorCritic as RefAC
    from models.actor_critic import ActorCriticConfig as RefACConfig
    from models.diffusion.denoiser import Denoiser as RefDenoiser
    from models.diffusion.denoiser import DenoiserConfig as RefDenoiserConfig
    from models.diffusion.inner_model import InnerModelConfig as RefInnerCfg
    from models.rew_end_model import RewEndModel as RefRewEnd
    from models.rew_end_model import RewEndModelConfig as RefRewEndCfg
    return dict(RefAC=RefAC, RefACConfig=RefACConfig, RefDenoiser=RefDenoiser,
                RefDenoiserConfig=RefDenoiserConfig, RefInnerCfg=RefInnerCfg,
                RefRewEnd=RefRewEnd, RefRewEndCfg=RefRewEndCfg)


# full default sizes (reference config/agent/default.yaml), Breakout action space
IMG, NA = 64, 4


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, -3, -1))


def test_denoiser_denoise_matches_reference(ref_models):
    torch.manual_seed(0)
    ref = ref_models["RefDenoiser"](ref_models["RefDenoiserConfig"](
        sigma_data=0.5, sigma_offset_noise=0.3,
        inner_model=ref_models["RefInnerCfg"](
            img_channels=3, num_steps_conditioning=4, cond_channels=256,
            depths=[2, 2, 2, 2], channels=[64, 64, 64, 64], attn_depths=[0, 0, 0, 0],
            num_actions=NA))).eval()

    from diamond_tpu.interop.torch_ckpt import convert_denoiser
    from diamond_tpu.models import Denoiser, DenoiserConfig, InnerModelConfig

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_denoiser(sd))

    ours = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=4,
                                     cond_channels=256, depths=[2, 2, 2, 2],
                                     channels=[64, 64, 64, 64], attn_depths=[0, 0, 0, 0],
                                     num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    init_vars = ours.init(jax.random.PRNGKey(0), img_size=IMG)
    assert (jax.tree_util.tree_structure(init_vars)
            == jax.tree_util.tree_structure(variables))

    rng = np.random.default_rng(1)
    b, sigma = 2, 1.7
    noisy = (rng.normal(size=(b, 3, IMG, IMG)) * sigma).astype(np.float32)
    obs = rng.uniform(-1, 1, (b, 4 * 3, IMG, IMG)).astype(np.float32)
    act = rng.integers(0, NA, (b, 4))

    with torch.no_grad():
        y_ref = ref.denoise(torch.tensor(noisy), torch.tensor([sigma] * b),
                            torch.tensor(obs), torch.tensor(act)).numpy()

    y_ours = ours.denoise(variables, to_nhwc(noisy), sigma, to_nhwc(obs),
                          jnp.asarray(act, jnp.int32))
    np.testing.assert_allclose(np.moveaxis(np.asarray(y_ours), -1, -3), y_ref,
                               rtol=2e-3, atol=2e-3)


def test_rew_end_matches_reference(ref_models):
    torch.manual_seed(1)
    ref = ref_models["RefRewEnd"](ref_models["RefRewEndCfg"](
        lstm_dim=512, img_channels=3, img_size=IMG, cond_channels=128,
        depths=[2, 2, 2, 2], channels=[32, 32, 32, 32], attn_depths=[0, 0, 0, 0],
        num_actions=NA)).eval()

    from diamond_tpu.interop.torch_ckpt import convert_rew_end_model
    from diamond_tpu.models import RewEndModel, RewEndModelConfig

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_rew_end_model(sd, IMG))

    ours = RewEndModel(RewEndModelConfig(
        lstm_dim=512, img_channels=3, img_size=IMG, cond_channels=128,
        depths=[2, 2, 2, 2], channels=[32, 32, 32, 32], attn_depths=[0, 0, 0, 0],
        num_actions=NA))

    rng = np.random.default_rng(2)
    b, t = 2, 3
    obs = rng.uniform(-1, 1, (b, t, 3, IMG, IMG)).astype(np.float32)
    nxt = rng.uniform(-1, 1, (b, t, 3, IMG, IMG)).astype(np.float32)
    act = rng.integers(0, NA, (b, t))

    with torch.no_grad():
        lr_ref, le_ref, (hx_ref, cx_ref) = ref.predict_rew_end(
            torch.tensor(obs), torch.tensor(act), torch.tensor(nxt))

    lr, le, (hx, cx) = ours.predict_rew_end(
        variables, to_nhwc(obs), jnp.asarray(act, jnp.int32), to_nhwc(nxt))
    np.testing.assert_allclose(np.asarray(lr), lr_ref.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(le), le_ref.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(hx), hx_ref[0].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cx), cx_ref[0].numpy(), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Trajectory-level parity (VERDICT round-2 item #3): full sampler loops, the quantized
# autoregressive training loss, and a composed WM step — the maximal substitute for the
# network-blocked published-checkpoint bit-match. Reduced model sizes keep it fast; the
# algorithms under test are size-independent.

IMG_S = 32


@pytest.fixture(scope="module")
def small_pair(ref_models):
    """(ref denoiser, our denoiser, converted variables) at a reduced size."""
    torch.manual_seed(10)
    ref = ref_models["RefDenoiser"](ref_models["RefDenoiserConfig"](
        sigma_data=0.5, sigma_offset_noise=0.3,
        inner_model=ref_models["RefInnerCfg"](
            img_channels=3, num_steps_conditioning=4, cond_channels=32,
            depths=[1, 1], channels=[16, 16], attn_depths=[0, 0],
            num_actions=NA))).eval()

    from diamond_tpu.interop.torch_ckpt import convert_denoiser
    from diamond_tpu.models import Denoiser, DenoiserConfig, InnerModelConfig

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_denoiser(sd))
    ours = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=4,
                                     cond_channels=32, depths=[1, 1], channels=[16, 16],
                                     attn_depths=[0, 0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    return ref, ours, variables


def _grid_frames(rng, shape):
    """Frames on the uint8 grid in [-1, 1] — what real conditioning buffers hold."""
    return (rng.integers(0, 256, shape).astype(np.float32) / 255.0) * 2.0 - 1.0


def _assert_traj_close(a, b, tol=2e-3, frac=0.995):
    """Element tolerance with a small outlier allowance: in-loop uint8-grid quantization
    can flip isolated pixels by 1/127.5 when backends differ by ~1e-6 at a grid boundary."""
    a, b = np.asarray(a), np.asarray(b)
    ok = np.abs(a - b) <= tol
    assert ok.mean() >= frac, f"only {ok.mean():.4f} of elements within {tol}"
    np.testing.assert_allclose(a, b, atol=0.02)  # even outliers stay grid-neighbor close


def _run_sampler_pair(ref_models, small_pair, monkeypatch, sampler_cfg_kwargs, seed):
    """Drive both full sampling loops from identical noise; return trajectories."""
    import models.diffusion.diffusion_sampler as ref_samp_mod

    from diamond_tpu.models.diffusion_sampler import (DiffusionSampler,
                                                      DiffusionSamplerConfig)

    ref_den, ours_den, variables = small_pair
    rng = np.random.default_rng(seed)
    b, n = 3, 4
    prev_obs = _grid_frames(rng, (b, n, 3, IMG_S, IMG_S))
    prev_act = rng.integers(0, NA, (b, n))

    # a FIFO of shared standard-normal draws: the reference records (generates), ours
    # replays with NCHW->NHWC transposes — both loops draw in the same order (init, then
    # eps per churned step)
    master = np.random.default_rng(seed + 1)
    fifo = []

    def rec_randn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        a = master.standard_normal(size).astype(np.float32)
        fifo.append(a)
        return torch.tensor(a)

    def rec_randn_like(t, **kw):
        return rec_randn(*tuple(t.shape))

    monkeypatch.setattr(torch, "randn", rec_randn)
    monkeypatch.setattr(torch, "randn_like", rec_randn_like)

    ref_cfg = ref_samp_mod.DiffusionSamplerConfig(**sampler_cfg_kwargs)
    ref_sampler = ref_samp_mod.DiffusionSampler(ref_den, ref_cfg)
    with torch.no_grad():
        x_ref, traj_ref = ref_sampler.sample(torch.tensor(prev_obs),
                                             torch.tensor(prev_act))

    def replay_normal(key, shape=(), dtype=jnp.float32):
        a = fifo.pop(0)
        if a.ndim == 4:
            a = np.moveaxis(a, 1, -1)
        assert a.shape == tuple(shape), (a.shape, shape)
        return jnp.asarray(a, dtype)

    monkeypatch.setattr(jax.random, "normal", replay_normal)
    sampler = DiffusionSampler(ours_den, DiffusionSamplerConfig(**sampler_cfg_kwargs))
    x, traj = sampler.sample(variables, jax.random.PRNGKey(0), to_nhwc(prev_obs),
                             jnp.asarray(prev_act, jnp.int32), return_trajectory=True)
    assert not fifo, f"{len(fifo)} unconsumed noise draws — loops drew differently"

    to_ref = lambda y: np.moveaxis(np.asarray(y), -1, -3)
    return [to_ref(y) for y in traj], [t.numpy() for t in traj_ref]


@pytest.mark.parametrize("kwargs", [
    dict(num_steps_denoising=3),                          # the headline Euler config
    dict(num_steps_denoising=3, order=2),                 # Heun
    dict(num_steps_denoising=3, s_churn=1.5, s_noise=0.9),  # churned Euler
], ids=["euler3", "heun3", "churn3"])
def test_sampler_trajectory_matches_reference(ref_models, small_pair, monkeypatch, kwargs):
    """Full sampling loop at fixed noise: every trajectory element matches the reference
    (reference src/models/diffusion/diffusion_sampler.py:30-58)."""
    traj, traj_ref = _run_sampler_pair(ref_models, small_pair, monkeypatch, kwargs,
                                       seed=11)
    assert len(traj) == len(traj_ref)
    for ours_x, ref_x in zip(traj, traj_ref):
        _assert_traj_close(ours_x, ref_x)
    # the final Euler step lands exactly on the quantized denoised frame: require
    # bit-identical uint8 pixels except at rare grid-boundary flips
    last, last_ref = traj[-1], traj_ref[-1]
    u8 = np.round((last + 1) / 2 * 255)
    u8_ref = np.round((last_ref + 1) / 2 * 255)
    assert (u8 == u8_ref).mean() >= 0.999
    assert np.abs(u8 - u8_ref).max() <= 1


def test_denoiser_ar_loss_matches_reference(ref_models, small_pair, monkeypatch):
    """2-window quantized autoregressive training loss at fixed noise (reference
    src/models/diffusion/denoiser.py:93-122): window 2's loss depends on window 1's
    quantized prediction being fed back into the conditioning stack."""
    from diamond_tpu.models.denoiser import SigmaDistributionConfig

    ref_den, ours_den, variables = small_pair
    rng = np.random.default_rng(12)
    b, n, extra = 2, 4, 2
    t = n + extra
    obs = _grid_frames(rng, (b, t, 3, IMG_S, IMG_S))
    act = rng.integers(0, NA, (b, t))
    mask = np.ones((b, t), bool)
    mask[1, -1] = False  # one masked window row exercises the masked-MSE path

    sig = dict(loc=-0.4, scale=1.2, sigma_min=2e-3, sigma_max=20.0)

    master = np.random.default_rng(13)
    fifo = []

    def rec_randn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        a = master.standard_normal(size).astype(np.float32)
        fifo.append(a)
        return torch.tensor(a)

    monkeypatch.setattr(torch, "randn", rec_randn)
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: rec_randn(*tuple(t.shape)))

    from models.diffusion.denoiser import SigmaDistributionConfig as RefSigCfg

    ref_den.sample_sigma_training = None
    ref_den.setup_training(RefSigCfg(**sig))

    batch = types.SimpleNamespace(  # minimal reference Batch stand-in
        obs=torch.tensor(obs), act=torch.tensor(act), mask_padding=torch.tensor(mask))

    with torch.no_grad():
        loss_ref, logs_ref = ref_den(batch)

    def replay_normal(key, shape=(), dtype=jnp.float32):
        a = fifo.pop(0)
        if a.ndim == 4:
            a = np.moveaxis(a, 1, -1)
        assert a.shape == tuple(shape), (a.shape, shape)
        return jnp.asarray(a, dtype)

    monkeypatch.setattr(jax.random, "normal", replay_normal)
    loss, logs = ours_den.loss(variables, to_nhwc(obs), jnp.asarray(act, jnp.int32),
                               jnp.asarray(mask), jax.random.PRNGKey(0),
                               SigmaDistributionConfig(**sig))
    assert not fifo, f"{len(fifo)} unconsumed noise draws — losses drew differently"
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-3, atol=2e-4)


def test_wm_step_composed_matches_reference(ref_models, small_pair, monkeypatch):
    """One composed world-model step — sample the next frame, then the rew/end forward on
    (last obs, last act, next frame) with a live LSTM carry — matches the reference
    composition (reference src/envs/world_model_env.py:92-105)."""
    import models.diffusion.diffusion_sampler as ref_samp_mod

    from diamond_tpu.interop.torch_ckpt import convert_rew_end_model
    from diamond_tpu.models import RewEndModel, RewEndModelConfig
    from diamond_tpu.models.diffusion_sampler import (DiffusionSampler,
                                                      DiffusionSamplerConfig)

    ref_den, ours_den, variables = small_pair
    torch.manual_seed(14)
    ref_re = ref_models["RefRewEnd"](ref_models["RefRewEndCfg"](
        lstm_dim=64, img_channels=3, img_size=IMG_S, cond_channels=16,
        depths=[1, 1], channels=[8, 8], attn_depths=[0, 0], num_actions=NA)).eval()
    sd = {k: v.numpy() for k, v in ref_re.state_dict().items()}
    re_vars = jax.tree_util.tree_map(jnp.asarray, convert_rew_end_model(sd, IMG_S))
    ours_re = RewEndModel(RewEndModelConfig(
        lstm_dim=64, img_channels=3, img_size=IMG_S, cond_channels=16,
        depths=[1, 1], channels=[8, 8], attn_depths=[0, 0], num_actions=NA))

    rng = np.random.default_rng(15)
    b, n = 3, 4
    obs_buf = _grid_frames(rng, (b, n, 3, IMG_S, IMG_S))
    act_buf = rng.integers(0, NA, (b, n))
    hx = rng.normal(size=(1, b, 64)).astype(np.float32)
    cx = rng.normal(size=(1, b, 64)).astype(np.float32)
    x_init = rng.standard_normal((b, 3, IMG_S, IMG_S)).astype(np.float32)

    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.tensor(x_init))
    ref_sampler = ref_samp_mod.DiffusionSampler(
        ref_den, ref_samp_mod.DiffusionSamplerConfig(num_steps_denoising=3))
    with torch.no_grad():
        next_ref, _ = ref_sampler.sample(torch.tensor(obs_buf), torch.tensor(act_buf))
        lr_ref, le_ref, (hx_ref, cx_ref) = ref_re.predict_rew_end(
            torch.tensor(obs_buf[:, -1:]), torch.tensor(act_buf[:, -1:]),
            next_ref.unsqueeze(1), (torch.tensor(hx), torch.tensor(cx)))

    sampler = DiffusionSampler(ours_den, DiffusionSamplerConfig(num_steps_denoising=3))
    next_ours, _ = sampler.sample(variables, jax.random.PRNGKey(0), to_nhwc(obs_buf),
                                  jnp.asarray(act_buf, jnp.int32),
                                  x_init=to_nhwc(x_init))
    lr, le, (hx2, cx2) = ours_re.predict_rew_end(
        re_vars, to_nhwc(obs_buf[:, -1:]), jnp.asarray(act_buf[:, -1:], jnp.int32),
        next_ours[:, None], (jnp.asarray(hx[0]), jnp.asarray(cx[0])))

    _assert_traj_close(np.moveaxis(np.asarray(next_ours), -1, -3), next_ref.numpy())
    np.testing.assert_allclose(np.asarray(lr), lr_ref.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(le), le_ref.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(hx2), hx_ref[0].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cx2), cx_ref[0].numpy(), rtol=2e-3, atol=2e-3)


def test_actor_critic_matches_reference(ref_models):
    torch.manual_seed(2)
    ref = ref_models["RefAC"](ref_models["RefACConfig"](
        lstm_dim=512, img_channels=3, img_size=IMG, channels=[32, 32, 64, 64],
        down=[1, 1, 1, 1], num_actions=NA)).eval()
    # zero-init heads make logits/values trivially 0; randomize them to test the mapping
    with torch.no_grad():
        for lin in (ref.actor_linear, ref.critic_linear):
            lin.weight.normal_(0, 0.1)
            lin.bias.normal_(0, 0.1)

    from diamond_tpu.interop.torch_ckpt import convert_actor_critic
    from diamond_tpu.models import ActorCritic, ActorCriticConfig

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_actor_critic(sd, IMG, [1, 1, 1, 1]))

    ours = ActorCritic(ActorCriticConfig(lstm_dim=512, img_channels=3, img_size=IMG,
                                         channels=[32, 32, 64, 64], down=[1, 1, 1, 1],
                                         num_actions=NA))

    rng = np.random.default_rng(3)
    b = 2
    obs = rng.uniform(-1, 1, (b, 3, IMG, IMG)).astype(np.float32)
    hx = rng.normal(size=(b, 512)).astype(np.float32)
    cx = rng.normal(size=(b, 512)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.predict_act_value(torch.tensor(obs),
                                        (torch.tensor(hx), torch.tensor(cx)))

    out = ours.predict_act_value(variables, to_nhwc(obs), (jnp.asarray(hx), jnp.asarray(cx)))
    np.testing.assert_allclose(np.asarray(out.logits_act), out_ref.logits_act.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.val), out_ref.val.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.carry[0]), out_ref.hx_cx[0].numpy(),
                               rtol=2e-3, atol=2e-3)
