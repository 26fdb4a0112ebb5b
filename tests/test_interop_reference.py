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
