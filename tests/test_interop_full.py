"""Full-model converter validation: a torch twin of the reference denoiser architecture
produces a reference-format state dict; after conversion our InnerModel must match its
outputs numerically."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diamond_tpu.interop.torch_ckpt import convert_denoiser
from diamond_tpu.models import Denoiser, DenoiserConfig, InnerModelConfig

from torch_twin import TInnerModel

IMG, C, NC, NA = 16, 3, 4, 3
DEPTHS, CHANNELS, ATTN = [1, 1], [8, 8], [0, 0]
COND = 16


def test_full_denoiser_output_equivalence():
    torch.manual_seed(0)
    twin = TInnerModel(C, NC, COND, DEPTHS, CHANNELS, ATTN, NA).eval()
    sd = {f"inner_model.{k}": v.numpy() for k, v in twin.state_dict_ref_format().items()}

    variables = convert_denoiser({k: np.asarray(v) for k, v in sd.items()})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=NC,
                                     cond_channels=COND, depths=DEPTHS, channels=CHANNELS,
                                     attn_depths=ATTN, num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    # structure must match the initialized model exactly
    ref_vars = den.init(jax.random.PRNGKey(0), img_size=IMG)
    assert jax.tree_util.tree_structure(ref_vars) == jax.tree_util.tree_structure(variables)

    rng = np.random.default_rng(1)
    b = 2
    noisy = rng.normal(size=(b, C, IMG, IMG)).astype(np.float32)
    obs = rng.uniform(-1, 1, (b, NC * C, IMG, IMG)).astype(np.float32)
    act = rng.integers(0, NA, (b, NC))
    c_noise = rng.normal(size=(b,)).astype(np.float32)

    with torch.no_grad():
        y_t = twin(torch.tensor(noisy), torch.tensor(c_noise), torch.tensor(obs),
                   torch.tensor(act)).numpy()

    # ours: NHWC, conditioning frames channel-stacked frame-major
    noisy_j = jnp.asarray(np.transpose(noisy, (0, 2, 3, 1)))
    obs_j = jnp.asarray(np.transpose(obs, (0, 2, 3, 1)))
    y_j = den.inner_model.apply(variables, noisy_j, jnp.asarray(c_noise), obs_j,
                                jnp.asarray(act, np.int32))
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=5e-3, atol=5e-4)


def test_full_denoise_path_equivalence():
    """End-to-end denoise() (EDM preconditioning + quantization) matches the reference
    formulas applied around the twin network."""
    torch.manual_seed(3)
    twin = TInnerModel(C, NC, COND, DEPTHS, CHANNELS, ATTN, NA).eval()
    sd = {f"inner_model.{k}": v.numpy() for k, v in twin.state_dict_ref_format().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_denoiser(sd))

    sigma_data, sigma_offset = 0.5, 0.3
    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=NC,
                                     cond_channels=COND, depths=DEPTHS, channels=CHANNELS,
                                     attn_depths=ATTN, num_actions=NA),
        sigma_data=sigma_data, sigma_offset_noise=sigma_offset))

    rng = np.random.default_rng(2)
    b, sigma_val = 2, 1.7
    noisy = rng.normal(size=(b, C, IMG, IMG)).astype(np.float32) * sigma_val
    obs = rng.uniform(-1, 1, (b, NC * C, IMG, IMG)).astype(np.float32)
    act = rng.integers(0, NA, (b, NC))

    # reference EDM math (denoiser.py:66-84) around the twin
    s = np.sqrt(sigma_val ** 2 + sigma_offset ** 2)
    c_in = 1 / np.sqrt(s ** 2 + sigma_data ** 2)
    c_skip = sigma_data ** 2 / (s ** 2 + sigma_data ** 2)
    c_out = s * np.sqrt(c_skip)
    c_noise = np.full((b,), np.log(s) / 4, np.float32)
    with torch.no_grad():
        F_t = twin(torch.tensor((noisy * c_in).astype(np.float32)), torch.tensor(c_noise),
                   torch.tensor((obs / sigma_data).astype(np.float32)),
                   torch.tensor(act)).numpy()
    d_ref = np.clip(c_skip * noisy + c_out * F_t, -1, 1)
    d_ref = ((d_ref + 1) / 2 * 255).astype(np.uint8).astype(np.float32) / 255 * 2 - 1

    y_j = den.denoise(variables, jnp.asarray(np.transpose(noisy, (0, 2, 3, 1))), sigma_val,
                      jnp.asarray(np.transpose(obs, (0, 2, 3, 1))),
                      jnp.asarray(act, np.int32))
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    # quantization may flip a borderline level on ~1/1000 pixels; compare up to one level
    assert np.abs(y_j - d_ref).max() <= 2 / 255 + 1e-6
    assert (np.abs(y_j - d_ref) > 1e-6).mean() < 0.01


def test_full_rew_end_conversion_equivalence():
    """The rew_end converter (incl. the CHW->HWC LSTM input permutation) reproduces the
    torch twin's logits."""
    from torch_twin import TRewEndModel
    from diamond_tpu.interop.torch_ckpt import convert_rew_end_model
    from diamond_tpu.models import RewEndModel, RewEndModelConfig

    torch.manual_seed(7)
    depths, channels = [1, 1], [8, 8]
    twin = TRewEndModel(32, C, IMG, 8, depths, channels, [0, 0], NA).eval()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_rew_end_model(sd, IMG))

    m = RewEndModel(RewEndModelConfig(lstm_dim=32, img_channels=C, img_size=IMG,
                                      cond_channels=8, depths=depths, channels=channels,
                                      attn_depths=[0, 0], num_actions=NA))
    ref_vars = m.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(ref_vars) == jax.tree_util.tree_structure(variables)

    rng = np.random.default_rng(3)
    b, t = 2, 5
    obs = rng.uniform(-1, 1, (b, t, C, IMG, IMG)).astype(np.float32)
    next_obs = rng.uniform(-1, 1, (b, t, C, IMG, IMG)).astype(np.float32)
    act = rng.integers(0, NA, (b, t))
    with torch.no_grad():
        lr_t, le_t, _ = twin(torch.tensor(obs), torch.tensor(act), torch.tensor(next_obs))

    to_nhwc = lambda x: np.transpose(x, (0, 1, 3, 4, 2))
    lr_j, le_j, _ = m.predict_rew_end(variables, jnp.asarray(to_nhwc(obs)),
                                      jnp.asarray(act, np.int32),
                                      jnp.asarray(to_nhwc(next_obs)))
    np.testing.assert_allclose(np.asarray(lr_j), lr_t.numpy(), rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(le_j), le_t.numpy(), rtol=5e-3, atol=1e-4)


def test_full_actor_critic_conversion_equivalence():
    from torch_twin import TActorCritic
    from diamond_tpu.interop.torch_ckpt import convert_actor_critic
    from diamond_tpu.models import ActorCritic, ActorCriticConfig

    torch.manual_seed(11)
    channels, down, D = [8, 8], [1, 1], 32
    twin = TActorCritic(D, C, IMG, channels, down, NA).eval()
    # make the zero-init-in-reference heads non-trivial for a meaningful comparison
    with torch.no_grad():
        twin.actor_linear.weight.normal_(0, 0.1)
        twin.critic_linear.weight.normal_(0, 0.1)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_actor_critic(sd, IMG, down))

    m = ActorCritic(ActorCriticConfig(lstm_dim=D, img_channels=C, img_size=IMG,
                                      channels=channels, down=down, num_actions=NA))
    rng = np.random.default_rng(5)
    obs = rng.uniform(-1, 1, (2, C, IMG, IMG)).astype(np.float32)
    hx = rng.normal(size=(2, D)).astype(np.float32)
    cx = rng.normal(size=(2, D)).astype(np.float32)
    with torch.no_grad():
        lg_t, v_t, (h_t, c_t) = twin(torch.tensor(obs), (torch.tensor(hx),
                                                         torch.tensor(cx)))
    out = m.predict_act_value(variables, jnp.asarray(np.transpose(obs, (0, 2, 3, 1))),
                              (jnp.asarray(hx), jnp.asarray(cx)))
    np.testing.assert_allclose(np.asarray(out.logits_act), lg_t.numpy(), rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.val), v_t.numpy(), rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.carry[0]), h_t.numpy(), rtol=5e-3, atol=1e-4)
