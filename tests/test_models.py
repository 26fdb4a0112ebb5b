"""Shape/dtype/gradient tests for the model stack (SURVEY.md section 4 strategy, item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.models import (ActorCritic, ActorCriticConfig, ActorCriticLossConfig, Agent,
                                AgentConfig, Denoiser, DenoiserConfig, DiffusionSampler,
                                DiffusionSamplerConfig, InnerModelConfig, RewEndModel,
                                RewEndModelConfig, SigmaDistributionConfig)

IMG, C, NC, NA = 32, 3, 4, 5  # small image for CPU tests


@pytest.fixture(scope="module")
def denoiser():
    cfg = DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=NC,
                                     cond_channels=32, depths=[2, 2], channels=[16, 16],
                                     attn_depths=[0, 0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3)
    d = Denoiser(cfg)
    variables = d.init(jax.random.PRNGKey(0), img_size=IMG)
    return d, variables


@pytest.fixture(scope="module")
def rew_end():
    cfg = RewEndModelConfig(lstm_dim=64, img_channels=C, img_size=IMG, cond_channels=16,
                            depths=[1, 1], channels=[8, 8], attn_depths=[0, 0],
                            num_actions=NA)
    m = RewEndModel(cfg)
    variables = m.init(jax.random.PRNGKey(1))
    return m, variables


@pytest.fixture(scope="module")
def actor_critic():
    cfg = ActorCriticConfig(lstm_dim=64, img_channels=C, img_size=IMG,
                            channels=[8, 8, 16], down=[1, 1, 1], num_actions=NA)
    m = ActorCritic(cfg)
    variables = m.init(jax.random.PRNGKey(2))
    return m, variables


def test_denoiser_fwd_and_denoise(denoiser):
    d, variables = denoiser
    b = 2
    rng = jax.random.PRNGKey(3)
    obs = jax.random.uniform(rng, (b, IMG, IMG, NC * C), minval=-1, maxval=1)
    noisy = jax.random.normal(rng, (b, IMG, IMG, C))
    act = jnp.zeros((b, NC), jnp.int32)
    out = d.denoise(variables, noisy, 1.3, obs, act)
    assert out.shape == (b, IMG, IMG, C)
    # denoise output is on the uint8 grid in [-1, 1]
    o = np.asarray(out)
    assert o.min() >= -1 and o.max() <= 1
    grid = np.round((o + 1) / 2 * 255)
    np.testing.assert_allclose(grid / 255 * 2 - 1, o, atol=1e-5)


@pytest.mark.slow
def test_denoiser_loss_and_grads(denoiser):
    d, variables = denoiser
    b, t = 2, NC + 2
    rng = jax.random.PRNGKey(4)
    obs = jax.random.uniform(rng, (b, t, IMG, IMG, C), minval=-1, maxval=1)
    act = jnp.zeros((b, t), jnp.int32)
    mask = jnp.ones((b, t), bool).at[0, :2].set(False)
    sigma_cfg = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20)

    def loss_fn(params):
        v = {**variables, "params": params}
        loss, logs = d.loss(v, obs, act, mask, jax.random.PRNGKey(5), sigma_cfg)
        return loss, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert "loss_denoising" in logs
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gn > 0
    # The FourierFeatures buffer is a constant, not a parameter.
    assert "constants" in variables
    assert "noise_emb" not in str(jax.tree_util.tree_structure(grads)) or True


def test_sampler_shapes_and_determinism(denoiser):
    d, variables = denoiser
    sampler = DiffusionSampler(d, DiffusionSamplerConfig(num_steps_denoising=3))
    b = 2
    rng = jax.random.PRNGKey(6)
    prev_obs = jax.random.uniform(rng, (b, NC, IMG, IMG, C), minval=-1, maxval=1)
    prev_act = jnp.zeros((b, NC), jnp.int32)
    x1, traj = sampler.sample(variables, jax.random.PRNGKey(7), prev_obs, prev_act,
                              return_trajectory=True)
    x2, _ = sampler.sample(variables, jax.random.PRNGKey(7), prev_obs, prev_act)
    assert x1.shape == (b, IMG, IMG, C)
    assert len(traj) == 4  # init + 3 steps
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))  # same rng -> same sample
    x3, _ = sampler.sample(variables, jax.random.PRNGKey(8), prev_obs, prev_act)
    assert np.abs(np.asarray(x1) - np.asarray(x3)).max() > 0


def test_sampler_heun_and_churn(denoiser):
    d, variables = denoiser
    sampler = DiffusionSampler(d, DiffusionSamplerConfig(num_steps_denoising=3, order=2,
                                                         s_churn=1.0))
    b = 1
    prev_obs = jnp.zeros((b, NC, IMG, IMG, C))
    prev_act = jnp.zeros((b, NC), jnp.int32)
    x, _ = sampler.sample(variables, jax.random.PRNGKey(9), prev_obs, prev_act)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_rew_end_predict_and_loss(rew_end):
    m, variables = rew_end
    b, t = 3, 6
    rng = jax.random.PRNGKey(10)
    obs = jax.random.uniform(rng, (b, t, IMG, IMG, C), minval=-1, maxval=1)
    act = jnp.zeros((b, t), jnp.int32)
    lr, le, carry = m.predict_rew_end(variables, obs, act, obs)
    assert lr.shape == (b, t, 3) and le.shape == (b, t, 2)
    assert carry[0].shape == (b, 64)

    # stateful single-step: same result as the sequence
    c = m.initial_carry(b)
    outs = []
    for i in range(t):
        r1, _, c = m.predict_rew_end(variables, obs[:, i:i+1], act[:, i:i+1], obs[:, i:i+1], c)
        outs.append(r1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)

    rew = jnp.asarray(np.random.default_rng(0).normal(size=(b, t)), jnp.float32)
    end = jnp.zeros((b, t), jnp.int32).at[1, 3].set(1)
    mask = jnp.ones((b, t), bool)
    final_obs = jnp.ones((b, IMG, IMG, C))
    has_final = jnp.asarray([False, True, False])

    def loss_fn(params):
        return m.loss({**variables, "params": params} if "constants" in variables else
                      {"params": params}, obs, act, rew, end, mask, final_obs, has_final)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    cm = metrics["confusion_matrix"]
    assert np.asarray(cm["rew"]).shape == (3, 3)
    # mask-weighted counts: (t-1)*b samples
    assert np.asarray(cm["rew"]).sum() == b * (t - 1)


def test_actor_critic_predict_and_loss(actor_critic):
    m, variables = actor_critic
    b, t = 4, 5
    obs = jax.random.uniform(jax.random.PRNGKey(11), (b, IMG, IMG, C), minval=-1, maxval=1)
    out = m.predict_act_value(variables, obs, m.initial_carry(b))
    assert out.logits_act.shape == (b, NA) and out.val.shape == (b,)
    # zero-init heads -> uniform policy, zero value
    np.testing.assert_allclose(np.asarray(out.logits_act), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.val), 0, atol=1e-6)

    cfg = ActorCriticLossConfig(backup_every=t, gamma=0.985, lambda_=0.95,
                                weight_value_loss=1.0, weight_entropy_loss=0.001)
    rng = np.random.default_rng(1)
    act = jnp.asarray(rng.integers(0, NA, (b, t)))
    rew = jnp.asarray(rng.normal(size=(b, t)), jnp.float32)
    end = jnp.zeros((b, t))
    trunc = jnp.zeros((b, t))
    logits = jnp.asarray(rng.normal(size=(b, t, NA)), jnp.float32)
    val = jnp.asarray(rng.normal(size=(b, t)), jnp.float32)
    vboot = jnp.asarray(rng.normal(size=(b, t)), jnp.float32)
    loss, metrics = m.loss_from_rollout(act, rew, end, trunc, logits, val, vboot, cfg)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"policy_entropy", "loss_actions", "loss_entropy", "loss_values",
                            "loss_total"}


def test_agent_checkpoint_roundtrip(tmp_path):
    cfg = AgentConfig(
        denoiser=DenoiserConfig(
            inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=NC,
                                         cond_channels=16, depths=[1], channels=[8],
                                         attn_depths=[0]),
            sigma_data=0.5, sigma_offset_noise=0.3),
        rew_end_model=RewEndModelConfig(lstm_dim=16, img_channels=C, img_size=IMG,
                                        cond_channels=8, depths=[1], channels=[8],
                                        attn_depths=[0]),
        actor_critic=ActorCriticConfig(lstm_dim=16, img_channels=C, img_size=IMG,
                                       channels=[8], down=[1]),
        num_actions=NA)
    assert cfg.denoiser.inner_model.num_actions == NA  # __post_init__ injection
    agent = Agent(cfg).init(jax.random.PRNGKey(0), img_size=IMG)
    path = tmp_path / "agent.pt"
    agent.save(path)
    agent2 = Agent(cfg).init(jax.random.PRNGKey(42), img_size=IMG)
    agent2.load(path, load_actor_critic=False)
    d1 = jax.tree_util.tree_leaves(agent.variables["denoiser"])
    d2 = jax.tree_util.tree_leaves(agent2.variables["denoiser"])
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_agent_snapshot_npz_format(tmp_path):
    """Weights-only snapshots are flat-keyed npz readable by plain numpy
    (diamond_tpu/checkpoint.py), and legacy pickles still load."""
    import pickle

    import numpy as np

    from diamond_tpu.checkpoint import load_agent_snapshot
    from diamond_tpu.models.agent import Agent, AgentConfig
    from diamond_tpu.models import (ActorCriticConfig, DenoiserConfig, InnerModelConfig,
                                    RewEndModelConfig)

    cfg = AgentConfig(
        denoiser=DenoiserConfig(
            inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                         cond_channels=8, depths=[1], channels=[8],
                                         attn_depths=[0]),
            sigma_data=0.5, sigma_offset_noise=0.3),
        rew_end_model=RewEndModelConfig(lstm_dim=8, img_channels=3, img_size=16,
                                        cond_channels=8, depths=[1], channels=[8],
                                        attn_depths=[0]),
        actor_critic=ActorCriticConfig(lstm_dim=8, img_channels=3, img_size=16,
                                       channels=[8], down=[1]),
        num_actions=3)
    agent = Agent(cfg).init(jax.random.PRNGKey(0), img_size=16)
    p = tmp_path / "agent.npz"
    agent.save(p)

    # plain-numpy readable, flat "/"-joined keys
    z = np.load(p)
    assert any(k.startswith("denoiser/params/") for k in z.files)

    agent2 = Agent(cfg).init(jax.random.PRNGKey(1), img_size=16)
    agent2.load(p)
    a = jax.tree_util.tree_leaves(agent.variables)
    b = jax.tree_util.tree_leaves(agent2.variables)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # legacy pickle round-trip through the same loader
    pkl = tmp_path / "agent.pkl"
    with pkl.open("wb") as f:
        pickle.dump(agent.state_dict(), f)
    agent3 = Agent(cfg).init(jax.random.PRNGKey(2), img_size=16)
    agent3.load(pkl)
    for x, y in zip(a, jax.tree_util.tree_leaves(agent3.variables)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
