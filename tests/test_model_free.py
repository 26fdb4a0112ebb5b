"""Model-free mode: RL directly on the (fake) real env, world model untouched
(reference config training.model_free, trainer.py:171-172, 330, 342)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.coroutines.env_loop import EnvLoop
from diamond_tpu.envs import FakeEnv
from diamond_tpu.models import ActorCritic, ActorCriticConfig, ActorCriticLossConfig
from diamond_tpu.training import TrainState, configure_opt, make_model_free_ac_train_step

SIZE = 16


def test_recomputed_forward_matches_rollout():
    """The jitted replay must reproduce the rollout's logits/values exactly — that is what
    makes the recompute-gradient equal to backprop-through-the-rollout."""
    env = FakeEnv(num_envs=3, size=SIZE, max_episode_steps=6)
    ac = ActorCritic(ActorCriticConfig(lstm_dim=16, img_channels=3, img_size=SIZE,
                                       channels=[4, 4], down=[1, 1], num_actions=3))
    variables = ac.init(jax.random.PRNGKey(0))
    # non-degenerate heads so logits/values vary
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape), variables)

    loop = EnvLoop(env, ac, lambda: variables, seed=3)
    obs, act, rew, end, trunc, logits, val, val_boot, _ = loop.send(10)
    ex = loop.last_extras

    from diamond_tpu.data.episode import obs_to_float

    def scan_step(carry, xs):
        hx, cx = carry
        obs_t, reset_t = xs
        gate = 1.0 - reset_t.astype(jnp.float32)[:, None]
        out = ac.predict_act_value(variables, obs_to_float(obs_t), (hx * gate, cx * gate))
        return out.carry, (out.logits_act, out.val)

    _, (lg, vl) = jax.lax.scan(scan_step, (jnp.asarray(ex["hx0"]), jnp.asarray(ex["cx0"])),
                               (jnp.moveaxis(jnp.asarray(obs), 0, 1),
                                jnp.moveaxis(jnp.asarray(ex["reset_mask"]), 0, 1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(lg), 0, 1), logits, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(vl), 0, 1), val, rtol=1e-5, atol=1e-5)


def test_model_free_train_step():
    env = FakeEnv(num_envs=4, size=SIZE, max_episode_steps=8)
    ac = ActorCritic(ActorCriticConfig(lstm_dim=16, img_channels=3, img_size=SIZE,
                                       channels=[4, 4], down=[1, 1], num_actions=3))
    variables = ac.init(jax.random.PRNGKey(0))
    tx = configure_opt(1e-3, 0.0, 1e-8, 100.0, 0)
    state = TrainState.create(jax.tree_util.tree_map(jnp.array, variables["params"]), tx)
    loss_cfg = ActorCriticLossConfig(backup_every=5, gamma=0.985, lambda_=0.95,
                                     weight_value_loss=1.0, weight_entropy_loss=0.001)
    step = make_model_free_ac_train_step(ac, tx, loss_cfg)

    holder = {"state": state}
    loop = EnvLoop(env, ac, lambda: {"params": holder["state"].params}, seed=0)
    for i in range(3):
        obs, act, rew, end, trunc, *_, val_boot, _ = loop.send(5)
        ex = loop.last_extras
        holder["state"], metrics = step(
            holder["state"], jnp.asarray(obs), jnp.asarray(act),
            jnp.asarray(rew, jnp.float32), jnp.asarray(end), jnp.asarray(trunc),
            jnp.asarray(ex["reset_mask"]), jnp.asarray(ex["hx0"]), jnp.asarray(ex["cx0"]),
            jnp.asarray(val_boot))
    assert int(holder["state"].step) == 3
    assert np.isfinite(float(metrics["loss_total"]))
