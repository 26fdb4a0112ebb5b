"""Multi-device data-parallel tests on the 8-virtual-CPU mesh (SURVEY.md section 4 item 5):
every train step runs sharded, and sharded results match single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.data import DeviceBatch
from diamond_tpu.envs.world_model_env import (ICPool, ImaginationEngine, WorldModelEnvConfig,
                                              make_ic_preparer)
from diamond_tpu.models import (ActorCritic, ActorCriticConfig, ActorCriticLossConfig,
                                Denoiser, DenoiserConfig, DiffusionSamplerConfig,
                                InnerModelConfig, RewEndModel, RewEndModelConfig,
                                SigmaDistributionConfig)
from diamond_tpu.parallel import (make_mesh, replicate, shard_device_batch, shard_imag_state,
                                  shard_pool)
from diamond_tpu.training import (TrainState, configure_opt, make_ac_train_step,
                                  make_denoiser_train_step, make_rew_end_train_step)

IMG, C, NC, NA, D = 16, 3, 4, 3, 32
B = 8  # divisible by the 8-device mesh


def build_models():
    denoiser = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=NC,
                                     cond_channels=16, depths=[1, 1], channels=[8, 8],
                                     attn_depths=[0, 0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    rew_end = RewEndModel(RewEndModelConfig(lstm_dim=D, img_channels=C, img_size=IMG,
                                            cond_channels=8, depths=[1, 1], channels=[8, 8],
                                            attn_depths=[0, 0], num_actions=NA))
    ac = ActorCritic(ActorCriticConfig(lstm_dim=D, img_channels=C, img_size=IMG,
                                       channels=[8, 8], down=[1, 1], num_actions=NA))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return (denoiser, denoiser.init(k1, img_size=IMG), rew_end, rew_end.init(k2),
            ac, ac.init(k3))


def random_batch(t, seed=0):
    rng = np.random.default_rng(seed)
    return DeviceBatch(
        obs=rng.integers(0, 255, (B, t, IMG, IMG, C), dtype=np.uint8),
        act=rng.integers(0, NA, (B, t)).astype(np.int32),
        rew=rng.choice([-1.0, 0.0, 1.0], (B, t)).astype(np.float32),
        end=np.zeros((B, t), np.int32),
        trunc=np.zeros((B, t), np.int32),
        mask_padding=np.ones((B, t), bool),
        final_obs=np.zeros((B, IMG, IMG, C), np.uint8),
        has_final_obs=np.zeros(B, bool),
    )


@pytest.mark.slow
def test_dp_denoiser_step_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    denoiser, d_vars, *_ = build_models()
    tx = configure_opt(1e-3, 1e-2, 1e-8, 1.0, 0)
    sigma_cfg = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20)
    step = make_denoiser_train_step(denoiser, tx, sigma_cfg)
    batch = random_batch(NC + 2)
    rng = jax.random.PRNGKey(5)

    # single device
    s1 = TrainState.create(jax.tree_util.tree_map(jnp.array, d_vars["params"]), tx)
    s1, m1 = step(s1, d_vars.get("constants", {}), batch, rng)

    # sharded: same math, just different placement
    s2 = TrainState.create(replicate(d_vars["params"], mesh), tx)
    s2 = s2.replace(opt_state=replicate(s2.opt_state, mesh))
    consts = replicate(d_vars.get("constants", {}), mesh)
    db = shard_device_batch(jax.tree_util.tree_map(jnp.asarray, batch), mesh)
    s2, m2 = step(s2, consts, db, rng)

    np.testing.assert_allclose(float(m1["loss_denoising"]), float(m2["loss_denoising"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_dp_rew_end_and_ac_steps_run_sharded():
    mesh = make_mesh()
    denoiser, d_vars, rew_end, r_vars, ac, ac_vars = build_models()

    # IC prep + replication first: device_put may alias source buffers, and the donated
    # train-step calls below would otherwise invalidate r_vars/ac_vars.
    cfg = WorldModelEnvConfig(horizon=4, num_batches_to_preload=1,
                              diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2))
    engine = ImaginationEngine(denoiser, rew_end, ac, cfg)
    rng = np.random.default_rng(0)
    P = 64
    obs_u8 = rng.integers(0, 255, (P, NC, IMG, IMG, C), dtype=np.uint8)
    act = rng.integers(0, NA, (P, NC)).astype(np.int32)
    hx, cx = make_ic_preparer(rew_end)(r_vars, jnp.asarray(obs_u8), jnp.asarray(act))
    pool = ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                  ptr=jnp.asarray(0, jnp.int32))
    pool = shard_pool(pool, mesh)
    st, pool = engine.initial_state(pool, B)
    st = shard_imag_state(st, mesh)
    d_vars_r = replicate(jax.tree_util.tree_map(jnp.array, d_vars), mesh)
    r_vars_r = replicate(jax.tree_util.tree_map(jnp.array, r_vars), mesh)

    # rew/end step sharded
    tx_r = configure_opt(1e-3, 1e-2, 1e-8, 100.0, 0)
    step_r = make_rew_end_train_step(rew_end, tx_r)
    batch = random_batch(6, seed=1)
    sr = TrainState.create(replicate(jax.tree_util.tree_map(jnp.array, r_vars["params"]),
                                     mesh), tx_r)
    sr = sr.replace(opt_state=replicate(sr.opt_state, mesh))
    db = shard_device_batch(jax.tree_util.tree_map(jnp.asarray, batch), mesh)
    sr, mr = step_r(sr, db)
    assert np.isfinite(float(mr["loss_total"]))

    loss_cfg = ActorCriticLossConfig(backup_every=4, gamma=0.985, lambda_=0.95,
                                     weight_value_loss=1.0, weight_entropy_loss=0.001)
    tx_a = configure_opt(1e-3, 0.0, 1e-8, 100.0, 0)
    step_a = make_ac_train_step(engine, ac, tx_a, loss_cfg)
    sa = TrainState.create(replicate(jax.tree_util.tree_map(jnp.array, ac_vars["params"]),
                                     mesh), tx_a)
    sa = sa.replace(opt_state=replicate(sa.opt_state, mesh))
    for i in range(2):
        sa, st, pool, ma = step_a(sa, d_vars_r, r_vars_r, st, pool, jax.random.PRNGKey(i))
    assert np.isfinite(float(ma["loss_total"]))
    assert int(sa.step) == 2
