"""Tests of the fused imagination rollout (the system's hot path, SURVEY.md section 3.4):
pool consumption, horizon truncation, reset semantics, determinism, and a full jitted AC
train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.envs.world_model_env import (ICPool, ImaginationEngine, PoolManager,
                                              WorldModelEnvConfig, make_ic_preparer)
from diamond_tpu.models import (ActorCritic, ActorCriticConfig, ActorCriticLossConfig,
                                Denoiser, DenoiserConfig, DiffusionSamplerConfig,
                                InnerModelConfig, RewEndModel, RewEndModelConfig)
from diamond_tpu.training import TrainState, configure_opt, make_ac_train_step

IMG, C, NC, NA, D = 16, 3, 4, 3, 32
B = 4
HORIZON = 5


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
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
    r1, r2, r3 = jax.random.split(rng, 3)
    d_vars = denoiser.init(r1, img_size=IMG)
    r_vars = rew_end.init(r2)
    ac_vars = ac.init(r3)
    cfg = WorldModelEnvConfig(horizon=HORIZON, num_batches_to_preload=2,
                              diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2))
    engine = ImaginationEngine(denoiser, rew_end, ac, cfg)
    return engine, d_vars, r_vars, ac_vars


def make_pool(engine, r_vars, size=64, seed=0):
    rng = np.random.default_rng(seed)
    obs_u8 = rng.integers(0, 255, (size, NC, IMG, IMG, C), dtype=np.uint8)
    act = rng.integers(0, NA, (size, NC)).astype(np.int32)
    prepare = make_ic_preparer(engine.rew_end_model)
    hx, cx = prepare(r_vars, jnp.asarray(obs_u8), jnp.asarray(act))
    return ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                  ptr=jnp.asarray(0, jnp.int32))


def test_rollout_shapes_truncation_and_pool(setup):
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars)
    st, pool = engine.initial_state(pool, B)
    assert int(pool.ptr) == B

    T = 12  # > horizon: every env must truncate at least once
    traj, st2, pool2 = jax.jit(engine.rollout, static_argnums=(6,))(
        ac_vars, d_vars, r_vars, st, pool, jax.random.PRNGKey(1), T)

    assert traj["act"].shape == (B, T)
    assert traj["logits_act"].shape == (B, T, NA)
    assert traj["val_bootstrap"].shape == (B, T)
    deaths = int(np.asarray(traj["dead"]).sum())
    assert deaths > 0, "untrained end-head fires ~50%/step: deaths must occur"
    assert int(pool2.ptr) == B + deaths, "each death consumes exactly one pool entry"
    # ep_len never exceeds horizon
    assert int(jnp.max(st2.ep_len)) <= HORIZON
    # rewards in {-1, 0, 1}
    assert set(np.unique(np.asarray(traj["rew"]))) <= {-1.0, 0.0, 1.0}


def test_wm_transition_truncates_at_horizon(setup):
    """trunc fires exactly when ep_len reaches the horizon (reference
    world_model_env.py:71-72), independent of the sampled end."""
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars)
    st, _ = engine.initial_state(pool, B)
    st = st.replace(ep_len=jnp.asarray([HORIZON - 1, HORIZON - 2, 0, HORIZON - 1],
                                       jnp.int32))
    act = jnp.zeros((B,), jnp.int32)
    st2, next_obs, rew, end, trunc = jax.jit(engine._wm_transition)(
        d_vars, r_vars, st, act, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(trunc), [1, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(st2.ep_len),
                                  [HORIZON, HORIZON - 1, 1, HORIZON])
    # next frame is on the uint8 grid (denoiser quantization)
    o = np.asarray(next_obs)
    np.testing.assert_allclose(np.round((o + 1) / 2 * 255) / 255 * 2 - 1, o, atol=1e-5)


@pytest.mark.slow
def test_rollout_deterministic(setup):
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars)
    st, pool = engine.initial_state(pool, B)
    f = jax.jit(engine.rollout, static_argnums=(6,))
    t1, *_ = f(ac_vars, d_vars, r_vars, st, pool, jax.random.PRNGKey(7), 6)
    t2, *_ = f(ac_vars, d_vars, r_vars, st, pool, jax.random.PRNGKey(7), 6)
    np.testing.assert_allclose(np.asarray(t1["rew"]), np.asarray(t2["rew"]))
    np.testing.assert_allclose(np.asarray(t1["val"]), np.asarray(t2["val"]))


@pytest.mark.slow
def test_val_bootstrap_alignment(setup):
    """For steps where the env did NOT die, bootstrap[t] must equal val[t+1]."""
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars)
    st, pool = engine.initial_state(pool, B)
    traj, *_ = jax.jit(engine.rollout, static_argnums=(6,))(
        ac_vars, d_vars, r_vars, st, pool, jax.random.PRNGKey(3), 8)
    val = np.asarray(traj["val"])
    boot = np.asarray(traj["val_bootstrap"])
    dead = np.asarray(traj["dead"])
    alive = ~dead[:, :-1]
    np.testing.assert_allclose(boot[:, :-1][alive], val[:, 1:][alive], rtol=1e-5)
    # where dead, bootstrap is the final-obs value
    vf = np.asarray(traj["val_final"])
    np.testing.assert_allclose(boot[dead], vf[dead], rtol=1e-5)


@pytest.mark.slow
def test_ac_train_step_updates_policy(setup):
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars, size=256)
    st, pool = engine.initial_state(pool, B)
    loss_cfg = ActorCriticLossConfig(backup_every=6, gamma=0.985, lambda_=0.95,
                                     weight_value_loss=1.0, weight_entropy_loss=0.001)
    tx = configure_opt(1e-3, 0.0, 1e-8, max_grad_norm=100.0, lr_warmup_steps=0)
    step_fn = make_ac_train_step(engine, engine.actor_critic, tx, loss_cfg)
    # the train step donates TrainState buffers; snapshot initial params to host first
    init_leaves = [np.array(x) for x in jax.tree_util.tree_leaves(ac_vars["params"])]
    state = TrainState.create(jax.tree_util.tree_map(jnp.array, ac_vars["params"]), tx)

    for i in range(3):
        state, st, pool, metrics = step_fn(state, d_vars, r_vars, st, pool,
                                           jax.random.PRNGKey(10 + i))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["grad_norm_before_clip"]) > 0
    # params moved
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(init_leaves, jax.tree_util.tree_leaves(state.params)))
    assert moved


def test_pool_manager_background_failure_surfaces(setup):
    """A crash in the background pool-builder thread must surface on the next ensure(),
    not silently produce a None pool (code-review round 2)."""
    from diamond_tpu.envs.world_model_env import PoolManager

    engine, d_vars, r_vars, ac_vars = setup
    real_pool = make_pool(engine, r_vars, size=8)

    mgr = PoolManager(engine, None, None, pool_size=8, chunk=8, background=True)
    calls = {"n": 0}

    def fake_build(rv, ac_vars=None):  # succeed once (foreground), raise in background
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("boom")
        return real_pool

    mgr.build_pool = fake_build
    pool, swapped = mgr.ensure(None, r_vars, max_consumption=1)  # kicks background build
    assert swapped and pool is real_pool
    consumed = pool.replace(ptr=pool.ptr + pool.size)  # force needs_refill
    with pytest.raises(RuntimeError, match="IC-pool build failed"):
        mgr.ensure(consumed, r_vars, max_consumption=1)
    # wait_pending with nothing pending is a no-op
    mgr._pending = None
    mgr.wait_pending()


def test_pool_manager_kick_survives_donated_weights(setup):
    """_kick must SNAPSHOT the weights it hands to the background thread: the caller's
    next dispatch is a train step that DONATES those exact param buffers, and a background
    dispatch against a donated array is a use-after-free (the seed1 INVALID_ARGUMENT crash
    at an AC pool-refill boundary, round 3). Donation is simulated deterministically with
    Array.delete() — CPU jit ignores donate_argnums, the tunnel PJRT does not."""
    from diamond_tpu.envs.world_model_env import PoolManager

    engine, d_vars, r_vars, ac_vars = setup
    # fresh buffers owned by this test (the fixture is module-scoped; don't delete its arrays)
    r_mine = jax.tree_util.tree_map(jnp.copy, r_vars)
    ac_mine = jax.tree_util.tree_map(jnp.copy, ac_vars)

    class _FakeSampler:
        def sample(self):
            return list(range(8))

    rng = np.random.default_rng(7)

    class _Seg:
        def __init__(self):
            self.obs = rng.integers(0, 255, (NC, IMG, IMG, C), dtype=np.uint8)
            self.act = rng.integers(0, NA, (NC,)).astype(np.int64)

    ds = {i: _Seg() for i in range(8)}
    mgr = PoolManager(engine, ds, _FakeSampler(), pool_size=8, chunk=8, background=True,
                      policy_feats=True)
    pool, swapped = mgr.ensure(None, r_mine, max_consumption=1, ac_vars=ac_mine)
    assert swapped
    # simulate the donating train step consuming the caller's buffers right after ensure()
    for leaf in jax.tree_util.tree_leaves(r_mine) + jax.tree_util.tree_leaves(ac_mine):
        leaf.delete()
    mgr.wait_pending()  # raises if the background build dispatched against deleted arrays
    assert mgr._next_pool is not None
    assert bool(jnp.isfinite(mgr._next_pool.feats).all())
    assert bool(jnp.isfinite(mgr._next_pool.hx).all())


@pytest.mark.slow
def test_pool_policy_feats_matches_encode_path(setup):
    """With ICPool.feats precomputed from the SAME policy weights, the rollout must produce
    the same trajectory as the per-step batched-encode path (the gather replaces an encode
    of identical frames — value-exact; only gradients/staleness differ, by design)."""
    engine, d_vars, r_vars, ac_vars = setup
    pool = make_pool(engine, r_vars)

    # precompute feats exactly as PoolManager._feats_fn does
    from diamond_tpu.data.episode import obs_to_float
    n, t = pool.obs.shape[:2]
    flat = obs_to_float(pool.obs.reshape((n * t,) + pool.obs.shape[2:]))
    feats = engine.actor_critic.encode(ac_vars, flat).reshape(n, t, -1)
    pool_f = pool.replace(feats=feats)

    st, pool_c = engine.initial_state(pool, B)
    st_f, pool_fc = engine.initial_state(pool_f, B)

    f = jax.jit(engine.rollout, static_argnums=(6,))
    T = 12  # > horizon so deaths occur and the feats path is actually exercised
    t1, st1, p1 = f(ac_vars, d_vars, r_vars, st, pool_c, jax.random.PRNGKey(5), T)
    t2, st2, p2 = f(ac_vars, d_vars, r_vars, st_f, pool_fc, jax.random.PRNGKey(5), T)

    assert int(np.asarray(t1["dead"]).sum()) > 0, "need deaths to exercise the gather"
    assert int(p1.ptr) == int(p2.ptr)
    for k in ("act", "rew", "end", "logits_act", "val", "val_bootstrap"):
        np.testing.assert_allclose(np.asarray(t1[k]), np.asarray(t2[k]), atol=1e-4,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(st1.ac_hx), np.asarray(st2.ac_hx), atol=1e-4)


def test_pool_manager_builds_feats(setup):
    """PoolManager(policy_feats=True) fills ICPool.feats with the policy-trunk features of
    the pool's conditioning frames."""
    from diamond_tpu.data.episode import obs_to_float

    engine, d_vars, r_vars, ac_vars = setup

    class _FakeSampler:
        def __init__(self):
            self._rng = np.random.default_rng(3)

        def sample(self):
            return list(range(8))

    class _FakeDataset(dict):
        pass

    rng = np.random.default_rng(4)

    class _Seg:
        def __init__(self):
            self.obs = rng.integers(0, 255, (NC, IMG, IMG, C), dtype=np.uint8)
            self.act = rng.integers(0, NA, (NC,)).astype(np.int64)

    ds = _FakeDataset({i: _Seg() for i in range(8)})
    mgr = PoolManager(engine, ds, _FakeSampler(), pool_size=8, chunk=8, background=False,
                      policy_feats=True)
    pool = mgr.build_pool(r_vars, ac_vars)
    assert pool.feats is not None and pool.feats.shape[:2] == (8, NC)
    want = engine.actor_critic.encode(
        ac_vars, obs_to_float(pool.obs.reshape((8 * NC, IMG, IMG, C)))).reshape(8, NC, -1)
    np.testing.assert_allclose(np.asarray(pool.feats), np.asarray(want), atol=1e-5)
    with pytest.raises(AssertionError, match="policy_feats"):
        mgr.build_pool(r_vars, None)


@pytest.mark.slow
def test_imagination_rl_learns_on_mock_world_model(setup):
    """The full fused rollout + REINFORCE path LEARNS: with a mock world model that
    rewards action 2 (+1) and punishes everything else (-1), the policy converges to
    action 2 (capability guard for the batched-encoder rollout refactor)."""
    from diamond_tpu.data.episode import obs_to_float
    from diamond_tpu.models import ActorCriticLossConfig, configure_opt
    from diamond_tpu.training import TrainState, make_ac_train_step

    engine, d_vars, r_vars, ac_vars = setup
    B = 16

    orig_sample = engine.sampler.sample
    orig_rew_end = engine.rew_end_model.predict_rew_end
    try:
        engine.sampler.sample = \
            lambda v, rng, prev_obs, prev_act, return_trajectory=False: (prev_obs[:, -1], [])

        def fake_rew_end(rv, obs, act, next_obs, carry=None):
            b = obs.shape[0]
            a = act[:, 0]
            lr = jnp.where((a == 2)[:, None], jnp.array([[-30.0, -30.0, 30.0]]),
                           jnp.array([[30.0, -30.0, -30.0]]))
            le = jnp.broadcast_to(jnp.array([[30.0, -30.0]]), (b, 2))
            if carry is None:
                carry = (jnp.zeros((b, D)), jnp.zeros((b, D)))
            return lr[:, None], le[:, None], carry

        engine.rew_end_model.predict_rew_end = fake_rew_end

        pool = make_pool(engine, r_vars, size=64)
        st, pool = engine.initial_state(pool, B)
        tx = configure_opt(3e-3, 0.0, 1e-8, 100.0, 0)
        step = make_ac_train_step(engine, engine.actor_critic, tx, ActorCriticLossConfig(
            backup_every=HORIZON, gamma=0.9, lambda_=0.95, weight_value_loss=1.0,
            weight_entropy_loss=0.001))
        state = TrainState.create(ac_vars["params"], tx)
        key = jax.random.PRNGKey(1)
        for _ in range(150):
            key, kk = jax.random.split(key)
            state, st, pool, m = step(state, d_vars, r_vars, st, pool, kk)

        obs = obs_to_float(pool.obs[:B, -1])
        out = engine.actor_critic.predict_act_value(
            {"params": state.params}, obs, (jnp.zeros((B, D)), jnp.zeros((B, D))))
        p2 = float(jax.nn.softmax(out.logits_act, -1)[:, 2].mean())
        assert p2 > 0.8, p2
    finally:
        engine.sampler.sample = orig_sample
        engine.rew_end_model.predict_rew_end = orig_rew_end
