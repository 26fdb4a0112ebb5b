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


def test_select_devices():
    """common.devices resolution (reference src/main.py:47-56 semantics)."""
    from diamond_tpu.parallel import select_devices

    all_devs = jax.devices()
    assert select_devices("all") == all_devs
    assert select_devices(None) == all_devs
    assert select_devices(2) == [all_devs[2]]
    assert select_devices([1, 3, 5]) == [all_devs[1], all_devs[3], all_devs[5]]
    with pytest.raises(ValueError, match="out of range"):
        select_devices([0, 99])
    with pytest.raises(ValueError, match="duplicate"):
        select_devices([1, 1])
    with pytest.raises(ValueError, match="empty"):
        select_devices([])


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


def _params_allclose(p1, p2, rtol=2e-4, atol=2e-5):
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.slow
def test_dp_rew_end_step_matches_single_device():
    """Single-device vs 8-device rew/end train step: params equal after one update
    (reference DDP grad-equality semantics, src/utils.py:105-106). The sharded side
    consumes a batch assembled by the on-mesh DeviceEpisodeStore, the single side the
    equivalent host arrays — proving the store path feeds the sharded step identically."""
    from diamond_tpu.data import Dataset, Episode, SegmentId
    from diamond_tpu.data.device_store import DeviceEpisodeStore
    import tempfile

    mesh = make_mesh()
    _, _, rew_end, r_vars, *_ = build_models()
    tx = configure_opt(1e-3, 1e-2, 1e-8, 100.0, 0)
    step = make_rew_end_train_step(rew_end, tx)

    rng = np.random.default_rng(1)
    t = 6
    with tempfile.TemporaryDirectory() as d:
        ds = Dataset(d, "ds")
        for _ in range(2):
            end = np.zeros(20, np.uint8)
            end[-1] = 1
            ds.add_episode(Episode(
                obs=rng.integers(0, 255, (20, IMG, IMG, C), dtype=np.uint8),
                act=rng.integers(0, NA, 20).astype(np.int32),
                rew=rng.choice([-1.0, 0.0, 1.0], 20).astype(np.float32),
                end=end, trunc=np.zeros(20, np.uint8),
                info={"final_observation": rng.integers(0, 255, (IMG, IMG, C),
                                                        dtype=np.uint8)}))
        store = DeviceEpisodeStore(64, (IMG, IMG, C), mesh=mesh)
        store.sync(ds)
        ids = [SegmentId(i % 2, s, s + t) for i, s in
               enumerate([0, 3, 7, 14, -2, 5, 11, 16])]
        db_mesh = store.make_batch(ids)

        from diamond_tpu.data.segment import collate_segments_to_batch
        db_host = jax.tree_util.tree_map(
            jnp.asarray, DeviceBatch.from_batch(
                collate_segments_to_batch([ds[sid] for sid in ids])))

    s1 = TrainState.create(jax.tree_util.tree_map(jnp.array, r_vars["params"]), tx)
    s1, m1 = step(s1, db_host)

    s2 = TrainState.create(replicate(jax.tree_util.tree_map(jnp.array, r_vars["params"]),
                                     mesh), tx)
    s2 = s2.replace(opt_state=replicate(s2.opt_state, mesh))
    s2, m2 = step(s2, db_mesh)

    np.testing.assert_allclose(float(m1["loss_total"]), float(m2["loss_total"]), rtol=1e-5)
    _params_allclose(s1.params, s2.params)


@pytest.mark.slow
def test_dp_ac_step_matches_single_device():
    """Single-device vs 8-device fused-imagination AC step, TWO steps with pool
    consumption: params, pool pointer, and losses must agree — the pool-pointer
    prefix-sum and donated buffers are exactly where sharded execution could silently
    drift (VERDICT round-2 missing #5)."""
    mesh = make_mesh()
    denoiser, d_vars, rew_end, r_vars, ac, ac_vars = build_models()

    cfg = WorldModelEnvConfig(horizon=4, num_batches_to_preload=1,
                              diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2))
    engine = ImaginationEngine(denoiser, rew_end, ac, cfg)
    rng = np.random.default_rng(0)
    P = 64
    obs_u8 = rng.integers(0, 255, (P, NC, IMG, IMG, C), dtype=np.uint8)
    act = rng.integers(0, NA, (P, NC)).astype(np.int32)
    hx, cx = make_ic_preparer(rew_end)(r_vars, jnp.asarray(obs_u8), jnp.asarray(act))
    pool0 = ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                   ptr=jnp.asarray(0, jnp.int32))
    st0, pool0 = engine.initial_state(pool0, B)

    loss_cfg = ActorCriticLossConfig(backup_every=4, gamma=0.985, lambda_=0.95,
                                     weight_value_loss=1.0, weight_entropy_loss=0.001)
    tx = configure_opt(1e-3, 0.0, 1e-8, 100.0, 0)
    step = make_ac_train_step(engine, ac, tx, loss_cfg)

    def run(shard):
        # fresh copies each run: the step donates state, imag state AND pool
        st = jax.tree_util.tree_map(jnp.array, st0)
        pool = jax.tree_util.tree_map(jnp.array, pool0)
        dv = jax.tree_util.tree_map(jnp.array, d_vars)
        rv = jax.tree_util.tree_map(jnp.array, r_vars)
        s = TrainState.create(jax.tree_util.tree_map(jnp.array, ac_vars["params"]), tx)
        if shard:
            st = shard_imag_state(st, mesh)
            pool = shard_pool(pool, mesh)
            dv, rv = replicate(dv, mesh), replicate(rv, mesh)
            s = TrainState.create(replicate(s.params, mesh), tx)
            s = s.replace(opt_state=replicate(s.opt_state, mesh))
        metrics = None
        for i in range(2):
            s, st, pool, metrics = step(s, dv, rv, st, pool, jax.random.PRNGKey(i))
        return s, st, pool, metrics

    s1, st1, pool1, m1 = run(shard=False)
    s2, st2, pool2, m2 = run(shard=True)

    assert int(s1.step) == int(s2.step) == 2
    assert int(pool1.ptr) == int(pool2.ptr)  # identical IC consumption
    np.testing.assert_allclose(float(m1["loss_total"]), float(m2["loss_total"]),
                               rtol=1e-4, atol=1e-5)
    _params_allclose(s1.params, s2.params)
    np.testing.assert_allclose(np.asarray(st1.obs_buffer), np.asarray(st2.obs_buffer),
                               rtol=2e-4, atol=2e-5)
