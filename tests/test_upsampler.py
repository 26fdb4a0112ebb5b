"""Two-stage world model: upsampler stage + cascaded sampler.

The reference's csgo branch (reference: README.md:47-57) is not in the snapshot; this is
an own cascaded-diffusion design: an action-free EDM denoiser at full resolution whose
conditioning is the bilinearly-upsampled low-res frame, with the low-res dynamics model
(the standard Denoiser) carrying all temporal structure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.models import (Denoiser, DenoiserConfig, DiffusionSampler,
                                DiffusionSamplerConfig, InnerModelConfig,
                                SigmaDistributionConfig, TwoStageSampler, downsample_avg,
                                quantize_to_uint8_grid, upsample_frame)

SIGMA_CFG = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20)


def make_upsampler(factor=4, img_channels=3):
    return Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=img_channels, num_steps_conditioning=1,
                                     cond_channels=16, depths=[1], channels=[8],
                                     attn_depths=[0]),
        sigma_data=0.5, sigma_offset_noise=0.3, upsampling_factor=factor))


def make_low_denoiser(num_actions=3):
    return Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[8],
                                     attn_depths=[0], num_actions=num_actions),
        sigma_data=0.5, sigma_offset_noise=0.3))


# ---------------------------------------------------------------------------
# resize ops


def test_downsample_avg_exact():
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    y = downsample_avg(x, 2)
    assert y.shape == (2, 2, 2, 1)
    # top-left 2x2 block of image 0: values 0,1,4,5 -> mean 2.5
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], 2.5)


def test_resize_roundtrip_on_block_constant_images():
    # images constant over factor-blocks survive area-down + nearest-up exactly
    rng = np.random.default_rng(0)
    blocks = rng.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32)
    x = jnp.asarray(np.kron(blocks.transpose(0, 3, 1, 2),
                            np.ones((4, 4), np.float32)).transpose(0, 2, 3, 1))
    y = upsample_frame(downsample_avg(x, 4), 4, method="nearest")
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    # and the default bilinear up preserves the downsample's mean
    y2 = upsample_frame(downsample_avg(x, 4), 4)
    np.testing.assert_allclose(float(y2.mean()), float(x.mean()), atol=1e-4)


def test_upsample_shapes():
    x = jnp.zeros((5, 8, 8, 3))
    assert upsample_frame(x, 4).shape == (5, 32, 32, 3)
    assert downsample_avg(jnp.zeros((5, 7, 32, 32, 3)), 4).shape == (5, 7, 8, 8, 3)


# ---------------------------------------------------------------------------
# upsampler model


def test_upsampler_has_no_action_embedding():
    up = make_upsampler()
    v = up.init(jax.random.PRNGKey(0), img_size=16)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    names = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert not any("act_emb" in n for n in names), names


def test_upsampler_loss_finite_and_masked():
    up = make_upsampler(factor=4)
    v = up.init(jax.random.PRNGKey(0), img_size=16)
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16, 3)).astype(np.float32))
    mask = jnp.ones((2, 3), bool)
    loss, metrics = up.loss_upsampler(v, obs, mask, jax.random.PRNGKey(2), SIGMA_CFG)
    assert np.isfinite(float(loss))
    assert "loss_denoising" in metrics

    # fully-masked-out frames do not contribute: perturbing them leaves the loss unchanged
    mask2 = mask.at[1, 2].set(False)
    loss_a, _ = up.loss_upsampler(v, obs, mask2, jax.random.PRNGKey(2), SIGMA_CFG)
    obs_b = obs.at[1, 2].set(-obs[1, 2])
    loss_b, _ = up.loss_upsampler(v, obs_b, mask2, jax.random.PRNGKey(2), SIGMA_CFG)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)


def test_upsampler_loss_has_gradients():
    up = make_upsampler(factor=2)
    v = up.init(jax.random.PRNGKey(0), img_size=8)
    obs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 2, 8, 8, 3))
                      .astype(np.float32))
    mask = jnp.ones((2, 2), bool)

    def f(params):
        loss, _ = up.loss_upsampler({"params": params, "constants": v["constants"]}, obs,
                                    mask, jax.random.PRNGKey(1), SIGMA_CFG)
        return loss

    g = jax.grad(f)(v["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0


def test_upsampler_denoise_conditions_on_lowres():
    """The denoised output must actually depend on the low-res conditioning."""
    up = make_upsampler(factor=4)
    v = up.init(jax.random.PRNGKey(0), img_size=16)
    # conv_out is zero-init (reference quirk) -> randomize it so the network output is live
    k = v["params"]["conv_out"]["kernel"]
    v = jax.tree_util.tree_map(lambda x: x, v)
    v["params"]["conv_out"]["kernel"] = jax.random.normal(jax.random.PRNGKey(9), k.shape,
                                                          k.dtype) * 0.1
    rng = np.random.default_rng(2)
    noisy = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    cond_a = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    cond_b = -cond_a
    y_a = up.denoise(v, noisy, 1.0, cond_a, None)
    y_b = up.denoise(v, noisy, 1.0, cond_b, None)
    assert float(jnp.abs(y_a - y_b).max()) > 0


# ---------------------------------------------------------------------------
# cascaded sampler


def test_two_stage_sampler_shapes_and_grid():
    low_model = make_low_denoiser()
    up_model = make_upsampler(factor=4)
    d_vars = low_model.init(jax.random.PRNGKey(0), img_size=4)
    u_vars = up_model.init(jax.random.PRNGKey(1), img_size=16)

    cascade = TwoStageSampler(
        DiffusionSampler(low_model, DiffusionSamplerConfig(num_steps_denoising=2)),
        up_model, DiffusionSamplerConfig(num_steps_denoising=2))

    rng = np.random.default_rng(3)
    prev_low = jnp.asarray(rng.uniform(-1, 1, (2, 2, 4, 4, 3)).astype(np.float32))
    prev_act = jnp.asarray(rng.integers(0, 3, (2, 2)).astype(np.int32))
    low, high = jax.jit(cascade.sample)(d_vars, u_vars, jax.random.PRNGKey(4), prev_low,
                                        prev_act)
    assert low.shape == (2, 4, 4, 3)
    assert high.shape == (2, 16, 16, 3)
    # both stages quantize to the uint8 grid (final sampler step ends at sigma=0 -> the
    # last denoised output passes through wrap_model_output)
    for x in (low, high):
        q = quantize_to_uint8_grid(x)
        np.testing.assert_allclose(np.asarray(q), np.asarray(x), atol=1e-6)


def test_two_stage_sampler_deterministic_given_key():
    low_model = make_low_denoiser()
    up_model = make_upsampler(factor=2)
    d_vars = low_model.init(jax.random.PRNGKey(0), img_size=4)
    u_vars = up_model.init(jax.random.PRNGKey(1), img_size=8)
    cascade = TwoStageSampler(
        DiffusionSampler(low_model, DiffusionSamplerConfig(num_steps_denoising=2)),
        up_model, DiffusionSamplerConfig(num_steps_denoising=3))
    prev_low = jnp.zeros((1, 2, 4, 4, 3))
    prev_act = jnp.zeros((1, 2), jnp.int32)
    a = cascade.sample(d_vars, u_vars, jax.random.PRNGKey(7), prev_low, prev_act)
    b = cascade.sample(d_vars, u_vars, jax.random.PRNGKey(7), prev_low, prev_act)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_upsampler_train_step():
    from diamond_tpu.data import DeviceBatch
    from diamond_tpu.models import configure_opt
    from diamond_tpu.training import TrainState, make_upsampler_train_step

    up = make_upsampler(factor=2)
    v = up.init(jax.random.PRNGKey(0), img_size=8)
    tx = configure_opt(1e-3, 1e-2, 1e-8, 1.0, 0)
    step = make_upsampler_train_step(up, tx, SIGMA_CFG)
    state = TrainState.create(v["params"], tx)

    rng = np.random.default_rng(0)
    batch = DeviceBatch(
        obs=rng.integers(0, 255, (2, 3, 8, 8, 3), dtype=np.uint8),
        act=rng.integers(0, 3, (2, 3)).astype(np.int32),
        rew=np.zeros((2, 3), np.float32), end=np.zeros((2, 3), np.int32),
        trunc=np.zeros((2, 3), np.int32), mask_padding=np.ones((2, 3), bool),
        final_obs=np.zeros((2, 8, 8, 3), np.uint8), has_final_obs=np.zeros(2, bool))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    state, metrics = step(state, v.get("constants", {}), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_denoising"]))
    assert int(state.step) == 1
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)))
    assert delta > 0


# ---------------------------------------------------------------------------
# e2e: csgo-style static-dataset world-model-only training


@pytest.mark.slow
def test_two_stage_static_dataset_training(tmp_path, monkeypatch):
    """agent=csgo + training.wm_only + static_dataset: train the low-res dynamics denoiser
    and the upsampler, eval both on the test traverser, checkpoint + resume."""
    from diamond_tpu.config import load_config
    from diamond_tpu.data import Dataset, Episode
    from diamond_tpu.trainer import Trainer

    static = tmp_path / "static"
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        ds = Dataset(static / split, f"{split}_dataset")
        for i in range(4):
            t = 24
            end = np.zeros(t, np.uint8)
            end[-1] = 1
            ds.add_episode(Episode(
                obs=rng.integers(0, 255, (t, 16, 16, 3), dtype=np.uint8),
                act=rng.integers(0, 3, t).astype(np.int32),
                rew=rng.choice([-1.0, 0.0, 1.0], t).astype(np.float32),
                end=end, trunc=np.zeros(t, np.uint8),
                info={"final_observation": rng.integers(0, 255, (16, 16, 3),
                                                        dtype=np.uint8)}))
        ds.save_to_default_path()

    overrides = [
        "agent=csgo",
        "env=fake",
        "env.train.size=16",
        "common.seed=3",
        "tpu.compute_dtype=float32",
        f"static_dataset.path={static}",
        "training.wm_only=True",
        "training.num_final_epochs=1",
        "evaluation.every=1",
        # tiny two-stage agent, factor 2: dynamics at 8x8, upsampler at 16x16
        "agent.upsampler.upsampling_factor=2",
        "agent.upsampler.inner_model.cond_channels=16",
        "agent.upsampler.inner_model.depths=[1]",
        "agent.upsampler.inner_model.channels=[8]",
        "agent.upsampler.inner_model.attn_depths=[0]",
        "agent.denoiser.inner_model.cond_channels=16",
        "agent.denoiser.inner_model.depths=[1,1]",
        "agent.denoiser.inner_model.channels=[8,8]",
        "agent.denoiser.inner_model.attn_depths=[0,0]",
        "agent.rew_end_model.lstm_dim=32",
        "agent.rew_end_model.cond_channels=8",
        "agent.rew_end_model.depths=[1,1]",
        "agent.rew_end_model.channels=[8,8]",
        "agent.rew_end_model.attn_depths=[0,0]",
        "agent.actor_critic.lstm_dim=32",
        "agent.actor_critic.channels=[8,8]",
        "agent.actor_critic.down=[1,1]",
        "denoiser.training.steps_first_epoch=2",
        "denoiser.training.steps_per_epoch=2",
        "denoiser.training.batch_size=4",
        "denoiser.training.lr_warmup_steps=2",
        "upsampler.training.steps_first_epoch=2",
        "upsampler.training.steps_per_epoch=2",
        "upsampler.training.batch_size=2",
        "upsampler.training.seq_length=2",
        "upsampler.training.lr_warmup_steps=2",
    ]

    run_dir = tmp_path / "csgo_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=overrides)
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    # the dynamics denoiser must live at low resolution
    assert trainer.agent.denoiser is not None and trainer._ds_factor == 2
    trainer.run()
    assert trainer.epoch == 1

    lines = (run_dir / "metrics.jsonl").read_text()
    assert "upsampler/train/loss_denoising" in lines
    assert "denoiser/train/loss_denoising" in lines
    assert "upsampler/test/loss_denoising" in lines
    assert "rew_end_model/train" not in lines  # wm_only
    assert "actor_critic/train" not in lines

    # the rotated agent snapshot carries the upsampler stage
    import glob
    snaps = sorted(glob.glob(str(run_dir / "checkpoints" / "agent_versions" / "*.npz")))
    assert snaps
    z = np.load(snaps[-1])
    assert any(k.startswith("upsampler/params/") for k in z.files)
    assert not any("act_emb" in k for k in z.files if k.startswith("upsampler/"))

    # resume restores the upsampler train state
    cfg2 = load_config("trainer", overrides=overrides + [
        "common.resume=True", "training.num_final_epochs=2"])
    trainer2 = Trainer(cfg2, root_dir=tmp_path, run_dir=run_dir)
    assert trainer2.epoch == 1
    assert int(trainer2.train_states["upsampler"].step) == \
        int(trainer.train_states["upsampler"].step)
    trainer2.run()
    assert trainer2.epoch == 2


# ---------------------------------------------------------------------------
# stateful play env in two-stage mode


def test_two_stage_stateful_env():
    """envs/wm_env_stateful.WorldModelEnv with an upsampler: dynamics at low res, displayed
    frames super-resolved, IC frames downsampled into the buffers, refill path on death."""
    from diamond_tpu.envs.world_model_env import ImaginationEngine, WorldModelEnvConfig
    from diamond_tpu.envs.wm_env_stateful import WorldModelEnv
    from diamond_tpu.models import (ActorCritic, ActorCriticConfig, RewEndModel,
                                    RewEndModelConfig)

    NA, NC, LOW, HIGH, F = 3, 2, 8, 16, 2
    low_model = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=NC,
                                     cond_channels=16, depths=[1], channels=[8],
                                     attn_depths=[0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    up_model = make_upsampler(factor=F)
    rew_end = RewEndModel(RewEndModelConfig(lstm_dim=16, img_channels=3, img_size=LOW,
                                            cond_channels=8, depths=[1], channels=[8],
                                            attn_depths=[0], num_actions=NA))
    ac = ActorCritic(ActorCriticConfig(lstm_dim=16, img_channels=3, img_size=LOW,
                                       channels=[8], down=[1], num_actions=NA))
    k = jax.random.PRNGKey(0)
    d_vars = low_model.init(k, img_size=LOW)
    u_vars = up_model.init(k, img_size=HIGH)
    r_vars = rew_end.init(jax.random.PRNGKey(1))

    engine = ImaginationEngine(low_model, rew_end, ac, WorldModelEnvConfig(
        horizon=2, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2)))

    rng = np.random.default_rng(0)

    def provider(n):
        obs = rng.integers(0, 255, (n, NC, HIGH, HIGH, 3), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        return obs, act, np.zeros((n, 16), np.float32), np.zeros((n, 16), np.float32)

    env = WorldModelEnv(engine, lambda: d_vars, lambda: r_vars, provider, num_envs=2,
                        upsampler=up_model, u_vars_getter=lambda: u_vars)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, HIGH, HIGH, 3) and obs.dtype == np.uint8
    assert env._st.obs_buffer.shape == (2, NC, LOW, LOW, 3)  # dynamics at low res

    saw_dead = False
    for t in range(3):  # horizon 2 -> the 2nd step truncates and refills
        act = np.array([t % NA, (t + 1) % NA])
        obs, rew, end, trunc, info = env.step(act)
        assert obs.shape == (2, HIGH, HIGH, 3) and obs.dtype == np.uint8
        assert info["low_res_obs"].shape == (2, LOW, LOW, 3)
        if (end | trunc).any():
            saw_dead = True
            assert info["final_observation"].shape[1:] == (HIGH, HIGH, 3)
    assert saw_dead


@pytest.mark.slow
def test_two_stage_stateful_env_int8():
    """play --int8 on a two-stage model: all three stages (low-res dynamics, rew/end,
    upsampler) calibrated, and the stateful env runs on the int8 path with display
    frames still full-res uint8."""
    from diamond_tpu.data.episode import obs_to_float
    from diamond_tpu.envs.world_model_env import ImaginationEngine, WorldModelEnvConfig
    from diamond_tpu.envs.wm_env_stateful import WorldModelEnv
    from diamond_tpu.models import (ActorCritic, ActorCriticConfig, RewEndModel,
                                    RewEndModelConfig)
    from diamond_tpu.models.denoiser import (downsample_avg, quantize_to_uint8_grid,
                                             upsample_frame)
    from diamond_tpu.models.diffusion_sampler import DiffusionSampler

    NA, NC, LOW, HIGH, F = 3, 2, 8, 16, 2
    low_model = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=NC,
                                     cond_channels=16, depths=[1], channels=[8],
                                     attn_depths=[0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    up_model = make_upsampler(factor=F)
    rew_end = RewEndModel(RewEndModelConfig(lstm_dim=16, img_channels=3, img_size=LOW,
                                            cond_channels=8, depths=[1], channels=[8],
                                            attn_depths=[0], num_actions=NA))
    ac = ActorCritic(ActorCriticConfig(lstm_dim=16, img_channels=3, img_size=LOW,
                                       channels=[8], down=[1], num_actions=NA))
    k = jax.random.PRNGKey(0)
    d_vars = low_model.init(k, img_size=LOW)
    u_vars = up_model.init(k, img_size=HIGH)
    r_vars = rew_end.init(jax.random.PRNGKey(1))

    engine = ImaginationEngine(low_model, rew_end, ac, WorldModelEnvConfig(
        horizon=2, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2)))

    rng = np.random.default_rng(3)

    def provider(n):
        obs = rng.integers(0, 255, (n, NC, HIGH, HIGH, 3), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        return obs, act, np.zeros((n, 16), np.float32), np.zeros((n, 16), np.float32)

    # the play.py --int8 two-stage startup sequence
    obs_u8, cal_act, _hx, _cx = provider(4)
    obs_f = quantize_to_uint8_grid(downsample_avg(obs_to_float(jnp.asarray(obs_u8)), F))
    cal_act = jnp.asarray(cal_act, jnp.int32)
    d_cal = engine.sampler.calibrate(d_vars, jax.random.PRNGKey(11), obs_f, cal_act)
    r_cal = rew_end.calibrate(r_vars, obs_f[:, -2:-1], cal_act[:, -2:-1], obs_f[:, -1:])
    up_s = DiffusionSampler(up_model, engine.sampler.cfg)
    u_cal = up_s.calibrate(u_vars, jax.random.PRNGKey(12),
                           upsample_frame(obs_f[:, -1], F)[:, None], None)
    for v in (d_cal, r_cal, u_cal):
        assert "quant" in v and len(jax.tree_util.tree_leaves(v["quant"])) > 0

    env = WorldModelEnv(engine, lambda: d_cal, lambda: r_cal, provider, num_envs=2,
                        upsampler=up_model, u_vars_getter=lambda: u_cal)
    obs, _ = env.reset(seed=0)
    for t in range(2):
        obs, rew, end, trunc, info = env.step(np.array([t % NA, (t + 1) % NA]))
        assert obs.shape == (2, HIGH, HIGH, 3) and obs.dtype == np.uint8
        assert np.isfinite(np.asarray(rew)).all()
        assert info["low_res_obs"].shape == (2, LOW, LOW, 3)


@pytest.mark.slow
def test_upsampler_learns_super_resolution():
    """Capability: a briefly-trained upsampler reduces its denoising loss by a large factor
    on a fixed distribution of block images (learning signal is real, not just finite)."""
    from diamond_tpu.data import DeviceBatch
    from diamond_tpu.models import configure_opt
    from diamond_tpu.training import TrainState, make_upsampler_train_step

    up = make_upsampler(factor=2)
    v = up.init(jax.random.PRNGKey(0), img_size=8)
    tx = configure_opt(3e-3, 0.0, 1e-8, 1.0, 0)
    step = make_upsampler_train_step(up, tx, SIGMA_CFG)
    state = TrainState.create(v["params"], tx)

    rng = np.random.default_rng(0)

    def batch():
        # 4x4-block-constant images upsampled to 8x8 (structured, learnable content)
        blocks = rng.integers(0, 255, (8, 2, 4, 4, 3), dtype=np.uint8)
        obs = np.kron(blocks.transpose(0, 1, 4, 2, 3),
                      np.ones((2, 2), np.uint8)).transpose(0, 1, 3, 4, 2)
        return jax.tree_util.tree_map(jnp.asarray, DeviceBatch(
            obs=obs, act=np.zeros((8, 2), np.int32), rew=np.zeros((8, 2), np.float32),
            end=np.zeros((8, 2), np.int32), trunc=np.zeros((8, 2), np.int32),
            mask_padding=np.ones((8, 2), bool),
            final_obs=np.zeros((8, 8, 8, 3), np.uint8),
            has_final_obs=np.zeros(8, bool)))

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(120):
        key, k = jax.random.split(key)
        state, metrics = step(state, v.get("constants", {}), batch(), k)
        losses.append(float(metrics["loss_denoising"]))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early / 3, (early, late)
