"""Play-app stack smoke tests: EnvLoop over the stateful world-model env (exercising the
policy burn-in branch, reference env_loop.py:53-56), and the pygame Game loop headless."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diamond_tpu.coroutines.env_loop import EnvLoop
from diamond_tpu.envs.wm_env_stateful import WorldModelEnv
from diamond_tpu.envs.world_model_env import (ImaginationEngine, WorldModelEnvConfig,
                                              make_ic_preparer)
from diamond_tpu.models import (ActorCritic, ActorCriticConfig, Denoiser, DenoiserConfig,
                                DiffusionSamplerConfig, InnerModelConfig, RewEndModel,
                                RewEndModelConfig)

IMG, C, NC, NA, D = 16, 3, 4, 3, 32


@pytest.fixture(scope="module")
def stack():
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
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    d_vars, r_vars, ac_vars = (denoiser.init(k1, img_size=IMG), rew_end.init(k2),
                               ac.init(k3))
    engine = ImaginationEngine(denoiser, rew_end, ac, WorldModelEnvConfig(
        horizon=3, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2)))
    rng = np.random.default_rng(0)
    prepare = make_ic_preparer(rew_end)

    def provider(n):
        obs = rng.integers(0, 255, (n, NC, IMG, IMG, C), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        hx, cx = prepare(r_vars, jnp.asarray(obs), jnp.asarray(act))
        return obs, act, np.asarray(hx), np.asarray(cx)

    wm_env = WorldModelEnv(engine, lambda: d_vars, lambda: r_vars, provider, num_envs=2,
                           seed=4)
    return engine, ac, ac_vars, wm_env


def test_env_loop_over_world_model_env(stack):
    """The reference trains its AC by running env_loop over the WorldModelEnv; our training
    uses the fused scan, but the host loop must still drive the WM env correctly (play /
    debugging parity), including LSTM burn-in on WM resets."""
    engine, ac, ac_vars, wm_env = stack
    loop = EnvLoop(wm_env, ac, lambda: ac_vars, seed=0)
    obs, act, rew, end, trunc, logits, val, val_boot, infos = loop.send(7)
    assert obs.shape == (2, 7, IMG, IMG, C)
    assert (np.clip(end + trunc, None, 1).sum(axis=1) >= 1).all()  # horizon 3 forces deaths
    assert any("burnin_obs" in i for i in infos)
    assert np.isfinite(val_boot).all()


def test_game_loop_headless(stack, tmp_path, monkeypatch):
    pygame = pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    monkeypatch.chdir(tmp_path)

    engine, ac, ac_vars, wm_env = stack

    class AgentStub:
        actor_critic = ac
        variables = {"actor_critic": ac_vars}

    from diamond_tpu.envs import FakeEnv
    from diamond_tpu.game.game import Game
    from diamond_tpu.game.play_env import NamedEnv, PlayEnv

    fake = FakeEnv(num_envs=1, size=IMG, max_episode_steps=10)
    play_env = PlayEnv(AgentStub(), [NamedEnv("real", fake)], keymap_name="fake", fps=30,
                       record_mode=True, record_dir=tmp_path / "dataset")
    game = Game(play_env, size=(64, 64), fps=1000)
    game.run(max_steps=25)
    # recording wrote at least one episode on death (max_episode_steps=10 < 25 steps)
    rec = list((tmp_path / "dataset").glob("rec_*"))
    assert rec, "recording mode must have produced a dataset"


def test_game_loop_headless_world_model(stack, tmp_path, monkeypatch):
    pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    engine, ac, ac_vars, wm_env = stack

    class AgentStub:
        actor_critic = ac
        variables = {"actor_critic": ac_vars}

    from diamond_tpu.game.game import Game
    from diamond_tpu.game.play_env import NamedEnv, PlayEnv

    play_env = PlayEnv(AgentStub(), [NamedEnv("world_model", _batch1_wm(stack))],
                       keymap_name="fake", fps=30)
    play_env.human = False  # policy control path
    Game(play_env, size=(64, 64), fps=1000).run(max_steps=8)


def _batch1_wm(stack):
    engine, ac, ac_vars, _ = stack
    rng = np.random.default_rng(1)
    prepare = make_ic_preparer(engine.rew_end_model)
    r_vars_holder = {}

    # rebuild tiny vars for batch-1 env reusing engine models
    k2 = jax.random.PRNGKey(9)
    r_vars = engine.rew_end_model.init(k2)
    d_vars = engine.denoiser.init(jax.random.PRNGKey(10), img_size=IMG)

    def provider(n):
        obs = rng.integers(0, 255, (n, NC, IMG, IMG, C), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        hx, cx = prepare(r_vars, jnp.asarray(obs), jnp.asarray(act))
        return obs, act, np.asarray(hx), np.asarray(cx)

    return WorldModelEnv(engine, lambda: d_vars, lambda: r_vars, provider, num_envs=1,
                         seed=5)


def test_wm_env_int8_play_path(stack):
    """play --int8: calibrated variables carried by the stateful WM env's getters flip
    the sampler + rew/end rollout to the int8 path (structural gate, ops/quant.py);
    stepping stays finite and on the uint8 display grid."""
    from diamond_tpu.data.episode import obs_to_float

    engine, ac, ac_vars, _ = stack
    rng = np.random.default_rng(2)
    prepare = make_ic_preparer(engine.rew_end_model)
    r_vars = engine.rew_end_model.init(jax.random.PRNGKey(20))
    d_vars = engine.denoiser.init(jax.random.PRNGKey(21), img_size=IMG)

    def provider(n):
        obs = rng.integers(0, 255, (n, NC, IMG, IMG, C), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        hx, cx = prepare(r_vars, jnp.asarray(obs), jnp.asarray(act))
        return obs, act, np.asarray(hx), np.asarray(cx)

    # the play.py --int8 startup sequence
    obs_u8, cal_act, _hx, _cx = provider(4)
    obs_f = obs_to_float(jnp.asarray(obs_u8))
    cal_act = jnp.asarray(cal_act, jnp.int32)
    d_cal = engine.sampler.calibrate(d_vars, jax.random.PRNGKey(11), obs_f, cal_act)
    r_cal = engine.rew_end_model.calibrate(r_vars, obs_f[:, -2:-1], cal_act[:, -2:-1],
                                           obs_f[:, -1:])
    assert "quant" in d_cal and "quant" in r_cal

    env = WorldModelEnv(engine, lambda: d_cal, lambda: r_cal, provider, num_envs=1, seed=6)
    obs, _ = env.reset()
    for _ in range(3):
        obs, rew, end, trunc, info = env.step(np.zeros(1, np.int32))
    assert obs.dtype == np.uint8 and obs.shape == (1, IMG, IMG, C)
    assert np.isfinite(np.asarray(rew)).all()


def test_game_loop_headless_two_stage(tmp_path, monkeypatch):
    """Two-stage play: low-res dynamics + upsampled display, policy control downsamples
    its input to the dynamics resolution (game/play_env.py)."""
    pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")

    LOW, HIGH, F = 8, 16, 2
    low = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=2,
                                     cond_channels=8, depths=[1], channels=[8],
                                     attn_depths=[0], num_actions=NA),
        sigma_data=0.5, sigma_offset_noise=0.3))
    up = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=C, num_steps_conditioning=1,
                                     cond_channels=8, depths=[1], channels=[8],
                                     attn_depths=[0]),
        sigma_data=0.5, sigma_offset_noise=0.3, upsampling_factor=F))
    rew_end = RewEndModel(RewEndModelConfig(lstm_dim=D, img_channels=C, img_size=LOW,
                                            cond_channels=8, depths=[1], channels=[8],
                                            attn_depths=[0], num_actions=NA))
    ac = ActorCritic(ActorCriticConfig(lstm_dim=D, img_channels=C, img_size=LOW,
                                       channels=[8], down=[1], num_actions=NA))
    k = jax.random.PRNGKey(0)
    d_vars = low.init(k, img_size=LOW)
    u_vars = up.init(k, img_size=HIGH)
    r_vars = rew_end.init(jax.random.PRNGKey(1))
    ac_vars = ac.init(jax.random.PRNGKey(2))
    engine = ImaginationEngine(low, rew_end, ac, WorldModelEnvConfig(
        horizon=3, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=1)))
    rng = np.random.default_rng(0)

    def provider(n):
        obs = rng.integers(0, 255, (n, 2, HIGH, HIGH, C), dtype=np.uint8)
        act = rng.integers(0, NA, (n, 2)).astype(np.int32)
        return obs, act, np.zeros((n, D), np.float32), np.zeros((n, D), np.float32)

    wm = WorldModelEnv(engine, lambda: d_vars, lambda: r_vars, provider, num_envs=1,
                       upsampler=up, u_vars_getter=lambda: u_vars)

    class StubCfgUp:
        upsampling_factor = F

    class StubCfg:
        upsampler = StubCfgUp()

    class AgentStub:
        actor_critic = ac
        upsampler = up
        cfg = StubCfg()
        variables = {"actor_critic": ac_vars, "upsampler": u_vars}

    from diamond_tpu.game.game import Game
    from diamond_tpu.game.play_env import NamedEnv, PlayEnv

    play_env = PlayEnv(AgentStub(), [NamedEnv("world_model", wm)], keymap_name="fake",
                       fps=30)
    play_env.human = False  # the policy must act on the DOWNSAMPLED frames
    Game(play_env, size=(64, 64), fps=1000).run(max_steps=6)
