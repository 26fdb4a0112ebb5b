"""Stateful WorldModelEnv (play path): reset/step contract, horizon, death refills."""

import numpy as np
import jax
import jax.numpy as jnp

from diamond_tpu.envs.wm_env_stateful import WorldModelEnv
from diamond_tpu.envs.world_model_env import (ImaginationEngine, WorldModelEnvConfig,
                                              make_ic_preparer)
from diamond_tpu.models import (ActorCritic, ActorCriticConfig, Denoiser, DenoiserConfig,
                                DiffusionSamplerConfig, InnerModelConfig, RewEndModel,
                                RewEndModelConfig)

IMG, C, NC, NA, D = 16, 3, 4, 3, 32


def build():
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
    return (denoiser, denoiser.init(k1, img_size=IMG), rew_end, rew_end.init(k2), ac,
            ac.init(k3))


def test_stateful_wm_env_contract():
    denoiser, d_vars, rew_end, r_vars, ac, ac_vars = build()
    engine = ImaginationEngine(denoiser, rew_end, ac, WorldModelEnvConfig(
        horizon=4, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2)))

    rng = np.random.default_rng(0)
    prepare = make_ic_preparer(rew_end)
    calls = {"n": 0}

    def provider(n):
        calls["n"] += n
        obs = rng.integers(0, 255, (n, NC, IMG, IMG, C), dtype=np.uint8)
        act = rng.integers(0, NA, (n, NC)).astype(np.int32)
        hx, cx = prepare(r_vars, jnp.asarray(obs), jnp.asarray(act))
        return obs, act, np.asarray(hx), np.asarray(cx)

    env = WorldModelEnv(engine, lambda: d_vars, lambda: r_vars, provider, num_envs=2,
                        seed=1, return_denoising_trajectory=True)
    obs, _ = env.reset()
    assert obs.shape == (2, IMG, IMG, C) and obs.dtype == np.uint8
    assert calls["n"] == 2

    deaths = 0
    for t in range(8):
        obs, rew, end, trunc, info = env.step(np.zeros(2, np.int64))
        assert obs.shape == (2, IMG, IMG, C) and obs.dtype == np.uint8
        assert info["denoising_trajectory"].shape[0] == 2
        assert info["denoising_trajectory"].shape[1] == 3  # init + 2 denoise steps
        dead = end | trunc
        if dead.any():
            deaths += int(dead.sum())
            assert info["final_observation"].shape == (int(dead.sum()), IMG, IMG, C)
            assert info["burnin_obs"].shape == (int(dead.sum()), NC - 1, IMG, IMG, C)
    # with horizon 4 every env must have died at least once in 8 steps
    assert deaths >= 2
    assert calls["n"] == 2 + deaths  # exactly one IC per death
