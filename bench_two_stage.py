"""Two-stage (csgo-branch) interactive play-FPS benchmark (VERDICT round-3 item #5).

Measures the PRODUCTION play path of the two-stage world model — the stateful
``WorldModelEnv.step`` at batch 1 with an upsampler (envs/wm_env_stateful.py): per
displayed frame, one low-res dynamics EDM sample (n=3 denoises) + reward/end LSTM step +
masked resets, then the upsampler's full-resolution EDM sampling loop, INCLUDING the
host<->device conversions the play app performs (this is interactive latency, not a pure
device-throughput number — compare bench.py for the training-rollout metric).

Target: the reference play app runs at 15 fps (reference src/play.py:36 ``--fps`` default;
the csgo branch's README advertises human-playable frame rates). Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} with vs_baseline = fps / 15.

Flags (mirror bench.py): DIAMOND_TPU_INT8=0|1 overrides config tpu.int8_rollout;
DIAMOND_TPU_INT8_SITES selects quantized site kinds.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diamond_tpu.config import load_config
from diamond_tpu.envs.world_model_env import ImaginationEngine, WorldModelEnvConfig
from diamond_tpu.envs.wm_env_stateful import WorldModelEnv
from diamond_tpu.models import Agent, AgentConfig
from diamond_tpu.utils import enable_compilation_cache

TARGET_FPS = 15.0  # reference src/play.py:36
NUM_ACTIONS = 4
STEPS = int(os.environ.get("DIAMOND_TPU_BENCH2_STEPS", "60"))
# SMOKE=1: tiny agent for CI/CPU plumbing checks (the fps number is then meaningless)
SMOKE = os.environ.get("DIAMOND_TPU_BENCH2_SMOKE") == "1"

WATCHDOG_S = int(os.environ.get("DIAMOND_TPU_BENCH_WATCHDOG_S", "900"))
_stage = "startup"


def _note(stage: str) -> None:
    global _stage
    _stage = stage
    print(f"[bench2] {time.strftime('%H:%M:%S')} {stage}", file=sys.stderr, flush=True)


def _watchdog(signum, frame):  # noqa: ARG001
    print(json.dumps({
        "metric": "two_stage_play_fps_batch1",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "error": "platform_hang",
        "stage": _stage,
        "watchdog_s": WATCHDOG_S,
    }), flush=True)
    os._exit(75)


def main() -> None:
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_S)
    cache = enable_compilation_cache()
    _note(f"compile_cache dir={cache or 'off'}")
    _note("load_config")
    overrides = ["agent=csgo", "env=fake"]
    if SMOKE:
        overrides += [
            "env.train.size=16",
            "agent.denoiser.inner_model.depths=[1,1]",
            "agent.denoiser.inner_model.channels=[8,8]",
            "agent.denoiser.inner_model.attn_depths=[0,0]",
            "agent.denoiser.inner_model.cond_channels=16",
            "agent.upsampler.inner_model.depths=[1,1]",
            "agent.upsampler.inner_model.channels=[8,8]",
            "agent.upsampler.inner_model.attn_depths=[0,0]",
            "agent.upsampler.inner_model.cond_channels=16",
            "agent.rew_end_model.depths=[1]",
            "agent.rew_end_model.channels=[8]",
            "agent.rew_end_model.attn_depths=[0]",
            "agent.rew_end_model.lstm_dim=16",
            "agent.rew_end_model.cond_channels=16",
        ]
    cfg = load_config("trainer", overrides=overrides)
    agent_cfg = AgentConfig.from_cfg(cfg.agent, NUM_ACTIONS)
    agent = Agent(agent_cfg, compute_dtype=jnp.bfloat16)
    size = int(cfg.env.train.size)
    factor = int(cfg.agent.upsampler.upsampling_factor)
    _note(f"agent.init size={size} dynamics={size // factor}")
    agent.init(jax.random.PRNGKey(0), img_size=size)

    wm_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
    engine = ImaginationEngine(agent.denoiser, agent.rew_end_model, agent.actor_critic,
                               wm_cfg)

    # synthetic IC provider at dataset (full) resolution, exactly what play.py feeds
    rng = np.random.default_rng(0)
    n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
    lstm_d = cfg.agent.rew_end_model.lstm_dim

    def provider(n: int):
        obs = rng.integers(0, 255, (n, n_cond, size, size, 3), dtype=np.uint8)
        act = rng.integers(0, NUM_ACTIONS, (n, n_cond)).astype(np.int32)
        hx = rng.normal(size=(n, lstm_d)).astype(np.float32) * 0.1
        cx = rng.normal(size=(n, lstm_d)).astype(np.float32) * 0.1
        return obs, act, hx, cx

    from diamond_tpu.utils import env_flag

    use_int8 = env_flag("DIAMOND_TPU_INT8", cfg.tpu.int8_rollout)
    if use_int8:
        sites = os.environ.get("DIAMOND_TPU_INT8_SITES",
                               cfg.tpu.get("int8_sites", "all"))
        _note(f"int8_calibration sites={sites}")
        from diamond_tpu.data.episode import obs_to_float
        from diamond_tpu.models.denoiser import (downsample_avg, quantize_to_uint8_grid,
                                                 upsample_frame)
        from diamond_tpu.models.diffusion_sampler import DiffusionSampler

        obs_u8, cal_act, _hx, _cx = provider(8)
        obs_f = quantize_to_uint8_grid(
            downsample_avg(obs_to_float(jnp.asarray(obs_u8)), factor))
        cal_act = jnp.asarray(cal_act, jnp.int32)
        agent.variables["denoiser"] = engine.sampler.calibrate(
            agent.variables["denoiser"], jax.random.PRNGKey(11), obs_f, cal_act,
            sites=sites)
        agent.variables["rew_end_model"] = agent.rew_end_model.calibrate(
            agent.variables["rew_end_model"], obs_f[:, -2:-1], cal_act[:, -2:-1],
            obs_f[:, -1:], sites=sites)
        up_s = DiffusionSampler(agent.upsampler, engine.sampler.cfg)
        cond = upsample_frame(obs_f[:, -1], factor)
        agent.variables["upsampler"] = up_s.calibrate(
            agent.variables["upsampler"], jax.random.PRNGKey(12), cond[:, None], None,
            sites=sites)

    wm_env = WorldModelEnv(
        engine, lambda: agent.variables["denoiser"],
        lambda: agent.variables["rew_end_model"], provider, num_envs=1,
        upsampler=agent.upsampler, u_vars_getter=lambda: agent.variables["upsampler"],
        upsampler_sampler_cfg=engine.sampler.cfg)

    _note("reset_and_compile")
    wm_env.reset(seed=0)
    for i in range(3):  # warmup: covers both the step and the upsample jits
        wm_env.step(np.asarray([i % NUM_ACTIONS]))

    _note("timing")
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            obs, rew, end, trunc, info = wm_env.step(np.asarray([i % NUM_ACTIONS]))
        # outputs are numpy already (host-materialized every step — play semantics)
        assert obs.dtype == np.uint8 and obs.shape[-3] == size
        best = min(best, time.perf_counter() - t0)

    fps = STEPS / best
    print(json.dumps({
        "metric": "two_stage_play_fps_batch1",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
