"""Imagination-FPS benchmark (the driver's north-star metric, BASELINE.md).

Measures the reference's hot loop (SURVEY.md section 3.4) — the WorldModelEnv step:
per env-step, 3 denoiser U-Net forwards (Euler sampler, n=3), one reward/end LSTM step and
one policy step, at batch 32 on the *default full-size* agent (denoiser channels [64,64,64,64]
depths [2,2,2,2] at 64x64 RGB) — fused here into a single lax.scan rollout
(diamond_tpu/envs/world_model_env.py), bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against 5x an ESTIMATED A100 figure for the reference implementation
(the reference publishes no throughput numbers — BASELINE.md). Estimate: ~2.8e10 FLOPs per
env-step per sample (3 U-Net fwd ~9.2e9 each + reward/end encoder + policy), A100 TF32
effective throughput on 64-channel convs with torch.compile assumed ~40 TFLOP/s (25% of
156 TFLOP/s peak) -> ~1430 frames/s at batch 32. Target = 5x = 7150 frames/s;
vs_baseline = measured / target.
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
from diamond_tpu.envs.world_model_env import (ICPool, ImaginationEngine, WorldModelEnvConfig,
                                              make_ic_preparer)
from diamond_tpu.models import Agent, AgentConfig

A100_EST_FPS = 1430.0  # see module docstring for the derivation
TARGET_FPS = 5.0 * A100_EST_FPS

BATCH = 32
HORIZON = 15
NUM_ACTIONS = 4  # Breakout


WATCHDOG_S = int(os.environ.get("DIAMOND_TPU_BENCH_WATCHDOG_S", "900"))
_stage = "startup"


from diamond_tpu.utils import enable_compilation_cache
from diamond_tpu.utils import env_flag as _flag  # config-keyed, env-overridable options


def _note(stage: str) -> None:
    """Progress marker: names the stage the watchdog would blame for a stall."""
    global _stage
    _stage = stage
    print(f"[bench] {time.strftime('%H:%M:%S')} {stage}", file=sys.stderr, flush=True)


def _watchdog(signum, frame):  # noqa: ARG001
    """The tunneled platform sometimes wedges every client for tens of minutes
    (VALIDATION.md). Emit a diagnostic JSON record instead of hanging the harness."""
    print(json.dumps({
        "metric": "imagination_fps_batch32_n3",
        "value": 0.0,
        "unit": "env_frames/s",
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
    cfg = load_config("trainer")
    agent_cfg = AgentConfig.from_cfg(cfg.agent, NUM_ACTIONS)
    agent = Agent(agent_cfg, compute_dtype=jnp.bfloat16)
    _note("agent.init")
    agent.init(jax.random.PRNGKey(0), img_size=cfg.env.train.size)

    wm_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
    engine = ImaginationEngine(agent.denoiser, agent.rew_end_model, agent.actor_critic,
                               wm_cfg)

    # synthetic IC pool (shapes/dtypes identical to the real pipeline)
    rng = np.random.default_rng(0)
    n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
    size = cfg.env.train.size
    pool_n = 4096
    obs_u8 = rng.integers(0, 255, (pool_n, n_cond, size, size, 3), dtype=np.uint8)
    act = rng.integers(0, NUM_ACTIONS, (pool_n, n_cond)).astype(np.int32)
    _note("ic_pool_upload_and_burnin")
    hx, cx = make_ic_preparer(agent.rew_end_model)(
        agent.variables["rew_end_model"], jnp.asarray(obs_u8), jnp.asarray(act))
    pool = ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                  ptr=jnp.asarray(0, jnp.int32))
    ac_vars = agent.variables["actor_critic"]
    # Production inference options follow the shipped config (tpu.int8_rollout /
    # tpu.pool_policy_feats in configs/trainer.yaml) so the benched path IS the trainer's
    # path; DIAMOND_TPU_INT8/POOL_FEATS=0|1 env vars override for A/B measurement.
    use_pool_feats = _flag("DIAMOND_TPU_POOL_FEATS", cfg.tpu.pool_policy_feats)
    use_int8 = _flag("DIAMOND_TPU_INT8", cfg.tpu.int8_rollout)
    if use_pool_feats:
        # production option tpu.pool_policy_feats: precomputed policy features replace the
        # rollout's per-step batched context encode (envs/world_model_env.py ICPool.feats)
        _note("pool_feats_precompute")
        from diamond_tpu.envs.world_model_env import encode_pool_feats

        feats_chunk = jax.jit(lambda o: encode_pool_feats(agent.actor_critic, ac_vars, o))
        feats = jnp.concatenate([feats_chunk(pool.obs[i:i + 512])
                                 for i in range(0, pool_n, 512)])
        pool = pool.replace(feats=feats)
    st, pool = engine.initial_state(pool, BATCH)

    rollout = jax.jit(engine.rollout, static_argnums=(6,), donate_argnums=(3, 4))
    d_vars = agent.variables["denoiser"]
    r_vars = agent.variables["rew_end_model"]

    if use_int8:
        # static int8 rollout path: one jitted observe pass yields the "quant" collection
        # of per-site activation scales (models/diffusion_sampler.py calibrate). Carrying
        # that collection in the variables IS the enablement (structural gate, ops/quant.py).
        # DIAMOND_TPU_INT8_SITES selects site kinds for per-site A/B (default: config
        # tpu.int8_sites; e.g. "conv3x3" = the round-3 baseline, "conv3x3,conv1x1", "all").
        sites = os.environ.get("DIAMOND_TPU_INT8_SITES",
                               cfg.tpu.get("int8_sites", "all"))
        _note(f"int8_calibration sites={sites}")
        from diamond_tpu.data.episode import obs_to_float
        obs_f = obs_to_float(st.obs_buffer)
        d_vars = engine.sampler.calibrate(
            d_vars, jax.random.PRNGKey(3), obs_f, st.act_buffer, sites=sites)
        r_vars = agent.rew_end_model.calibrate(
            r_vars, obs_f[:, -2:-1], st.act_buffer[:, -2:-1], obs_f[:, -1:], sites=sites)

    # Optional XLA:TPU backend options for the hot jit, e.g.
    #   DIAMOND_TPU_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536"
    # On this tunneled platform client-side XLA_FLAGS cannot carry TPU backend flags
    # (the client XLA is CPU-built and rejects them); PJRT compiler_options are forwarded
    # to and validated by the server-side compiler, so AOT lower/compile is the only route.
    xla_opts = os.environ.get("DIAMOND_TPU_XLA_OPTS", "")
    if xla_opts:
        opts = {}
        for kv in xla_opts.split(","):
            if not kv.strip():
                continue
            if "=" not in kv:
                raise SystemExit(
                    f"DIAMOND_TPU_XLA_OPTS entry {kv!r} is not of the form key=value")
            k, v = kv.split("=", 1)
            opts[k.strip()] = v.strip()
        _note(f"rollout_aot_compile {opts}")
        rollout = rollout.lower(ac_vars, d_vars, r_vars, st, pool,
                                jax.random.PRNGKey(1), HORIZON).compile(
                                    compiler_options=opts)

        def run(key, st, pool):
            traj, st, pool = rollout(ac_vars, d_vars, r_vars, st, pool, key)
            return traj["rew"], st, pool
    else:
        def run(key, st, pool):
            traj, st, pool = rollout(ac_vars, d_vars, r_vars, st, pool, key, HORIZON)
            return traj["rew"], st, pool

    # warmup / compile (value-forced: block_until_ready is unreliable on tunneled
    # platforms, so timings always materialize a value derived from the results)
    _note("rollout_compile")
    out, st, pool = run(jax.random.PRNGKey(1), st, pool)
    _ = float(out.sum())

    _note("timing")
    best = float("inf")
    iters = 10
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out, st, pool = run(jax.random.PRNGKey(2 + rep * iters + i), st, pool)
        _ = float(out.sum()) + float(st.ep_len.sum())
        best = min(best, time.perf_counter() - t0)

    fps = BATCH * HORIZON * iters / best
    print(json.dumps({
        "metric": "imagination_fps_batch32_n3",
        "value": round(fps, 1),
        "unit": "env_frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
