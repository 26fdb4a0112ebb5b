"""A/B the conv lowerings (DIAMOND_TPU_CONV) and Pallas fused norms (DIAMOND_TPU_PALLAS)
on the real imagination rollout (VERDICT round-2 perf item).

One process: the switches are read at trace time (module attributes), so each variant
rebuilds the flax modules and jits fresh. Value-forced two-rep timing like bench.py.

Usage: python scripts/bench_variants.py [--modes xla,paired,im2col,s2d] [--pallas 0,1]
       [--scan 15] [--iters 8] [--unet-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(conv_mode: str, use_pallas: bool):
    from diamond_tpu.ops import conv_lowering
    import diamond_tpu.ops as ops

    conv_lowering.CONV_MODE = conv_mode
    ops.USE_PALLAS = use_pallas

    from diamond_tpu.config import load_config
    from diamond_tpu.envs.world_model_env import (ICPool, ImaginationEngine,
                                                  WorldModelEnvConfig, make_ic_preparer)
    from diamond_tpu.models import Agent, AgentConfig

    cfg = load_config("trainer")
    agent = Agent(AgentConfig.from_cfg(cfg.agent, 4), compute_dtype=jnp.bfloat16)
    agent.init(jax.random.PRNGKey(0), img_size=cfg.env.train.size)
    wm_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
    engine = ImaginationEngine(agent.denoiser, agent.rew_end_model, agent.actor_critic,
                               wm_cfg)
    return cfg, agent, engine, make_ic_preparer


def timeit(fn, arg, iters, scan_len):
    out = fn(arg)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best / scan_len


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="xla,paired,im2col,s2d")
    p.add_argument("--pallas", default="0")
    p.add_argument("--scan", type=int, default=15)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--unet-only", action="store_true",
                   help="time a scanned single denoise instead of the full rollout")
    args = p.parse_args()
    BATCH = 32

    for pallas in [x == "1" for x in args.pallas.split(",")]:
        for mode in args.modes.split(","):
            cfg, agent, engine, make_ic_preparer = build(mode, pallas)
            size = cfg.env.train.size
            n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
            rng = np.random.default_rng(0)

            if args.unet_only:
                d_vars = agent.variables["denoiser"]
                obs_flat = jnp.asarray(rng.uniform(-1, 1, (BATCH, size, size, n_cond * 3))
                                       .astype(np.float32))
                act = jnp.asarray(rng.integers(0, 4, (BATCH, n_cond)).astype(np.int32))
                x0 = jnp.asarray(rng.normal(size=(BATCH, size, size, 3)).astype(np.float32))

                @jax.jit
                def f(x):
                    def body(x, _):
                        return engine.denoiser.denoise(d_vars, x, 1.3, obs_flat, act), None
                    y, _ = jax.lax.scan(body, x, None, length=args.scan)
                    return y

                per = timeit(f, x0, args.iters, args.scan)
                print(f"conv={mode:7s} pallas={int(pallas)}  denoise x1: "
                      f"{per * 1e3:7.3f} ms", flush=True)
            else:
                pool_n = 1024
                obs_u8 = rng.integers(0, 255, (pool_n, n_cond, size, size, 3),
                                      dtype=np.uint8)
                act = rng.integers(0, 4, (pool_n, n_cond)).astype(np.int32)
                hx, cx = make_ic_preparer(agent.rew_end_model)(
                    agent.variables["rew_end_model"], jnp.asarray(obs_u8), jnp.asarray(act))
                pool = ICPool_like(engine, obs_u8, act, hx, cx)
                st0, pool = engine.initial_state(pool, BATCH)
                rollout = jax.jit(engine.rollout, static_argnums=(6,))
                ac_vars = agent.variables["actor_critic"]
                d_vars = agent.variables["denoiser"]
                r_vars = agent.variables["rew_end_model"]

                def f(key):
                    traj, st, pl = rollout(ac_vars, d_vars, r_vars, st0, pool, key,
                                           args.scan)
                    return traj["rew"]

                per = timeit(f, jax.random.PRNGKey(1), args.iters, args.scan)
                fps = BATCH / per
                print(f"conv={mode:7s} pallas={int(pallas)}  FULL rollout: "
                      f"{per * 1e3:7.3f} ms/step = {fps:7.0f} fps", flush=True)


def ICPool_like(engine, obs_u8, act, hx, cx):
    from diamond_tpu.envs.world_model_env import ICPool

    return ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                  ptr=jnp.asarray(0, jnp.int32))


if __name__ == "__main__":
    main()
