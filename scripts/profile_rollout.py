"""Profile breakdown of the imagination hot loop (VERDICT round-1 item 2a).

Times each component of the fused rollout step (SURVEY.md section 3.4: per env-step
3 denoiser U-Net forwards + reward/end LSTM step + policy steps + reset glue) as a
scan-of-component inside one jit, so dispatch overhead amortizes identically to the real
rollout. Value-forced timing (block_until_ready does not wait on the tunneled platform).

Usage: python scripts/profile_rollout.py [--iters 10] [--scan 15]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diamond_tpu.config import load_config
from diamond_tpu.envs.world_model_env import (ICPool, ImaginationEngine, WorldModelEnvConfig,
                                              make_ic_preparer)
from diamond_tpu.models import Agent, AgentConfig

BATCH = 32
NUM_ACTIONS = 4


def timeit(name, fn, *args, iters=10, scan_len=15):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # warmup + compile
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    per_step = best / scan_len * 1e3
    print(f"{name:42s} {per_step:8.3f} ms/step   ({best * 1e3:8.2f} ms per {scan_len}-scan)")
    return per_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--scan", type=int, default=15)
    args = p.parse_args()
    T = args.scan

    cfg = load_config("trainer")
    agent_cfg = AgentConfig.from_cfg(cfg.agent, NUM_ACTIONS)
    agent = Agent(agent_cfg, compute_dtype=jnp.bfloat16)
    agent.init(jax.random.PRNGKey(0), img_size=cfg.env.train.size)

    wm_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
    engine = ImaginationEngine(agent.denoiser, agent.rew_end_model, agent.actor_critic, wm_cfg)

    rng = np.random.default_rng(0)
    n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
    size = cfg.env.train.size
    pool_n = 1024
    obs_u8 = rng.integers(0, 255, (pool_n, n_cond, size, size, 3), dtype=np.uint8)
    act = rng.integers(0, NUM_ACTIONS, (pool_n, n_cond)).astype(np.int32)
    hx, cx = make_ic_preparer(agent.rew_end_model)(
        agent.variables["rew_end_model"], jnp.asarray(obs_u8), jnp.asarray(act))
    pool = ICPool(obs=jnp.asarray(obs_u8), act=jnp.asarray(act), hx=hx, cx=cx,
                  ptr=jnp.asarray(0, jnp.int32))
    st0, pool = engine.initial_state(pool, BATCH)

    ac_vars = agent.variables["actor_critic"]
    d_vars = agent.variables["denoiser"]
    r_vars = agent.variables["rew_end_model"]
    ac = agent.actor_critic
    rew_end = agent.rew_end_model
    sampler = engine.sampler

    from diamond_tpu.data.episode import obs_to_float

    obs_stack = obs_to_float(st0.obs_buffer)  # ImagState buffers are uint8; models take f32
    obs_frame = obs_stack[:, -1]
    act_buf = st0.act_buffer

    # 1) full rollout (the bench.py measurement)
    rollout = jax.jit(engine.rollout, static_argnums=(6,))
    def full(key):
        traj, st, pl = rollout(ac_vars, d_vars, r_vars, st0, pool, key, T)
        return traj["rew"]
    timeit("FULL rollout step", full, jax.random.PRNGKey(1), iters=args.iters, scan_len=T)

    # 2) sampler only (3 denoises + glue), scanned T times feeding output back
    @jax.jit
    def sampler_scan(key):
        def body(x, k):
            ob = jnp.concatenate([obs_stack[:, 1:], x[:, None]], axis=1)
            y, _ = sampler.sample(d_vars, k, ob, act_buf)
            return y, None
        x, _ = jax.lax.scan(body, obs_frame, jax.random.split(key, T))
        return x
    timeit("sampler.sample (3 denoise)", sampler_scan, jax.random.PRNGKey(2),
           iters=args.iters, scan_len=T)

    # 3) single denoise, scanned
    obs_flat = jnp.moveaxis(obs_stack, 1, 3).reshape(BATCH, size, size, n_cond * 3)
    @jax.jit
    def denoise_scan(key):
        def body(x, _):
            return engine.denoiser.denoise(d_vars, x, 1.3, obs_flat, act_buf), None
        x, _ = jax.lax.scan(body, obs_frame, None, length=T)
        return x
    timeit("denoiser.denoise x1", denoise_scan, jax.random.PRNGKey(3),
           iters=args.iters, scan_len=T)

    # 4) inner model (U-Net) forward only, scanned
    @jax.jit
    def inner_scan(key):
        def body(x, _):
            y = engine.denoiser.inner_model.apply(
                d_vars, x, jnp.full((BATCH,), 0.3), obs_flat, act_buf)
            return y, None
        x, _ = jax.lax.scan(body, obs_frame, None, length=T)
        return x
    timeit("U-Net fwd x1", inner_scan, jax.random.PRNGKey(4), iters=args.iters, scan_len=T)

    # 5) rew/end single step, scanned
    @jax.jit
    def rewend_scan(key):
        def body(carry, _):
            h, c = carry
            lr, le, (h, c) = rew_end.predict_rew_end(
                r_vars, obs_stack[:, -1:], act_buf[:, -1:], obs_stack[:, :1], (h, c))
            return (h, c), lr
        carry, lr = jax.lax.scan(body, (st0.re_hx, st0.re_cx), None, length=T)
        return lr
    timeit("rew_end step x1", rewend_scan, jax.random.PRNGKey(5),
           iters=args.iters, scan_len=T)

    # 6) policy single step, scanned
    @jax.jit
    def ac_scan(key):
        def body(carry, _):
            out = ac.predict_act_value(ac_vars, obs_frame, carry)
            return out.carry, out.val
        carry, v = jax.lax.scan(body, (st0.ac_hx, st0.ac_cx), None, length=T)
        return v
    t_ac = timeit("policy step x1", ac_scan, jax.random.PRNGKey(6),
                  iters=args.iters, scan_len=T)

    # 7) policy: the full per-step policy work in the rollout (1 main + 1 val_final +
    #    n_cond-1 burn-in = 5 applications)
    @jax.jit
    def ac5_scan(key):
        def body(carry, _):
            out = ac.predict_act_value(ac_vars, obs_frame, carry)
            v2 = ac.predict_act_value(ac_vars, obs_frame, out.carry).val
            def burn(c, o):
                return ac.predict_act_value(ac_vars, o, c).carry, None
            zeros = (jnp.zeros_like(st0.ac_hx), jnp.zeros_like(st0.ac_cx))
            (bh, bc), _ = jax.lax.scan(burn, zeros,
                                       jnp.moveaxis(obs_stack[:, :-1], 0, 1))
            return out.carry, (out.val + v2 + bh.sum())
        carry, v = jax.lax.scan(body, (st0.ac_hx, st0.ac_cx), None, length=T)
        return v
    timeit("policy work x5 (main+valfinal+burnin)", ac5_scan, jax.random.PRNGKey(7),
           iters=args.iters, scan_len=T)

    # 8) reset glue: gather from pool + where-swaps, scanned
    @jax.jit
    def reset_scan(key):
        def body(carry, k):
            st, pl = carry
            dead = jax.random.bernoulli(k, 0.1, (BATCH,))
            st, pl = engine._reset_dead(st, pl, dead)
            return (st, pl), st.ep_len
        (st, pl), e = jax.lax.scan(body, (st0, pool), jax.random.split(key, T))
        return e
    timeit("reset glue (gather+where)", reset_scan, jax.random.PRNGKey(8),
           iters=args.iters, scan_len=T)

    # 9) single conv3x3 64ch at 64x64 b32 bf16 (MXU envelope reference point)
    k = jax.random.PRNGKey(9)
    xconv = jax.random.normal(k, (BATCH, size, size, 64), jnp.bfloat16)
    wconv = jax.random.normal(k, (3, 3, 64, 64), jnp.bfloat16)
    @jax.jit
    def conv_scan(x):
        def body(x, _):
            y = jax.lax.conv_general_dilated(x, wconv, (1, 1), "SAME",
                                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y, None
        x, _ = jax.lax.scan(body, x, None, length=T)
        return x
    t_conv = timeit("conv3x3 64->64 @64^2 b32 bf16", conv_scan, xconv,
                    iters=args.iters, scan_len=T)
    flops = 2 * BATCH * size * size * 9 * 64 * 64
    print(f"  -> conv TFLOP/s: {flops / (t_conv * 1e-3) / 1e12:.1f}")


if __name__ == "__main__":
    main()
