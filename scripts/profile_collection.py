"""Collection-step cost decomposition on the live device (VERDICT round-4 #5).

After the round-4 need_values fix, collection still cost ~60-80 ms/env-step. This
script separates, at full agent size on the fake env:

  a) full EnvLoop.send(1) loop                      (what the collector pays)
  b) the policy_step dispatch + action fetch alone   (device round trips)
  c) the same dispatch with EVERY argument pre-staged on device (lower bound:
     one H2D obs upload eliminated, scalar literals eliminated)
  d) env.step host work alone                        (numpy fake-env dynamics)

Prints one JSON line with ms/step for each. Run on the real TPU; CPU runs work but
measure nothing interesting.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from diamond_tpu.config import load_config
from diamond_tpu.coroutines import EnvLoop
from diamond_tpu.envs import FakeEnv
from diamond_tpu.models import Agent, AgentConfig
from diamond_tpu.utils import enable_compilation_cache

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def timed(label, fn, n=STEPS, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[profile_collection] {label}: {ms:.2f} ms/step", file=sys.stderr, flush=True)
    return ms


def main() -> None:
    enable_compilation_cache()
    cfg = load_config("trainer", overrides=["env=fake"])
    env = FakeEnv(NUM_ENVS, size=64, max_episode_steps=100)
    agent = Agent(AgentConfig.from_cfg(cfg.agent, env.num_actions))
    agent.init(jax.random.PRNGKey(0), img_size=64)
    variables = agent.variables["actor_critic"]

    loop = EnvLoop(env, agent.actor_critic, lambda: variables, epsilon=0.01, seed=0)
    loop.reset()

    # a) the full collection step
    a = timed("full send(1, need_values=False)",
              lambda: loop.send(1, need_values=False))

    # b) policy dispatch + action fetch, host-obs upload each call (no env.step)
    obs_host = env._render()
    prev_dead = np.zeros(NUM_ENVS, bool)
    key = jax.random.PRNGKey(1)

    def dispatch_fetch():
        act, *_ = loop._policy_step(variables, obs_host, loop._state[1], loop._state[2],
                                    prev_dead, key, 3, 0.01)
        np.asarray(act)

    b = timed("policy dispatch + act fetch (host obs)", dispatch_fetch)

    # c) same with everything already on device (scalars included)
    import jax.numpy as jnp

    obs_dev = jnp.asarray(obs_host)
    dead_dev = jnp.zeros((NUM_ENVS,), bool)
    step_dev = jnp.asarray(3, jnp.int32)
    eps_dev = jnp.asarray(0.01, jnp.float32)

    def dispatch_staged():
        act, *_ = loop._policy_step(variables, obs_dev, loop._state[1], loop._state[2],
                                    dead_dev, key, step_dev, eps_dev)
        np.asarray(act)

    c = timed("policy dispatch + act fetch (all-device args)", dispatch_staged)

    # d) env host work
    acts = np.zeros(NUM_ENVS, np.int64)
    d = timed("env.step host work", lambda: env.step(acts))

    print(json.dumps({
        "metric": "collection_ms_per_step", "num_envs": NUM_ENVS, "steps": STEPS,
        "full_send": round(a, 2), "dispatch_host_obs": round(b, 2),
        "dispatch_staged": round(c, 2), "env_host": round(d, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
