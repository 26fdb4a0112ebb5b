"""Standalone final-protocol evaluation from a saved run dir.

Re-runs the reference's final evaluation (reference src/trainer.py:302-324: greedy
policy, mean return over num_final_episodes real-env episodes) from a run's latest
agent checkpoint, WITHOUT resuming training. Used for (a) banking a final number whose
in-run record was lost, (b) reproducibility checks of a recorded final eval, and
(c) cheap protocol re-runs at different env counts.

Note on attribution: this eval never touches the int8 rollout — the real-env policy
step runs the plain actor-critic (coroutines/env_loop.py policy_step); tpu.int8_*
only affects denoiser/rew-end inference inside imagination TRAINING. Quantization
effects on capability can therefore only be measured by training control seeds
(scripts/run_seed_r5.sh MODE=bf16), not by flipping flags at eval time.

Usage: python scripts/final_eval.py <run_dir> [--episodes N] [--num-envs M] [--seed S]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from diamond_tpu.config import load_config  # noqa: E402
from diamond_tpu.coroutines import Collector, NumToCollect  # noqa: E402
from diamond_tpu.data import Dataset  # noqa: E402
from diamond_tpu.envs import make_env  # noqa: E402
from diamond_tpu.models import Agent, AgentConfig  # noqa: E402
from diamond_tpu.trainer import final_protocol_metrics  # noqa: E402
from diamond_tpu.utils import enable_compilation_cache  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", type=Path)
    p.add_argument("--episodes", type=int, default=None,
                   help="default: the run's collection.test.num_final_episodes")
    p.add_argument("--num-envs", type=int, default=None,
                   help="default: the run's collection.test.num_envs")
    p.add_argument("--seed", type=int, default=None,
                   help="collector seed (default: run seed + 1, the trainer's choice)")
    p.add_argument("--ckpt", type=Path, default=None,
                   help="agent snapshot (default: latest checkpoints/agent_versions/*)")
    args = p.parse_args()

    enable_compilation_cache()
    cfg = load_config("trainer", config_dir=args.run_dir / "config")
    episodes = args.episodes or int(cfg.collection.test.num_final_episodes)
    num_envs = args.num_envs or int(cfg.collection.test.num_envs)
    seed = args.seed if args.seed is not None else int(cfg.common.seed) + 1

    ckpt = args.ckpt
    if ckpt is None:
        versions = sorted((args.run_dir / "checkpoints" / "agent_versions").glob("*"))
        assert versions, f"no agent versions under {args.run_dir}"
        ckpt = versions[-1]
    print(f"[final_eval] ckpt={ckpt} episodes={episodes} num_envs={num_envs} seed={seed}",
          file=sys.stderr, flush=True)

    env = make_env(num_envs=num_envs, **cfg.env.test)
    agent = Agent(AgentConfig.from_cfg(cfg.agent, int(env.num_actions)))
    import jax

    agent.init(jax.random.PRNGKey(0), img_size=cfg.env.train.size)
    agent.load(ckpt)

    ds = Dataset(args.run_dir / "final_eval_dataset", "test_dataset",
                 cache_in_ram=True, save_on_disk=False)
    col = Collector(env, agent.actor_critic,
                    lambda: agent.variables["actor_critic"], ds,
                    epsilon=float(cfg.collection.test.epsilon),
                    reset_every_collect=True, seed=seed, verbose=True)
    to_log = col.send(NumToCollect(episodes=episodes))
    metrics = final_protocol_metrics(to_log, episodes)
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
