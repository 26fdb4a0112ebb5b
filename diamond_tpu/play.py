"""Interactive app: play inside the world model, the real env, or browse recorded datasets.

TPU-native counterpart of reference src/play.py. Modes:
  * default: human (or policy, toggle 'm') plays in [world-model, real-test, real-train]
    envs, cycling with the bracket keys (reference play.py:71-115);
  * ``--dataset-mode``: read-only browser over the run's datasets (reference play.py:58-68);
  * ``--record``: write played episodes into ``dataset/rec_*`` stores;
  * ``--pretrained``: download a reference torch checkpoint from the HF Hub
    (eloialonso/diamond, reference play.py:23-26,74-81) and convert it
    (interop/torch_ckpt.py).

Run from inside a training run directory (the default), or pass --run-dir.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Play DIAMOND (TPU-native)")
    p.add_argument("--run-dir", type=Path, default=Path("."))
    p.add_argument("-p", "--pretrained", action="store_true",
                   help="download a pretrained reference agent from the HF Hub")
    p.add_argument("-d", "--dataset-mode", action="store_true")
    p.add_argument("-r", "--record", action="store_true")
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--size", type=int, default=640, help="render size (pixels)")
    p.add_argument("-n", "--num-steps-initial-collect", type=int, default=1000)
    p.add_argument("--game", type=str, default=None,
                   help="with --pretrained: Atari-100k game name, e.g. Breakout")
    p.add_argument("--horizon", type=int, default=50,
                   help="world-model horizon during play (reference play.py:81)")
    p.add_argument("--int8", action="store_true",
                   help="calibrate the world model for int8 MXU inference (one observe "
                        "pass at startup, then ~16%% faster imagination; two-stage "
                        "models calibrate all stages)")
    p.add_argument("--smoke", type=int, default=0,
                   help="headless smoke: run N frames and exit (SDL_VIDEODRIVER=dummy)")
    return p.parse_args(argv)


def download_pretrained(game: str):
    """HF Hub download of the reference agent + config (reference play.py:74-81)."""
    from huggingface_hub import hf_hub_download

    ckpt = hf_hub_download(repo_id="eloialonso/diamond", filename=f"atari_100k/models/{game}.pt")
    return Path(ckpt)


def compose_pretrained_config(game: str):
    """reference play.py:76-80: with --pretrained, the PUBLISHED run's agent/env config
    groups (downloaded from the hub) override the local ones, and the env id is pinned to
    the chosen game. Composed through our own config system so ``${...}`` interpolations
    resolve the Hydra way; the reference's ``_target_`` instantiation keys are dropped
    (our configs are plain trees)."""
    import shutil
    import tempfile

    import yaml
    from huggingface_hub import hf_hub_download

    from .config import DEFAULT_CONFIG_DIR, load_config

    agent_yaml = hf_hub_download("eloialonso/diamond", "atari_100k/config/agent/default.yaml")
    env_yaml = hf_hub_download("eloialonso/diamond", "atari_100k/config/env/atari.yaml")

    def strip_target(d):
        if isinstance(d, dict):
            return {k: strip_target(v) for k, v in d.items() if k != "_target_"}
        return d

    tmp = Path(tempfile.mkdtemp(prefix="diamond_pretrained_cfg_"))
    shutil.copytree(DEFAULT_CONFIG_DIR, tmp, dirs_exist_ok=True)
    (tmp / "agent" / "default.yaml").write_text(
        yaml.safe_dump(strip_target(yaml.safe_load(Path(agent_yaml).read_text())),
                       sort_keys=False))
    (tmp / "env" / "atari.yaml").write_text(
        yaml.safe_dump(strip_target(yaml.safe_load(Path(env_yaml).read_text())),
                       sort_keys=False))
    return load_config("trainer", overrides=[
        "env=atari", f"env.train.id={game}NoFrameskip-v4"], config_dir=tmp)


def main(argv=None) -> None:
    args = parse_args(argv)
    import os
    os.chdir(args.run_dir)

    from .config import load_config
    from .data import BatchSampler, Dataset
    from .utils import get_path_agent_ckpt

    cfg_path = Path("config")
    if (cfg_path / "trainer.yaml").is_file():
        cfg = load_config("trainer", config_dir=cfg_path)
    else:
        cfg = load_config("trainer")

    if args.dataset_mode:
        from .game.dataset_env import DatasetEnv
        from .game.game import Game

        names = [p.name for p in Path("dataset").iterdir() if p.is_dir()]
        datasets = []
        for n in names:
            d = Dataset(Path("dataset") / n, n)
            d.load_from_default_path()
            datasets.append(d)
        env = DatasetEnv(datasets, keymap_name=cfg.env.keymap)
        Game(env, size=(args.size, args.size), fps=args.fps).run(max_steps=args.smoke)
        return

    import jax
    import jax.numpy as jnp

    from .coroutines import Collector, NumToCollect
    from .envs import make_env
    from .envs.world_model_env import ImaginationEngine, WorldModelEnvConfig
    from .envs.wm_env_stateful import WorldModelEnv, make_dataset_ic_provider
    from .game.game import Game
    from .game.play_env import NamedEnv, PlayEnv
    from .models import Agent, AgentConfig

    if args.pretrained:
        # the published run's agent/env configs replace the local ones BEFORE envs and
        # the agent are built (reference play.py:76-80)
        game = args.game or cfg.env.train.id.replace("NoFrameskip-v4", "")
        cfg = compose_pretrained_config(game)

    train_env = make_env(num_envs=1, **cfg.env.train)
    test_env = make_env(num_envs=1, **cfg.env.test)
    num_actions = int(test_env.num_actions)

    agent = Agent(AgentConfig.from_cfg(cfg.agent, num_actions))
    agent.init(jax.random.PRNGKey(0), img_size=cfg.env.train.size)

    if args.pretrained:
        from .interop import load_reference_checkpoint

        path = download_pretrained(game)
        variables = load_reference_checkpoint(path, img_size=cfg.env.train.size,
                                              ac_down=list(cfg.agent.actor_critic.down))
        agent.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        print(f"loaded pretrained {game} from the HF Hub")
    else:
        ckpt = get_path_agent_ckpt("checkpoints", epoch=-1)
        agent.load(ckpt)
        print(f"loaded {ckpt}")

    # Seed the world model's initial-condition pool with real experience
    # (reference play.py:96-103).
    seed_ds = Dataset(Path("dataset") / "play_seed", "play_seed", cache_in_ram=True,
                      save_on_disk=False)
    collector = Collector(test_env, agent.actor_critic,
                          lambda: agent.variables["actor_critic"], seed_ds, verbose=False)
    print(f"collecting {args.num_steps_initial_collect} real steps to seed the world model…")
    collector.send(NumToCollect(steps=args.num_steps_initial_collect))

    wm_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
    wm_cfg.horizon = args.horizon
    engine = ImaginationEngine(agent.denoiser, agent.rew_end_model, agent.actor_critic,
                               wm_cfg)
    n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
    ic_sampler = BatchSampler(seed_ds, 0, 1, batch_size=8, seq_length=n_cond, seed=0)
    factor = agent.cfg.upsampler.upsampling_factor if agent.upsampler is not None else 1
    provider = make_dataset_ic_provider(seed_ds, ic_sampler, agent.rew_end_model,
                                        lambda: agent.variables["rew_end_model"],
                                        downsample_factor=factor)
    up_kwargs = {}
    if agent.upsampler is not None:  # two-stage: super-resolve every displayed frame
        up_kwargs = dict(upsampler=agent.upsampler,
                         u_vars_getter=lambda: agent.variables["upsampler"])

    if args.int8:
        # int8 MXU inference for the play-time world model (ops/quant.py): one jitted
        # observe pass over seed ICs yields the "quant" collection; carrying it in the
        # variables is the enablement (structural gate — the sampler, the rew/end rollout
        # scope, and in two-stage mode the upsampler stage all pick it up; training/e2e
        # paths elsewhere are untouched).
        from .data.episode import obs_to_float
        from .ops import quant as _quant

        # honor tpu.int8_sites so play's inference quantizes exactly the site kinds the
        # trainer/bench were validated with (default "all")
        sites = _quant.parse_sites(cfg.get("tpu", {}).get("int8_sites", "all"))
        print("calibrating int8 world-model inference…")
        obs_u8, cal_act, _hx, _cx = provider(8)
        obs_f = obs_to_float(jnp.asarray(obs_u8))
        cal_act = jnp.asarray(cal_act, jnp.int32)
        if factor > 1:
            # dynamics + rew/end run at the low (dynamics) resolution in two-stage mode
            from .models.denoiser import (downsample_avg, quantize_to_uint8_grid,
                                          upsample_frame)
            obs_f = quantize_to_uint8_grid(downsample_avg(obs_f, factor))
        agent.variables["denoiser"] = engine.sampler.calibrate(
            agent.variables["denoiser"], jax.random.PRNGKey(11), obs_f, cal_act,
            sites=sites)
        agent.variables["rew_end_model"] = agent.rew_end_model.calibrate(
            agent.variables["rew_end_model"], obs_f[:, -2:-1], cal_act[:, -2:-1],
            obs_f[:, -1:], sites=sites)
        if factor > 1:
            # the upsampler stage: same sampler cfg the env's cascade uses
            from .models.diffusion_sampler import DiffusionSampler

            up_s = DiffusionSampler(agent.upsampler, engine.sampler.cfg)
            cond = upsample_frame(obs_f[:, -1], factor)
            agent.variables["upsampler"] = up_s.calibrate(
                agent.variables["upsampler"], jax.random.PRNGKey(12), cond[:, None], None,
                sites=sites)
    wm_env = WorldModelEnv(engine, lambda: agent.variables["denoiser"],
                           lambda: agent.variables["rew_end_model"], provider, num_envs=1,
                           return_denoising_trajectory=args.record, **up_kwargs)

    envs = [NamedEnv("world_model", wm_env), NamedEnv("test", test_env),
            NamedEnv("train", train_env)]
    play_env = PlayEnv(agent, envs, cfg.env.keymap, args.fps, record_mode=args.record)
    Game(play_env, size=(args.size, args.size), fps=args.fps).run(max_steps=args.smoke)


if __name__ == "__main__":
    main()
