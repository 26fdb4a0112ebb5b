"""Training CLI.

TPU-native counterpart of reference src/main.py. Same override surface
(``python -m diamond_tpu.main env.train.id=PongNoFrameskip-v4 common.seed=1``) without Hydra;
each run owns a fresh run dir ``outputs/<date>/<time>`` (reference config/trainer.yaml:6-8)
unless ``--run-dir`` / resume says otherwise.

No mp.spawn / process groups: one process drives every local device; data parallelism is a
mesh axis inside the jitted train steps (reference main.py:26-44 spawned one process per GPU
with NCCL — SURVEY.md section 2.8).
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path

from .config import load_config
from .trainer import Trainer
from .utils import enable_compilation_cache, skip_if_run_is_over


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train DIAMOND (TPU-native)")
    parser.add_argument("overrides", nargs="*", help="config overrides, key=value")
    parser.add_argument("--run-dir", type=Path, default=None,
                        help="run directory (default: outputs/<date>/<time>)")
    parser.add_argument("--config-dir", type=Path, default=None)
    parser.add_argument("--config-name", type=str, default="trainer")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    # Resume loads the RUN's saved (fully-resolved) config so the original overrides
    # survive — the reference gets this from Hydra's .hydra snapshot; re-passing every
    # override on resume is not required (scripts/resume.sh passes none).
    config_dir = args.config_dir
    wants_resume = any(o.replace(" ", "") in ("common.resume=True", "common.resume=true")
                       for o in args.overrides)
    if wants_resume and config_dir is None:
        saved = (args.run_dir if args.run_dir is not None else Path.cwd()) / "config"
        if (saved / f"{args.config_name}.yaml").is_file():
            config_dir = saved

    cfg = load_config(args.config_name, overrides=args.overrides,
                      config_dir=config_dir)

    # persistent compile cache: a resumed/repeated run on a fresh VM otherwise pays
    # ~4.5 min of cold compiles per process (opt-out: DIAMOND_TPU_COMPILE_CACHE=0)
    enable_compilation_cache()

    # Multi-host (DCN) data parallelism exists at the TRAIN-STEP layer only: the jitted
    # GSPMD steps (incl. the AC/imagination step) are host-count-agnostic and
    # multi-process-dryrun-proven (parallel/multihost.py, tests/test_multihost.py), but
    # this Trainer's orchestration (collection, device-store placement, checkpointing)
    # is single-controller. Fail fast HERE instead of initializing a process group the
    # Trainer would reject anyway (trainer.py's jax.process_count() guard).
    dist = cfg.get("tpu", {}).get("distributed", None)
    if dist and dist.get("coordinator"):
        raise SystemExit(
            "tpu.distributed.* is not supported by the training CLI: the Trainer is "
            "single-host. Multi-host (DCN) data parallelism is available at the "
            "train-step layer — initialize with parallel.multihost.initialize and feed "
            "global arrays via global_batch_from_local / global_replicated_from_full "
            "(see parallel/multihost.py and tests/test_multihost.py).")

    root_dir = Path(__file__).resolve().parents[1]
    if args.run_dir is not None:
        run_dir = args.run_dir
    elif cfg.common.resume:
        run_dir = Path.cwd()
    else:
        now = datetime.datetime.now()
        run_dir = Path("outputs") / now.strftime("%Y-%m-%d") / now.strftime("%H-%M-%S")
    run_dir.mkdir(parents=True, exist_ok=True)
    os.chdir(run_dir)  # the run dir owns all artifacts (reference trainer.yaml:6-8)

    @skip_if_run_is_over
    def run() -> None:
        trainer = Trainer(cfg, root_dir, run_dir=Path.cwd())
        trainer.run()

    run()


if __name__ == "__main__":
    main()
