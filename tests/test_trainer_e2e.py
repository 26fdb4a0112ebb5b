"""End-to-end smoke: a few epochs of the full pipeline (collect -> WM training -> imagination
RL -> eval -> checkpoint -> resume) on the fake env with tiny models
(SURVEY.md section 4, item 6)."""

import os

import numpy as np
import pytest

from diamond_tpu.config import load_config
from diamond_tpu.trainer import Trainer, final_protocol_metrics


def test_final_protocol_truncates_to_num_final_episodes():
    """The headline final_return_mean averages EXACTLY num_final_episodes in completion
    order (reference trainer.py:302-324); extra episodes finished by batched test envs
    in the last vector step go into the secondary all-collected metric only."""
    to_log = [{"test_dataset/episode_id": i, "return": float(r), "length": 10}
              for i, r in enumerate([1, 2, 3, 0])] + [{"test_dataset/num_steps": 40}]
    m = final_protocol_metrics(to_log, episodes=3)
    assert m["final_num_episodes"] == 3
    assert m["final_return_mean"] == pytest.approx(2.0)          # mean of 1,2,3
    assert m["final_return_std"] == pytest.approx(np.std([1, 2, 3]))
    assert m["final_num_episodes_all_collected"] == 4
    assert m["final_return_mean_all_collected"] == pytest.approx(1.5)
    # fewer collected than requested (shouldn't happen, but never crash): uses what exists
    m2 = final_protocol_metrics(to_log[:2], episodes=3)
    assert m2["final_num_episodes"] == 2

TINY_OVERRIDES = [
    "env=fake",
    "env.train.size=16",
    "env.train.max_episode_steps=30",
    "common.seed=7",
    # tiny models
    "agent.denoiser.inner_model.cond_channels=16",
    "agent.denoiser.inner_model.depths=[1,1]",
    "agent.denoiser.inner_model.channels=[8,8]",
    "agent.denoiser.inner_model.attn_depths=[0,0]",
    "agent.rew_end_model.lstm_dim=32",
    "agent.rew_end_model.cond_channels=8",
    "agent.rew_end_model.depths=[1,1]",
    "agent.rew_end_model.channels=[8,8]",
    "agent.rew_end_model.attn_depths=[0,0]",
    "agent.actor_critic.lstm_dim=32",
    "agent.actor_critic.channels=[8,8]",
    "agent.actor_critic.down=[1,1]",
    # tiny training
    "collection.train.first_epoch.min=60",
    "collection.train.first_epoch.max=60",
    "collection.train.first_epoch.threshold_rew=1",
    "collection.train.num_steps_total=120",
    "collection.train.steps_per_epoch=30",
    "collection.test.num_episodes=1",
    "collection.test.num_final_episodes=2",
    "training.num_final_epochs=1",
    "denoiser.training.steps_first_epoch=3",
    "denoiser.training.steps_per_epoch=2",
    "denoiser.training.batch_size=4",
    "denoiser.training.lr_warmup_steps=2",
    "rew_end_model.training.steps_first_epoch=3",
    "rew_end_model.training.steps_per_epoch=2",
    "rew_end_model.training.batch_size=4",
    "actor_critic.training.steps_first_epoch=2",
    "actor_critic.training.steps_per_epoch=2",
    "actor_critic.training.batch_size=4",
    "actor_critic.actor_critic_loss.backup_every=5",
    "world_model_env.horizon=5",
    "world_model_env.num_batches_to_preload=8",
    "world_model_env.diffusion_sampler.num_steps_denoising=2",
    "evaluation.every=2",
    "tpu.compute_dtype=float32",
]


@pytest.mark.slow
def test_model_free_trainer(tmp_path, monkeypatch):
    """training.model_free=True: no WM training, RL on the real env
    (reference trainer.py:171-172, 330)."""
    run_dir = tmp_path / "mf_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES + [
        "training.model_free=True",
        "actor_critic.training.batch_size=2",
        "actor_critic.training.steps_first_epoch=2",
        "training.num_final_epochs=2",
        "evaluation.every=10",
        "collection.test.num_final_episodes=1",
    ])
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    trainer.run()
    assert trainer.num_epochs_collect == 0
    assert trainer.epoch == 2
    lines = (run_dir / "metrics.jsonl").read_text()
    assert "actor_critic/train/loss_total" in lines
    assert "denoiser/train" not in lines  # world model untouched


@pytest.mark.slow
def test_static_dataset_mode(tmp_path, monkeypatch):
    """static_dataset.path: no collection, train from a fixed dataset
    (reference trainer.py:64, 116, 213)."""
    import numpy as np
    from diamond_tpu.data import Dataset, Episode

    # build a small static dataset
    static = tmp_path / "static"
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        ds = Dataset(static / split, f"{split}_dataset")
        for i in range(4):
            t = 24
            end = np.zeros(t, np.uint8)
            end[-1] = 1
            ds.add_episode(Episode(
                obs=rng.integers(0, 255, (t, 16, 16, 3), dtype=np.uint8),
                act=rng.integers(0, 3, t).astype(np.int32),
                rew=rng.choice([-1.0, 0.0, 1.0], t).astype(np.float32),
                end=end, trunc=np.zeros(t, np.uint8),
                info={"final_observation": rng.integers(0, 255, (16, 16, 3),
                                                        dtype=np.uint8)}))
        ds.save_to_default_path()

    run_dir = tmp_path / "static_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES + [
        f"static_dataset.path={static}",
        "training.num_final_epochs=1",
        "evaluation.every=1",
    ])
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    trainer.run()
    assert trainer.epoch == 1
    assert trainer.train_dataset.is_static
    lines = (run_dir / "metrics.jsonl").read_text()
    assert "denoiser/train/loss_denoising" in lines
    assert "denoiser/test/loss_denoising" in lines  # traverser eval ran
    assert "test_dataset/" not in lines.split("denoiser")[0] or True


@pytest.mark.slow
def test_data_parallel_trainer(tmp_path, monkeypatch):
    """Same trainer, batch sizes divisible by the 8-device mesh -> DP engages
    (SURVEY.md section 2.8 TPU-native equivalent)."""
    import jax

    assert len(jax.devices()) == 8
    run_dir = tmp_path / "dp_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES + [
        "denoiser.training.batch_size=8",
        "rew_end_model.training.batch_size=8",
        "actor_critic.training.batch_size=8",
        "denoiser.training.steps_first_epoch=2",
        "rew_end_model.training.steps_first_epoch=2",
        "actor_critic.training.steps_first_epoch=1",
        "denoiser.training.steps_per_epoch=1",
        "rew_end_model.training.steps_per_epoch=1",
        "actor_critic.training.steps_per_epoch=1",
        "collection.train.num_steps_total=90",
        "training.num_final_epochs=1",
        "evaluation.every=10",
        "collection.test.num_final_episodes=1",
    ])
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    assert trainer._mesh is not None, "mesh must engage with divisible batch sizes"
    trainer.run()
    lines = (run_dir / "metrics.jsonl").read_text()
    assert "denoiser/train/loss_denoising" in lines
    assert "actor_critic/train/loss_total" in lines


@pytest.mark.slow
def test_device_subset_trainer(tmp_path, monkeypatch):
    """common.devices=[2,3,4,5]: the mesh spans exactly the selected 4-of-8 subset and a
    full train cycle runs sharded over it (reference src/main.py:47-56 selects the device
    subset the same way via CUDA_VISIBLE_DEVICES)."""
    import jax

    assert len(jax.devices()) == 8
    run_dir = tmp_path / "subset_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES + [
        "common.devices=[2,3,4,5]",
        "denoiser.training.batch_size=8",
        "rew_end_model.training.batch_size=8",
        "actor_critic.training.batch_size=8",
        "denoiser.training.steps_first_epoch=2",
        "rew_end_model.training.steps_first_epoch=2",
        "actor_critic.training.steps_first_epoch=1",
        "denoiser.training.steps_per_epoch=1",
        "rew_end_model.training.steps_per_epoch=1",
        "actor_critic.training.steps_per_epoch=1",
        "collection.train.num_steps_total=90",
        "training.num_final_epochs=1",
        "evaluation.every=10",
        "collection.test.num_final_episodes=1",
    ])
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    assert trainer._mesh is not None
    assert list(trainer._mesh.devices.flat) == [jax.devices()[i] for i in (2, 3, 4, 5)]
    trainer.run()
    lines = (run_dir / "metrics.jsonl").read_text()
    assert "denoiser/train/loss_denoising" in lines
    assert "actor_critic/train/loss_total" in lines


@pytest.mark.slow
def test_e2e_train_and_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)

    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    trainer.run()

    # ran: initial collect (2 sub-collects) + 2 collect epochs + 1 final epoch
    assert trainer.epoch == trainer.num_epochs_collect + 1
    assert trainer.train_dataset.num_steps >= 120
    assert (run_dir / "checkpoints" / "state.pt").is_file()
    assert (run_dir / "metrics.jsonl").is_file()
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert any("final_return_mean" in l for l in lines)
    assert any("denoiser/train/loss_denoising" in l for l in lines)
    assert any("actor_critic/train/loss_total" in l for l in lines)
    assert any("rew_end_model/train/loss_rew" in l for l in lines)

    # resume restores counters and model params
    cfg2 = load_config("trainer", overrides=TINY_OVERRIDES + ["common.resume=True"])
    trainer2 = Trainer(cfg2, root_dir=tmp_path, run_dir=run_dir)
    assert trainer2.epoch == trainer.epoch
    assert trainer2.num_epochs_collect == trainer.num_epochs_collect
    assert trainer2.train_dataset.num_steps == trainer.train_dataset.num_steps
    # params equal leaf-by-leaf
    import jax
    l1 = jax.tree_util.tree_leaves(trainer.train_states["denoiser"].params)
    l2 = jax.tree_util.tree_leaves(trainer2.train_states["denoiser"].params)
    for x, y in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # resumed run continues without error for one more epoch of each component
    trainer2.num_epochs_collect = trainer2.epoch  # force one more "final" epoch
    cfg2.training.num_final_epochs = 1
    trainer2._cfg = cfg2
    trainer2.run()


@pytest.mark.slow
def test_resolve_rss_limit_gb():
    from diamond_tpu.utils import resolve_rss_limit_gb, total_host_mem_gb

    assert resolve_rss_limit_gb(None) is None
    assert resolve_rss_limit_gb(0) is None
    assert resolve_rss_limit_gb(60) == 60.0
    assert resolve_rss_limit_gb("12.5") == 12.5
    total = total_host_mem_gb()
    auto = resolve_rss_limit_gb("auto")
    if total:  # /proc available
        assert auto == pytest.approx(0.8 * total)
        assert 0 < auto < total
    else:
        assert auto is None


def test_max_host_rss_restart_guard(tmp_path, monkeypatch):
    """tpu.max_host_rss_gb: the trainer exits RESTART_EXIT_CODE after checkpointing when
    host RSS exceeds the limit, and a resume run completes the remaining epochs."""
    from diamond_tpu.utils import RESTART_EXIT_CODE

    run_dir = tmp_path / "guard_run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    overrides = TINY_OVERRIDES + [
        "training.num_final_epochs=2",
        "evaluation.every=10",
        "collection.test.num_final_episodes=1",
        "tpu.max_host_rss_gb=0.001",  # certainly exceeded
    ]
    cfg = load_config("trainer", overrides=overrides)
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    with pytest.raises(SystemExit) as e:
        trainer.run()
    assert e.value.code == RESTART_EXIT_CODE
    assert trainer.epoch == 1  # stopped after the first checkpointed epoch
    assert not (run_dir / ".run_is_over").exists()

    cfg2 = load_config("trainer", overrides=overrides + [
        "common.resume=True", "tpu.max_host_rss_gb=null"])
    trainer2 = Trainer(cfg2, root_dir=tmp_path, run_dir=run_dir)
    assert trainer2.epoch == 1
    trainer2.run()
    assert trainer2.epoch == trainer2.num_epochs_collect + 2


@pytest.mark.slow
def test_cli_resume_reloads_saved_config(tmp_path, monkeypatch):
    """`main.py common.resume=True` must reload the RUN's saved config (the original
    overrides — e.g. env=fake — are not re-passed; scripts/resume.sh passes none)."""
    from diamond_tpu.main import main as cli_main

    run_dir = tmp_path / "cli_run"
    monkeypatch.chdir(tmp_path)
    cli_main(TINY_OVERRIDES + [
        "training.num_final_epochs=1",
        "evaluation.every=10",
        "collection.test.num_final_episodes=1",
        "--run-dir", str(run_dir),
    ])
    assert (run_dir / ".run_is_over").exists()
    monkeypatch.chdir(tmp_path)
    # without the saved-config reload this raises the ale-py ImportError (env=atari);
    # with it, the finished-run guard skips instantly
    cli_main(["common.resume=True", "--run-dir", str(run_dir)])


@pytest.mark.slow
def test_final_eval_script_reproduces_in_run_number(tmp_path, monkeypatch):
    """scripts/final_eval.py (the tool that banked the round-5 capability numbers) must
    reproduce a finished run's in-run final_return_mean exactly: same default ckpt
    (latest agent version), same collector seed (run seed + 1), same protocol
    truncation — on the deterministic fake env the re-run is bit-for-bit."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    monkeypatch.chdir(run_dir)
    cfg = load_config("trainer", overrides=TINY_OVERRIDES)
    trainer = Trainer(cfg, root_dir=tmp_path, run_dir=run_dir)
    trainer.run()
    in_run = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
              if "final_return_mean" in l][-1]

    repo = Path(__file__).resolve().parents[1]
    env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
    env.update(JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "final_eval.py"), str(run_dir)],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["final_num_episodes"] == in_run["final_num_episodes"]
    assert got["final_return_mean"] == pytest.approx(in_run["final_return_mean"])
    assert got["final_return_std"] == pytest.approx(in_run["final_return_std"])
