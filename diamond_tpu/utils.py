"""Shared utilities: logging sink, checkpoint rotation, metrics, schedules.

TPU-native counterpart of the reference's src/utils.py. Notable translations:
  * wandb-funnelled ``to_log`` dicts (reference: src/utils.py:323-325) -> a JSONL sink that is
    always on, with wandb layered on top when available and enabled.
  * ``save_with_backup`` .bk swap (reference: src/utils.py:284-289) -> same semantics, pickle.
  * ``keep_agent_copies_every`` rotation (reference: src/utils.py:209-230) -> same schedule.
  * minGPT-style AdamW decay split (reference: src/utils.py:129-166) -> optax masked weight decay
    driven by parameter-path predicates (see models/agent.py for the masks).
"""

from __future__ import annotations

import json
import pickle
import random
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Logs = List[Dict[str, Any]]

ATARI_100K_GAMES = [
    "Alien", "Amidar", "Assault", "Asterix", "BankHeist", "BattleZone", "Boxing", "Breakout",
    "ChopperCommand", "CrazyClimber", "DemonAttack", "Freeway", "Frostbite", "Gopher", "Hero",
    "Jamesbond", "Kangaroo", "Krull", "KungFuMaster", "MsPacman", "Pong", "PrivateEye", "Qbert",
    "RoadRunner", "Seaquest", "UpNDown",
]  # reference: src/utils.py:23-50


# ---------------------------------------------------------------------------
# Logging


class MetricsLogger:
    """Append-only JSONL metrics sink; wandb optional (reference funnels all logs through
    wandb_log, src/utils.py:323-325 — here the JSONL file is the source of truth)."""

    WANDB_INIT_RETRIES = 3  # the reference retries wandb.init until it succeeds
    # (try_until_no_except, reference src/utils.py:311-320); here the retry is BOUNDED
    # so a missing/broken wandb can never block training — after the last attempt the
    # logger degrades to JSONL-only and says so.

    def __init__(self, path: Union[str, Path], wandb_cfg: Optional[Dict[str, Any]] = None) -> None:
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._wandb = None
        if wandb_cfg and wandb_cfg.get("mode", "disabled") != "disabled":
            for attempt in range(self.WANDB_INIT_RETRIES):
                try:
                    import wandb  # type: ignore

                    wandb.init(**{k: v for k, v in wandb_cfg.items() if k != "mode"},
                               resume=True)
                    self._wandb = wandb
                    break
                except Exception as e:
                    self._wandb = None
                    if attempt == self.WANDB_INIT_RETRIES - 1:
                        print(f"wandb disabled after {self.WANDB_INIT_RETRIES} failed "
                              f"init attempts ({e!r}); logging to JSONL only")
                    else:
                        # back off so the bounded retry can actually outlast a transient
                        # outage (the reference waits 10 s between attempts,
                        # reference src/utils.py:311-320)
                        time.sleep(5.0 * (attempt + 1))

    def log(self, logs: Logs, epoch: int) -> None:
        with self.path.open("a") as f:
            for d in logs:
                row = {"epoch": epoch, **{k: _to_py(v) for k, v in d.items()}}
                f.write(json.dumps(row) + "\n")
                if self._wandb is not None:
                    self._wandb.log(row)


def _to_py(v: Any) -> Any:
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return v.tolist() if v.ndim > 0 else float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


# ---------------------------------------------------------------------------
# Checkpoint files


def save_with_backup(obj: Any, path: Union[str, Path]) -> None:
    """Swap-in save: rename old file to .bk, write new, delete .bk
    (reference: src/utils.py:284-289)."""
    path = Path(path)
    bk = path.with_suffix(".bk")
    if path.is_file():
        path.rename(bk)
    with path.open("wb") as f:
        pickle.dump(obj, f)
    bk.unlink(missing_ok=True)


def load_pickle(path: Union[str, Path]) -> Any:
    with Path(path).open("rb") as f:
        return pickle.load(f)


def get_path_agent_ckpt(path_ckpt_dir: Union[str, Path], epoch: int, num_zeros: int = 5) -> Path:
    """reference: src/utils.py:199-206 (negative epoch indexes from the end)."""
    d = Path(path_ckpt_dir) / "agent_versions"
    if epoch >= 0:
        p = d / f"agent_epoch_{epoch:0{num_zeros}d}.npz"
        if not p.is_file():  # legacy (pre-npz) snapshot from an older run
            legacy = p.with_suffix(".pt")
            if legacy.is_file():
                return legacy
        return p
    # one path per epoch, preferring .npz: a run that crossed the pt->npz format change can
    # hold both formats of the same epoch, and raw name order would let "latest" land on an
    # older-format duplicate of a non-newest epoch (advisor round 2)
    by_epoch: dict = {}
    for p in sorted(d.iterdir()):
        if p.suffix == ".npz" or p.stem not in by_epoch:
            by_epoch[p.stem] = p
    all_ = [by_epoch[k] for k in sorted(by_epoch)]
    assert len(all_) >= -epoch
    return all_[epoch]


def keep_agent_copies_every(
    agent_sd: Dict[str, Any],
    epoch: int,
    path_ckpt_dir: Path,
    every: int,
    num_to_keep: Optional[int],
) -> None:
    """Rotating weights-only snapshots (reference: src/utils.py:209-230)."""
    assert every > 0
    assert num_to_keep is None or num_to_keep > 0
    from .checkpoint import save_agent_snapshot

    get_path = partial(get_path_agent_ckpt, path_ckpt_dir)
    get_path(0).parent.mkdir(parents=True, exist_ok=True)
    save_agent_snapshot(agent_sd, get_path(epoch))  # stable npz format (checkpoint.py)
    if (num_to_keep is not None) and (epoch % every == 0):
        get_path(max(0, epoch - num_to_keep * every)).unlink(missing_ok=True)
    if (epoch - 1) % every != 0:
        get_path(max(0, epoch - 1)).unlink(missing_ok=True)


def save_info_for_import_script(epoch: int, run_name: Optional[str], path_ckpt_dir: Path) -> None:
    """reference: src/utils.py:276-281."""
    with (Path(path_ckpt_dir) / "info_for_import_script.json").open("w") as f:
        json.dump({"epoch": epoch, "name": run_name}, f)


# ---------------------------------------------------------------------------
# Metrics


def compute_classification_metrics(cm: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-class precision/recall/F1 from a confusion matrix with rows=true, cols=pred
    (reference: src/utils.py:109-126)."""
    cm = np.asarray(cm, dtype=np.float64)
    n = cm.shape[0]
    precision, recall, f1 = np.zeros(n), np.zeros(n), np.zeros(n)
    for i in range(n):
        tp = cm[i, i]
        fp = cm[:, i].sum() - tp
        fn = cm[i, :].sum() - tp
        precision[i] = tp / (tp + fp) if (tp + fp) else 0.0
        recall[i] = tp / (tp + fn) if (tp + fn) else 0.0
        s = precision[i] + recall[i]
        f1[i] = 2 * precision[i] * recall[i] / s if s else 0.0
    return precision, recall, f1


def process_confusion_matrices_if_any_and_compute_classification_metrics(logs: Logs) -> None:
    """Pop per-step confusion matrices, accumulate, append P/R/F1 metrics
    (reference: src/utils.py:233-248)."""
    cms = [x.pop("confusion_matrix") for x in logs if "confusion_matrix" in x]
    if not cms:
        return
    accum = {k: sum(np.asarray(d[k]) for d in cms) for k in cms[0]}
    metrics: Dict[str, float] = {}
    for key, cm in accum.items():
        precision, recall, f1 = compute_classification_metrics(cm)
        for i in range(len(precision)):
            metrics[f"classification_metrics/{key}_precision_class_{i}"] = float(precision[i])
            metrics[f"classification_metrics/{key}_recall_class_{i}"] = float(recall[i])
            metrics[f"classification_metrics/{key}_f1_score_class_{i}"] = float(f1[i])
    logs.append(metrics)


def multiclass_confusion_matrix(logits: jnp.ndarray, targets: jnp.ndarray, num_classes: int,
                                weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Confusion matrix (rows=true, cols=pred) with optional per-sample weights used to mask
    padding inside jit (the reference indexes by mask then calls torcheval,
    src/models/rew_end_model.py:70-88)."""
    preds = jnp.argmax(logits, axis=-1)
    onehot_t = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    onehot_p = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    if weights is not None:
        onehot_t = onehot_t * weights[..., None].astype(jnp.float32)
    return jnp.einsum("...i,...j->ij", onehot_t, onehot_p)


# ---------------------------------------------------------------------------
# Optimization


def warmup_then_constant(lr: float, num_warmup_steps: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup then constant LR (reference: src/utils.py:177-181)."""

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        if num_warmup_steps <= 0:
            return jnp.asarray(lr)
        frac = jnp.minimum(step / max(1, num_warmup_steps), 1.0)
        return lr * frac

    return schedule


def count_parameters(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


RESTART_EXIT_CODE = 75  # EX_TEMPFAIL: checkpointed-and-restartable (scripts/resume.sh loops)


def host_rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 ** 2
    except OSError:
        pass
    return 0.0


def total_host_mem_gb() -> float:
    """Total host RAM in GB (0.0 if /proc is unavailable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) / 1024 ** 2
    except OSError:
        pass
    return 0.0


def resolve_rss_limit_gb(limit) -> float | None:
    """Resolve ``tpu.max_host_rss_gb``: a number passes through, ``'auto'`` means 80% of
    total host RAM (the elastic-restart guard headroom measured in the round-4/5 seed
    campaigns: runs guarded at 60 GB on a 125 GB host restarted cleanly, unguarded
    bulk-transfer paths OOM-killed the host in ~1 h), null/0 disables."""
    if limit is None or limit == 0:
        return None
    if limit == "auto":
        total = total_host_mem_gb()
        return 0.8 * total if total else None
    return float(limit)


# ---------------------------------------------------------------------------
# Misc


def enable_compilation_cache(default_dir: str = "/root/.cache/diamond_tpu_jax_cache") -> str:
    """Turn on JAX's persistent compilation cache (opt-out: DIAMOND_TPU_COMPILE_CACHE=0).

    Cold-VM agent.init costs ~4.5 min of compile on the tunneled TPU (VALIDATION.md
    round 4) — on a platform where healthy-tunnel windows are the scarce resource,
    every entry point (benches, training CLI) defaults the cache ON. An explicit
    JAX_COMPILATION_CACHE_DIR wins over ``default_dir``. Returns the directory used
    ('' when disabled)."""
    import os

    if os.environ.get("DIAMOND_TPU_COMPILE_CACHE") == "0":
        return ""
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: dispatch-dominated entry points re-trace dozens of
        # small jits, and tunnel round trips make even 1-2 s compiles worth keeping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — never let caching break the entry point
        return ""
    return cache_dir


def env_flag(env_var: str, config_default: bool) -> bool:
    """Config-keyed production option, env-var overridable for A/B runs.

    Used by bench.py / bench_two_stage.py so the benched path defaults to the shipped
    config (tpu.int8_rollout / tpu.pool_policy_feats) while DIAMOND_TPU_*=0|1 still
    force either side for measurement."""
    import os

    raw = os.environ.get(env_var)
    if raw is None:
        return bool(config_default)
    return raw == "1"


def set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)


def skip_if_run_is_over(func: Callable) -> Callable:
    """reference: src/utils.py:299-308."""

    def inner(*args, **kwargs):
        path_run_is_over = Path(".run_is_over")
        if not path_run_is_over.is_file():
            func(*args, **kwargs)
            path_run_is_over.touch()
        else:
            print(f"Run is marked as finished. To unmark, remove '{path_run_is_over}'.")

    return inner


def try_until_no_except(func: Callable) -> None:
    """reference: src/utils.py:311-320."""
    while True:
        try:
            func()
        except KeyboardInterrupt:
            break
        except Exception:
            continue
        else:
            break


class Timer:
    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.elapsed = time.perf_counter() - self.start
