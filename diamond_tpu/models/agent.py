"""Agent container: the three models + checkpoint IO + optimizers.

TPU-native counterpart of reference src/agent.py. ``AgentConfig`` injects ``num_actions``
into all three sub-configs (reference agent.py:22-25). ``load`` splits a flat checkpoint by
model name with per-model load flags (reference agent.py:48-62).

The minGPT-style AdamW decay/no-decay split (reference src/utils.py:129-166) becomes an optax
masked weight decay: decay exactly the matmul weights (conv/linear kernels and LSTM
weight_ih/weight_hh), never biases, norm affines, or embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .actor_critic import ActorCritic, ActorCriticConfig
from .denoiser import Denoiser, DenoiserConfig
from .rew_end_model import RewEndModel, RewEndModelConfig

Variables = Any
MODEL_NAMES = ("denoiser", "rew_end_model", "actor_critic")


@dataclass
class AgentConfig:
    """reference: src/agent.py:16-25. ``upsampler`` is the optional second stage of the
    two-stage world model (csgo-branch capability): an action-free EDM super-resolution
    denoiser; when present, the dynamics denoiser operates at img_size/upsampling_factor."""

    denoiser: DenoiserConfig
    rew_end_model: RewEndModelConfig
    actor_critic: ActorCriticConfig
    num_actions: int
    upsampler: Optional[DenoiserConfig] = None

    def __post_init__(self) -> None:
        self.denoiser.inner_model.num_actions = self.num_actions
        self.rew_end_model.num_actions = self.num_actions
        self.actor_critic.num_actions = self.num_actions

    @classmethod
    def from_cfg(cls, agent_cfg: Any, num_actions: int) -> "AgentConfig":
        upsampler_cfg = agent_cfg.get("upsampler", None)
        return cls(
            denoiser=DenoiserConfig.from_cfg(agent_cfg.denoiser),
            rew_end_model=RewEndModelConfig.from_cfg(agent_cfg.rew_end_model),
            actor_critic=ActorCriticConfig.from_cfg(agent_cfg.actor_critic),
            num_actions=num_actions,
            upsampler=DenoiserConfig.from_cfg(upsampler_cfg) if upsampler_cfg else None,
        )


class Agent:
    """Container of the three functional models and their variables (reference agent.py:28)."""

    def __init__(self, cfg: AgentConfig, compute_dtype: Any = jnp.float32) -> None:
        self.cfg = cfg
        self.denoiser = Denoiser(cfg.denoiser, dtype=compute_dtype)
        self.rew_end_model = RewEndModel(cfg.rew_end_model, dtype=compute_dtype)
        self.actor_critic = ActorCritic(cfg.actor_critic, dtype=compute_dtype)
        self.upsampler = Denoiser(cfg.upsampler, dtype=compute_dtype) \
            if cfg.upsampler is not None else None
        self.variables: Dict[str, Variables] = {}

    @property
    def model_names(self) -> tuple:
        return MODEL_NAMES + (("upsampler",) if self.upsampler is not None else ())

    def init(self, rng: jax.Array, img_size: int = 64) -> "Agent":
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        # two-stage mode: the dynamics denoiser lives at low resolution
        f = self.cfg.upsampler.upsampling_factor if self.upsampler is not None else 1
        assert img_size % f == 0, (img_size, f)
        self.variables = {
            "denoiser": self.denoiser.init(r1, img_size=img_size // f),
            "rew_end_model": self.rew_end_model.init(r2),
            "actor_critic": self.actor_critic.init(r3),
        }
        if self.upsampler is not None:
            self.variables["upsampler"] = self.upsampler.init(r4, img_size=img_size)
        return self

    # -- checkpoint IO ---------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return jax.tree_util.tree_map(lambda x: jax.device_get(x), self.variables)

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.variables = jax.tree_util.tree_map(jnp.asarray, sd)

    def save(self, path: Path) -> None:
        from ..checkpoint import save_agent_snapshot

        save_agent_snapshot(self.state_dict(), path)

    def load(self, path_to_ckpt: Path, load_denoiser: bool = True,
             load_rew_end_model: bool = True, load_actor_critic: bool = True,
             load_upsampler: bool = True) -> None:
        """reference: src/agent.py:48-62. Accepts stable npz snapshots or legacy pickles."""
        from ..checkpoint import load_agent_snapshot

        sd = load_agent_snapshot(Path(path_to_ckpt))
        flags = {"denoiser": load_denoiser, "rew_end_model": load_rew_end_model,
                 "actor_critic": load_actor_critic}
        if self.upsampler is not None:
            flags["upsampler"] = load_upsampler
        for name, flag in flags.items():
            if flag:
                self.variables[name] = jax.tree_util.tree_map(jnp.asarray, sd[name])


# ---------------------------------------------------------------------------
# Optimizers


def _decay_mask(params: Any) -> Any:
    """Weight-decay exactly the matmul weights: conv/linear 'kernel' (except embeddings,
    whose flax param is named 'embedding') and LSTM 'weight_*' — matching the reference's
    whitelist/blacklist split (reference src/utils.py:129-166). GroupNorm affines are named
    'scale'/'bias' and get no decay."""

    def mask_leaf(path, _leaf) -> bool:
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf_name == "kernel" or leaf_name.startswith("weight_")

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def configure_opt(lr: float, weight_decay: float, eps: float,
                  max_grad_norm: Optional[float] = None,
                  lr_warmup_steps: int = 0) -> optax.GradientTransformation:
    """AdamW with masked weight decay, global-norm clipping and linear LR warmup
    (reference src/utils.py:129-181 + src/trainer.py:368-382)."""
    if lr_warmup_steps and lr_warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, lr, lr_warmup_steps)
    else:
        schedule = lr
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=eps,
                             weight_decay=weight_decay, mask=_decay_mask))
    return optax.chain(*chain)
