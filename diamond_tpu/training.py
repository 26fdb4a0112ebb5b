"""Jitted train steps for the three models.

The reference's per-component train loop (reference src/trainer.py:349-389: fetch batch,
forward, backward, clip, step, warmup) becomes one fused jitted function per model:
``(state, batch, rng) -> (state, metrics)`` — grads, clipping, AdamW update and LR schedule
all on device. The actor-critic step embeds the entire 15-step imagination rollout
(envs/world_model_env.py) so RL training never leaves the chip (reference call stack
SURVEY.md section 3.4).

Gradient accumulation (reference trainer.py:368-379, grad_acc_steps) defaults to 1 in every
reference config; when set higher the trainer loop averages micro-batch grads host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .data.episode import obs_to_float
from .data.segment import DeviceBatch
from .envs.world_model_env import ICPool, ImagState, ImaginationEngine
from .models.actor_critic import ActorCritic, ActorCriticLossConfig
from .models.agent import configure_opt
from .models.denoiser import (Denoiser, SigmaDistributionConfig, downsample_avg,
                              quantize_to_uint8_grid)
from .models.rew_end_model import RewEndModel

Variables = Any


class TrainState(struct.PyTreeNode):
    """Per-model optimization state (the reference keeps torch Optimizer + LambdaLR +
    counters, trainer.py:129-137, 191-201)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32 — optimizer updates so far (drives LR warmup)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32))


@dataclass
class OptimizerSpec:
    lr: float
    weight_decay: float
    eps: float
    max_grad_norm: Optional[float]
    lr_warmup_steps: int

    @classmethod
    def from_cfg(cls, opt_cfg: Any, train_cfg: Any) -> "OptimizerSpec":
        return cls(lr=float(opt_cfg.lr), weight_decay=float(opt_cfg.weight_decay),
                   eps=float(opt_cfg.eps), max_grad_norm=train_cfg.max_grad_norm,
                   lr_warmup_steps=int(train_cfg.lr_warmup_steps))

    def build(self) -> optax.GradientTransformation:
        return configure_opt(self.lr, self.weight_decay, self.eps, self.max_grad_norm,
                             self.lr_warmup_steps)

    def lr_at(self, step: int) -> float:
        if self.lr_warmup_steps > 0:
            return self.lr * min(1.0, step / self.lr_warmup_steps)
        return self.lr


def _apply_update(tx: optax.GradientTransformation, state: TrainState, grads: Any,
                  ) -> Tuple[TrainState, jnp.ndarray]:
    """Data parallelism is GSPMD: batch-sharded inputs + replicated params make XLA insert
    the grad all-reduce itself (parallel/mesh.py) — no explicit pmean is needed or kept."""
    grad_norm = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state, step=state.step + 1), grad_norm


def _two_stage_obs(obs_u8, downsample_factor: int):
    """Dynamics-model view of the frames. In two-stage mode the rollout's conditioning
    buffers carry uint8-grid-quantized low-res frames (envs/wm_env_stateful.py,
    envs/world_model_env.py) — quantize the training target/conditioning identically so
    train and inference see the same pixel distribution (the upsampler loss already does,
    models/denoiser.py loss_upsampler)."""
    obs = obs_to_float(obs_u8)
    if downsample_factor == 1:
        return obs
    return quantize_to_uint8_grid(downsample_avg(obs, downsample_factor))


# ---------------------------------------------------------------------------
# Denoiser


def make_denoiser_train_step(denoiser: Denoiser, tx: optax.GradientTransformation,
                             sigma_cfg: SigmaDistributionConfig,
                             downsample_factor: int = 1) -> Callable:
    """``downsample_factor`` > 1 = two-stage world model: the dataset stores full-res
    frames, the dynamics denoiser trains on their on-device area downsample."""

    def loss_fn(params, constants, batch: DeviceBatch, rng):
        variables = {"params": params, "constants": constants}
        obs = _two_stage_obs(batch.obs, downsample_factor)
        return denoiser.loss(variables, obs, batch.act, batch.mask_padding, rng, sigma_cfg)

    def step(state: TrainState, constants: Any, batch: DeviceBatch, rng) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, constants, batch, rng)
        state, grad_norm = _apply_update(tx, state, grads)
        metrics["grad_norm_before_clip"] = grad_norm
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Upsampler (two-stage world model, csgo-branch capability)


def make_upsampler_train_step(upsampler: Denoiser, tx: optax.GradientTransformation,
                              sigma_cfg: SigmaDistributionConfig) -> Callable:
    """Per-frame super-resolution training: batches of full-res segments, time folded
    into batch inside the loss (models/denoiser.py loss_upsampler)."""

    def loss_fn(params, constants, batch: DeviceBatch, rng):
        variables = {"params": params, "constants": constants}
        obs = obs_to_float(batch.obs)
        return upsampler.loss_upsampler(variables, obs, batch.mask_padding, rng, sigma_cfg)

    def step(state: TrainState, constants: Any, batch: DeviceBatch, rng
             ) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, constants, batch, rng)
        state, grad_norm = _apply_update(tx, state, grads)
        metrics["grad_norm_before_clip"] = grad_norm
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_upsampler_eval_step(upsampler: Denoiser,
                             sigma_cfg: SigmaDistributionConfig) -> Callable:
    @jax.jit
    def step(variables, batch: DeviceBatch, rng) -> Dict:
        obs = obs_to_float(batch.obs)
        _, metrics = upsampler.loss_upsampler(variables, obs, batch.mask_padding, rng,
                                              sigma_cfg)
        return metrics

    return step


# ---------------------------------------------------------------------------
# Reward/end model


def make_rew_end_train_step(rew_end_model: RewEndModel, tx: optax.GradientTransformation) -> Callable:
    def loss_fn(params, batch: DeviceBatch):
        obs = obs_to_float(batch.obs)
        final_obs = obs_to_float(batch.final_obs)
        return rew_end_model.loss({"params": params}, obs, batch.act, batch.rew, batch.end,
                                  batch.mask_padding, final_obs, batch.has_final_obs)

    def step(state: TrainState, batch: DeviceBatch) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        state, grad_norm = _apply_update(tx, state, grads)
        metrics["grad_norm_before_clip"] = grad_norm
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Actor-critic (imagination RL) — the hot path


def make_ac_train_step(engine: ImaginationEngine, actor_critic: ActorCritic,
                       tx: optax.GradientTransformation, loss_cfg: ActorCriticLossConfig) -> Callable:
    num_steps = loss_cfg.backup_every

    def loss_fn(params, d_vars, r_vars, st: ImagState, pool: ICPool, rng):
        traj, st, pool = engine.rollout({"params": params}, d_vars, r_vars, st, pool, rng,
                                        num_steps)
        loss, metrics = actor_critic.loss_from_rollout(
            traj["act"], traj["rew"], traj["end"].astype(jnp.float32),
            traj["trunc"].astype(jnp.float32), traj["logits_act"], traj["val"],
            traj["val_bootstrap"], loss_cfg)
        metrics["imagination_deaths"] = traj["dead"].sum()
        return loss, (metrics, st, pool)

    def step(state: TrainState, d_vars, r_vars, st: ImagState, pool: ICPool, rng
             ) -> Tuple[TrainState, ImagState, ICPool, Dict]:
        (_, (metrics, st, pool)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, d_vars, r_vars, st, pool, rng)
        state, grad_norm = _apply_update(tx, state, grads)
        metrics["grad_norm_before_clip"] = grad_norm
        return state, st, pool, metrics

    # donate train state, imagination state AND the pool (its large members pass through
    # unchanged — donation lets XLA alias them instead of copying ~100MB per step)
    return jax.jit(step, donate_argnums=(0, 3, 4))


# ---------------------------------------------------------------------------
# Actor-critic, model-free mode (training.model_free=True)


def make_model_free_ac_train_step(actor_critic: ActorCritic,
                                  tx: optax.GradientTransformation,
                                  loss_cfg: ActorCriticLossConfig) -> Callable:
    """RL on the real env (reference trainer.py:171-172, 330: the WM env is swapped for a
    vectorized real env and the same REINFORCE loss applies).

    The env steps on the host (coroutines/env_loop.py records the trajectory and the LSTM
    reset gates); this step *recomputes* the policy forward over the recorded observations
    inside jit — the forward values are identical to the rollout's, so the gradients equal
    the reference's backprop-through-the-rollout. Bootstrap values are detached in the
    reference (env_loop.py:39-43), so the recorded ones are used directly.
    """

    def loss_fn(params, obs_u8, act, rew, end, trunc, reset_mask, hx0, cx0, val_bootstrap):
        variables = {"params": params}

        def scan_step(carry, xs):
            hx, cx = carry
            obs_t, reset_t = xs  # (B, H, W, C), (B,)
            gate = 1.0 - reset_t.astype(jnp.float32)[:, None]
            out = actor_critic.predict_act_value(variables, obs_to_float(obs_t),
                                                 (hx * gate, cx * gate))
            return out.carry, (out.logits_act, out.val)

        _, (logits, vals) = jax.lax.scan(
            scan_step, (hx0, cx0),
            (jnp.moveaxis(obs_u8, 0, 1), jnp.moveaxis(reset_mask, 0, 1)))
        logits = jnp.moveaxis(logits, 0, 1)  # (B, T, A)
        vals = jnp.moveaxis(vals, 0, 1)
        return actor_critic.loss_from_rollout(act, rew, end.astype(jnp.float32),
                                              trunc.astype(jnp.float32), logits, vals,
                                              val_bootstrap, loss_cfg)

    def step(state: TrainState, obs_u8, act, rew, end, trunc, reset_mask, hx0, cx0,
             val_bootstrap) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, obs_u8, act, rew, end, trunc, reset_mask, hx0, cx0, val_bootstrap)
        state, grad_norm = _apply_update(tx, state, grads)
        metrics["grad_norm_before_clip"] = grad_norm
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Eval (test) steps — losses only, no update


def make_denoiser_eval_step(denoiser: Denoiser, sigma_cfg: SigmaDistributionConfig,
                            downsample_factor: int = 1) -> Callable:
    @jax.jit
    def step(variables, batch: DeviceBatch, rng) -> Dict:
        obs = _two_stage_obs(batch.obs, downsample_factor)
        _, metrics = denoiser.loss(variables, obs, batch.act, batch.mask_padding, rng,
                                   sigma_cfg)
        return metrics

    return step


def make_rew_end_eval_step(rew_end_model: RewEndModel) -> Callable:
    @jax.jit
    def step(variables, batch: DeviceBatch) -> Dict:
        obs = obs_to_float(batch.obs)
        final_obs = obs_to_float(batch.final_obs)
        _, metrics = rew_end_model.loss(variables, obs, batch.act, batch.rew, batch.end,
                                        batch.mask_padding, final_obs, batch.has_final_obs)
        return metrics

    return step
