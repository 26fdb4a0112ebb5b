"""Reward (3-class) + episode-end (2-class) predictor.

TPU-native counterpart of reference src/models/rew_end_model.py. Conv encoder over
concat(obs, next_obs), FiLM-conditioned on an action embedding, flattened into an LSTM over
time, 2-layer head -> 5 logits split 3/2.

Functional design: ``predict_rew_end`` takes variables + explicit carry and jits cleanly for
both training sequences (lax.scan inside nn.scan) and the single-step world-model rollout.

Exact-behavior notes:
  * training replaces the gray-padding frame after death with ``final_observation``
    (reference rew_end_model.py:64-69) — done with a one-hot where-swap inside jit,
  * reward targets are sign-clipped to {-1,0,1}+1 (reference rew_end_model.py:74),
  * losses are masked cross-entropies; confusion matrices are accumulated with mask weights
    (reference rew_end_model.py:77-88).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv3x3, Downsample, QDense, ResBlocks, torch_linear_kernel_init, \
    fan_in_bias_init
from .lstm import LSTM

Variables = Any
Carry = Tuple[jnp.ndarray, jnp.ndarray]
Dtype = Any


@dataclass
class RewEndModelConfig:
    """reference: src/models/rew_end_model.py:16-24."""

    lstm_dim: int
    img_channels: int
    img_size: int
    cond_channels: int
    depths: List[int]
    channels: List[int]
    attn_depths: List[int]
    num_actions: Optional[int] = None

    @classmethod
    def from_cfg(cls, cfg: Any, num_actions: Optional[int] = None) -> "RewEndModelConfig":
        return cls(
            lstm_dim=cfg.lstm_dim,
            img_channels=cfg.img_channels,
            img_size=cfg.img_size,
            cond_channels=cfg.cond_channels,
            depths=list(cfg.depths),
            channels=list(cfg.channels),
            attn_depths=list(cfg.attn_depths),
            num_actions=num_actions,
        )


class RewEndEncoder(nn.Module):
    """Conv encoder: conv_in, per-level ResBlocks with Downsample between levels, plus a final
    attn ResBlocks pair (reference src/models/rew_end_model.py:93-133)."""

    cfg: RewEndModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = Conv3x3(cfg.channels[0], self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, (depth, ch) in enumerate(zip(cfg.depths, cfg.channels)):
            if i > 0:
                x = Downsample(dtype=self.dtype, name=f"downsamples_{i}")(x)
            x, _ = ResBlocks([ch] * depth, bool(cfg.attn_depths[i]), dtype=self.dtype,
                             name=f"blocks_{i}")(x, cond)
        x, _ = ResBlocks([cfg.channels[-1]] * 2, True, dtype=self.dtype,
                         name=f"blocks_{len(cfg.depths)}")(x, cond)
        return x


class RewEndNet(nn.Module):
    """Full network as one flax module; __call__ runs a (B, T, ...) sequence."""

    cfg: RewEndModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray, next_obs: jnp.ndarray,
                 carry: Carry) -> Tuple[jnp.ndarray, jnp.ndarray, Carry]:
        """obs/next_obs: (B, T, H, W, C) float [-1,1]; act: (B, T) int.
        Returns (logits_rew (B,T,3), logits_end (B,T,2), new carry)."""
        cfg = self.cfg
        b, t, h, w, c = obs.shape
        x = jnp.concatenate([obs, next_obs], axis=-1).reshape(b * t, h, w, 2 * c)
        cond = nn.Embed(cfg.num_actions, cfg.cond_channels, dtype=self.dtype,
                        embedding_init=nn.initializers.normal(1.0),
                        name="act_emb")(act.reshape(b * t))
        x = RewEndEncoder(cfg, dtype=self.dtype, name="encoder")(x, cond)
        x = x.reshape(b, t, -1).astype(self.dtype)  # (b t) h w e -> b t (h w e)

        hs, carry = LSTM(cfg.lstm_dim, dtype=self.dtype, name="lstm")(x, carry)
        y = QDense(cfg.lstm_dim, dtype=self.dtype, kernel_init=torch_linear_kernel_init,
                   bias_init=fan_in_bias_init(cfg.lstm_dim), name="head_0")(hs)
        y = QDense(3 + 2, use_bias=False, dtype=self.dtype,
                   kernel_init=torch_linear_kernel_init, name="head_2")(nn.silu(y))
        y = y.astype(jnp.float32)
        return y[..., :-2], y[..., -2:], carry


class RewEndModel:
    """Functional wrapper (reference: src/models/rew_end_model.py:27-90)."""

    def __init__(self, cfg: RewEndModelConfig, dtype: Any = jnp.float32) -> None:
        self.cfg = cfg
        self.net = RewEndNet(cfg, dtype=dtype)
        self._calibrate_jit = {}  # site-selection -> jitted observe pass (calibrate())

    def init(self, rng: jax.Array) -> Variables:
        cfg = self.cfg
        obs = jnp.zeros((1, 1, cfg.img_size, cfg.img_size, cfg.img_channels), jnp.float32)
        act = jnp.zeros((1, 1), jnp.int32)
        return self.net.init(rng, obs, act, obs, self.initial_carry(1))

    def initial_carry(self, batch: int) -> Carry:
        d = self.cfg.lstm_dim
        return (jnp.zeros((batch, d), jnp.float32), jnp.zeros((batch, d), jnp.float32))

    def predict_rew_end(self, variables: Variables, obs: jnp.ndarray, act: jnp.ndarray,
                        next_obs: jnp.ndarray, carry: Optional[Carry] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, Carry]:
        """reference: src/models/rew_end_model.py:41-55 (carry defaults to zeros)."""
        if carry is None:
            carry = self.initial_carry(obs.shape[0])
        return self.net.apply(variables, obs, act, next_obs, carry)

    def calibrate(self, variables: Variables, obs: jnp.ndarray, act: jnp.ndarray,
                  next_obs: jnp.ndarray, sites=None) -> Variables:
        """Observe per-site activation ranges for the int8 rollout path and return
        ``variables`` augmented with the "quant" collection (ops/quant.py) — the rew/end
        twin of DiffusionSampler.calibrate. Inside the imagination rollout the rew/end
        forward is pure stop-gradient inference (reference src/envs/world_model_env.py:
        92-105 under @torch.no_grad), so its encoder convs, head Denses and LSTM gate
        matmuls can ride the same static-calibrated int8 MXU path as the denoiser's.
        The encoder and heads run outside the LSTM's lax.scan, and the LSTM input scale
        is recorded by the wrapper before the scan (models/lstm.py), so the recorded
        tracers legally escape to the jit output. Training losses never enter the int8
        scope and stay unquantized. ``sites``: quant.parse_sites spec (tpu.int8_sites)."""
        from ..ops import quant

        sites = quant.parse_sites(sites)
        if sites not in self._calibrate_jit:
            def _observe(variables, obs, act, next_obs):
                registry: dict = {}
                with quant.int8_rollout_scope(True), quant.calibration_scope(registry):
                    self.predict_rew_end(variables, obs, act, next_obs)
                assert registry, "calibration saw no quantizable sites"
                return quant.registry_to_collection(registry, sites)

            self._calibrate_jit[sites] = jax.jit(_observe)
        base = {k: v for k, v in variables.items() if k != "quant"}
        coll = self._calibrate_jit[sites](base, obs, act, next_obs)
        if not coll:
            return base
        return dict(base, quant=coll)

    def loss(self, variables: Variables, batch_obs: jnp.ndarray, batch_act: jnp.ndarray,
             batch_rew: jnp.ndarray, batch_end: jnp.ndarray, batch_mask: jnp.ndarray,
             final_obs: jnp.ndarray, has_final_obs: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Masked CE training loss (reference: src/models/rew_end_model.py:57-90).

        batch_obs: (B, T, H, W, C); batch_{act,rew,end,mask}: (B, T);
        final_obs: (B, H, W, C) true final frame per segment (zeros when absent);
        has_final_obs: (B,) bool — segment's episode died and the frame is valid.
        """
        obs = batch_obs[:, :-1]
        act = batch_act[:, :-1]
        next_obs = batch_obs[:, 1:]
        rew = batch_rew[:, :-1]
        end = batch_end[:, :-1]
        mask = batch_mask[:, :-1]

        # When dead, replace the gray-padding frame by the true final obs
        # (reference rew_end_model.py:64-69): one-hot where-swap at argmax(end).
        t = end.shape[1]
        dead = (end.astype(jnp.int32).sum(axis=1) > 0) & has_final_obs
        death_step = jnp.argmax(end, axis=1)  # (B,)
        onehot = jax.nn.one_hot(death_step, t, dtype=jnp.bool_) & dead[:, None]
        next_obs = jnp.where(onehot[:, :, None, None, None], final_obs[:, None], next_obs)

        # remat: recompute the conv-encoder/LSTM forward in the backward pass instead of
        # saving layout-padded activations (see denoiser.loss / world_model_env.rollout)
        logits_rew, logits_end, _ = jax.checkpoint(self.predict_rew_end)(
            variables, obs, act, next_obs)

        target_rew = jnp.sign(rew).astype(jnp.int32) + 1  # {-1,0,1} -> {0,1,2}
        target_end = end.astype(jnp.int32)
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)

        def masked_ce(logits, targets, num_classes):
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            return (nll * m).sum() / denom

        loss_rew = masked_ce(logits_rew, target_rew, 3)
        loss_end = masked_ce(logits_end, target_end, 2)
        loss = loss_rew + loss_end

        from ..utils import multiclass_confusion_matrix

        metrics = {
            "loss_rew": jax.lax.stop_gradient(loss_rew),
            "loss_end": jax.lax.stop_gradient(loss_end),
            "loss_total": jax.lax.stop_gradient(loss),
            "confusion_matrix": {
                "rew": multiclass_confusion_matrix(logits_rew, target_rew, 3, weights=m),
                "end": multiclass_confusion_matrix(logits_end, target_end, 2, weights=m),
            },
        }
        return loss, metrics
