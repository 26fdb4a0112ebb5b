"""Recurrent actor-critic: conv encoder -> LSTMCell -> zero-init actor/critic heads.

TPU-native counterpart of reference src/models/actor_critic.py. The reference's
``ActorCritic.forward()`` owns a live env-loop coroutine and *is* "roll 15 steps and compute
the RL loss" (reference actor_critic.py:63-98). Here that inversion is undone: the rollout is
produced by the fused imagination scan (envs/world_model_env.py) or the host env-loop
(coroutines/env_loop.py), and ``loss_from_rollout`` computes the identical REINFORCE +
value-MSE + entropy loss from the stacked trajectory.

Exact-behavior notes:
  * rewards are sign-clipped inside lambda-returns (reference actor_critic.py:128),
  * lambda-returns bootstrap with (1-lambda)-weighted values and a reverse accumulation
    (reference actor_critic.py:116-143) — here a reversed lax.scan,
  * actor/critic output layers zero-init (reference actor_critic.py:49-52).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv3x3, SmallResBlock
from .lstm import LSTMCell

Variables = Any
Carry = Tuple[jnp.ndarray, jnp.ndarray]
Dtype = Any


@dataclass
class ActorCriticLossConfig:
    """reference: src/models/actor_critic.py:22-28."""

    backup_every: int
    gamma: float
    lambda_: float
    weight_value_loss: float
    weight_entropy_loss: float

    @classmethod
    def from_cfg(cls, cfg: Any) -> "ActorCriticLossConfig":
        return cls(
            backup_every=cfg.backup_every,
            gamma=cfg.gamma,
            lambda_=cfg.lambda_,
            weight_value_loss=cfg.weight_value_loss,
            weight_entropy_loss=cfg.weight_entropy_loss,
        )


@dataclass
class ActorCriticConfig:
    """reference: src/models/actor_critic.py:31-38."""

    lstm_dim: int
    img_channels: int
    img_size: int
    channels: List[int]
    down: List[int]
    num_actions: Optional[int] = None

    @classmethod
    def from_cfg(cls, cfg: Any, num_actions: Optional[int] = None) -> "ActorCriticConfig":
        return cls(
            lstm_dim=cfg.lstm_dim,
            img_channels=cfg.img_channels,
            img_size=cfg.img_size,
            channels=list(cfg.channels),
            down=list(cfg.down),
            num_actions=num_actions,
        )


class ActorCriticOutput(NamedTuple):
    """reference: src/models/actor_critic.py:18."""

    logits_act: jnp.ndarray
    val: jnp.ndarray
    carry: Carry


class ActorCriticEncoder(nn.Module):
    """Conv3x3 then per-level SmallResBlock + MaxPool (reference actor_critic.py:101-113)."""

    cfg: ActorCriticConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = Conv3x3(cfg.channels[0], self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(cfg.channels):
            x = SmallResBlock(ch, dtype=self.dtype, name=f"blocks_{i}")(x)
            if cfg.down[i]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ActorCriticNet(nn.Module):
    """Single-step policy/value net (reference actor_critic.py:40-73).

    Exposed in two halves — ``encode`` (the conv trunk) and ``head`` (LSTM step + actor/
    critic linears) — so the fused imagination rollout can batch encoder evaluations
    across burn-in frames and reuse the previous step's next-frame features
    (envs/world_model_env.py). ``__call__`` composes them and is the reference API."""

    cfg: ActorCriticConfig
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.cfg
        self.encoder = ActorCriticEncoder(cfg, dtype=self.dtype)
        self.lstm = LSTMCell(cfg.lstm_dim, dtype=self.dtype)
        self.actor_linear = nn.Dense(cfg.num_actions, dtype=jnp.float32,
                                     kernel_init=nn.initializers.zeros,
                                     bias_init=nn.initializers.zeros)
        self.critic_linear = nn.Dense(1, dtype=jnp.float32,
                                      kernel_init=nn.initializers.zeros,
                                      bias_init=nn.initializers.zeros)

    def encode(self, obs: jnp.ndarray) -> jnp.ndarray:
        """obs: (B, H, W, C) float [-1,1] -> flat features (B, F)."""
        x = self.encoder(obs)
        return x.reshape(x.shape[0], -1)

    def head(self, feat: jnp.ndarray, carry: Carry) -> ActorCriticOutput:
        carry, hx = self.lstm(carry, feat)
        logits_act = self.actor_linear(hx.astype(jnp.float32))
        val = self.critic_linear(hx.astype(jnp.float32))[:, 0]
        return ActorCriticOutput(logits_act, val, carry)

    def __call__(self, obs: jnp.ndarray, carry: Carry) -> ActorCriticOutput:
        """obs: (B, H, W, C) float [-1,1]."""
        return self.head(self.encode(obs), carry)


class ActorCritic:
    """Functional wrapper."""

    def __init__(self, cfg: ActorCriticConfig, dtype: Any = jnp.float32) -> None:
        self.cfg = cfg
        self.net = ActorCriticNet(cfg, dtype=dtype)

    def init(self, rng: jax.Array) -> Variables:
        cfg = self.cfg
        obs = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.img_channels), jnp.float32)
        return self.net.init(rng, obs, self.initial_carry(1))

    def initial_carry(self, batch: int) -> Carry:
        d = self.cfg.lstm_dim
        return (jnp.zeros((batch, d), jnp.float32), jnp.zeros((batch, d), jnp.float32))

    def predict_act_value(self, variables: Variables, obs: jnp.ndarray,
                          carry: Carry) -> ActorCriticOutput:
        """reference: src/models/actor_critic.py:68-73."""
        return self.net.apply(variables, obs, carry)

    def encode(self, variables: Variables, obs: jnp.ndarray) -> jnp.ndarray:
        """Conv trunk only -> (B, F) features (the rollout batches these calls)."""
        return self.net.apply(variables, obs, method="encode")

    def head(self, variables: Variables, feat: jnp.ndarray,
             carry: Carry) -> ActorCriticOutput:
        """LSTM step + actor/critic heads on precomputed features."""
        return self.net.apply(variables, feat, carry, method="head")

    # -- loss ------------------------------------------------------------------

    def loss_from_rollout(
        self,
        act: jnp.ndarray,
        rew: jnp.ndarray,
        end: jnp.ndarray,
        trunc: jnp.ndarray,
        logits_act: jnp.ndarray,
        val: jnp.ndarray,
        val_bootstrap: jnp.ndarray,
        loss_cfg: ActorCriticLossConfig,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """REINFORCE-with-baseline on lambda-returns (reference actor_critic.py:75-98).

        All inputs are (B, T) except logits_act (B, T, A). logits_act and val carry gradients;
        everything else is data.
        """
        c = loss_cfg
        logp = jax.nn.log_softmax(logits_act, axis=-1)
        probs = jnp.exp(logp)
        entropy = (-(probs * logp).sum(axis=-1)).mean()

        lambda_returns = compute_lambda_returns(rew, end, trunc, val_bootstrap, c.gamma,
                                                c.lambda_)
        lambda_returns = jax.lax.stop_gradient(lambda_returns)

        logp_act = jnp.take_along_axis(logp, act[..., None].astype(jnp.int32), axis=-1)[..., 0]
        adv = jax.lax.stop_gradient(lambda_returns - val)
        loss_actions = (-logp_act * adv).mean()
        loss_values = c.weight_value_loss * ((val - lambda_returns) ** 2).mean()
        loss_entropy = -c.weight_entropy_loss * entropy

        loss = loss_actions + loss_entropy + loss_values
        sg = jax.lax.stop_gradient
        metrics = {
            "policy_entropy": sg(entropy) / jnp.log(2.0),
            "loss_actions": sg(loss_actions),
            "loss_entropy": sg(loss_entropy),
            "loss_values": sg(loss_values),
            "loss_total": sg(loss),
        }
        return loss, metrics


def compute_lambda_returns(rew: jnp.ndarray, end: jnp.ndarray, trunc: jnp.ndarray,
                           val_bootstrap: jnp.ndarray, gamma: float,
                           lambda_: float) -> jnp.ndarray:
    """reference: src/models/actor_critic.py:116-143 — reverse accumulation as a lax.scan.

    All inputs (B, T) float. Rewards are sign-clipped here, matching the reference.
    """
    assert rew.ndim == 2
    rew = jnp.sign(rew)
    end = end.astype(jnp.float32)
    trunc = trunc.astype(jnp.float32)
    val_bootstrap = val_bootstrap.astype(jnp.float32)

    end_or_trunc = jnp.clip(end + trunc, max=1.0)
    not_end = 1.0 - end
    not_trunc = 1.0 - trunc

    base = rew + not_end * gamma * (not_trunc * (1 - lambda_) + trunc) * val_bootstrap
    if lambda_ == 0:
        return base

    cont = (1.0 - end_or_trunc) * gamma * lambda_  # (B, T)

    def step(last, xs):
        b_t, c_t = xs
        ret = b_t + c_t * last
        return ret, ret

    _, rets = jax.lax.scan(step, val_bootstrap[:, -1],
                           (base.T, cont.T), reverse=True)
    return rets.T
