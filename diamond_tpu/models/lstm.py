"""LSTM cell with torch-compatible parameterization.

The reference uses ``nn.LSTM``/``nn.LSTMCell`` (reference: src/models/rew_end_model.py:34,
src/models/actor_critic.py:45) with a custom init: xavier-uniform input weights, orthogonal
recurrent weights, zero biases except forget-gate bias 1 (reference: src/utils.py:184-196).

We keep torch's gate ordering (i, f, g, o) and the separate bias_ih/bias_hh so reference
checkpoints convert by transposition alone. Weights are stored as (in, 4H) / (H, 4H) so the
cell is two MXU-friendly matmuls per step; sequences run under ``nn.scan``.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
Carry = Tuple[jnp.ndarray, jnp.ndarray]


def _xavier_uniform_t(key, shape, dtype=jnp.float32):
    """Xavier-uniform matching torch's on the (4H, in) matrix; ours is stored transposed."""
    fan_out, fan_in = shape[1], shape[0]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _orthogonal_t(key, shape, dtype=jnp.float32):
    """Orthogonal over the torch-layout (4H, H) matrix, stored transposed as (H, 4H)."""
    return jax.nn.initializers.orthogonal()(key, (shape[1], shape[0]), dtype).T


def _bias_forget_one(key, shape, dtype=jnp.float32):
    """Zeros with the forget-gate quarter set to 1 (reference: src/utils.py:189-193)."""
    del key
    b = jnp.zeros(shape, dtype)
    n = shape[0]
    return b.at[n // 4: n // 2].set(1.0)


class LSTMCell(nn.Module):
    """Single-step LSTM cell, torch gate order (i, f, g, o).

    Signature is scan-compatible: ``(carry, x) -> (carry, h)`` with carry ``(hx, cx)``.
    """

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: Carry, x: jnp.ndarray) -> Tuple[Carry, jnp.ndarray]:
        hx, cx = carry
        d = self.hidden_dim
        w_ih = self.param("weight_ih", _xavier_uniform_t, (x.shape[-1], 4 * d), jnp.float32)
        w_hh = self.param("weight_hh", _orthogonal_t, (d, 4 * d), jnp.float32)
        b_ih = self.param("bias_ih", _bias_forget_one, (4 * d,), jnp.float32)
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * d,), jnp.float32)

        from ..ops import quant

        dt = self.dtype
        if (quant.active() and not quant.calibrating()
                and self.has_variable("quant", "act_scale")):
            # static-int8 gate matmuls inside the stop-gradient rollout (ops/quant.py,
            # site kind "lstm", VERDICT round-3 item #2). The input-side per-channel
            # scales are calibrated by the LSTM wrapper OUTSIDE the nn.scan (tracers
            # cannot escape a scan body into the registry); the hidden side needs no
            # calibration at all: h = o*tanh(c) with o in (0,1) is strictly |h| < 1,
            # so its scale is the static bound 1.0.
            x_max = self.get_variable("quant", "act_scale")
            gates = (quant.matmul_q8_static(x, w_ih, x_max)
                     + quant.matmul_q8_static(hx, w_hh, jnp.ones((d,), jnp.float32))
                     + (b_ih + b_hh)).astype(dt)
        else:
            gates = (x.astype(dt) @ w_ih.astype(dt) + hx.astype(dt) @ w_hh.astype(dt)
                     + (b_ih + b_hh).astype(dt))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        # carry stays float32 (scan-carry dtype stability + LSTM state accumulates over
        # many steps); only the gate matmuls run in the compute dtype
        new_c = (f * cx.astype(dt) + i * g).astype(jnp.float32)
        new_h = (o * jnp.tanh(new_c).astype(dt)).astype(jnp.float32)
        return (new_h, new_c), new_h


class LSTM(nn.Module):
    """Run the cell over the time axis of (B, T, D) inputs; mirrors torch
    ``nn.LSTM(batch_first=True)`` with one layer. Params live under ``cell/`` with the same
    names as a bare LSTMCell."""

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, carry: Carry) -> Tuple[jnp.ndarray, Carry]:
        from ..ops import quant

        if quant.active() and quant.calibrating():
            # Record the cell's input-side per-channel |x| maxima HERE, before the scan:
            # the registry holds concrete/outer tracers and scan-body tracers cannot
            # escape into it. The max over (B, T) equals the max the cell would see
            # per step. The leaf lands at the cell's own path so the cell reads it back
            # as its "quant" variable (broadcast below).
            quant.record((*self.path, "cell", "act_scale"),
                         jnp.max(jnp.abs(xs.astype(jnp.float32)),
                                 axis=tuple(range(xs.ndim - 1))), "lstm")
        scan_cell = nn.scan(
            LSTMCell,
            variable_broadcast=["params", "quant"],
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.hidden_dim, dtype=self.dtype, name="cell")
        carry, hs = scan_cell(carry, xs)
        return hs, carry
