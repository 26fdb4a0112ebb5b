"""Golden test of lambda-returns against a literal numpy transcription of the reference's
reverse loop (reference: src/models/actor_critic.py:116-143)."""

import numpy as np
import jax.numpy as jnp

from diamond_tpu.models import compute_lambda_returns


def reference_lambda_returns(rew, end, trunc, val_bootstrap, gamma, lambda_):
    rew = np.sign(rew)
    end_or_trunc = np.clip(end + trunc, None, 1)
    not_end = 1 - end
    not_trunc = 1 - trunc
    lr = rew + not_end * gamma * (not_trunc * (1 - lambda_) + trunc) * val_bootstrap
    if lambda_ == 0:
        return lr
    last = val_bootstrap[:, -1].copy()
    for t in reversed(range(rew.shape[1])):
        lr[:, t] += (1 - end_or_trunc[:, t]) * gamma * lambda_ * last
        last = lr[:, t].copy()
    return lr


def _random_case(rng, b=4, t=15):
    rew = rng.normal(size=(b, t)) * 3
    end = (rng.random((b, t)) < 0.15).astype(np.float64)
    trunc = (rng.random((b, t)) < 0.1).astype(np.float64)
    trunc = trunc * (1 - end)  # not both
    val = rng.normal(size=(b, t))
    return rew, end, trunc, val


def test_lambda_returns_match_reference_loop():
    rng = np.random.default_rng(0)
    for lam in (0.95, 0.0, 1.0):
        rew, end, trunc, val = _random_case(rng)
        ours = np.asarray(compute_lambda_returns(
            jnp.asarray(rew, jnp.float32), jnp.asarray(end, jnp.float32),
            jnp.asarray(trunc, jnp.float32), jnp.asarray(val, jnp.float32), 0.985, lam))
        ref = reference_lambda_returns(rew, end, trunc, val, 0.985, lam)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_lambda_returns_terminal_cases():
    # Single step, end=1: return is just the clipped reward.
    ours = np.asarray(compute_lambda_returns(
        jnp.asarray([[5.0]]), jnp.asarray([[1.0]]), jnp.asarray([[0.0]]),
        jnp.asarray([[9.0]]), 0.99, 0.95))
    np.testing.assert_allclose(ours, [[1.0]])
    # Single step, trunc=1: reward + gamma * bootstrap.
    ours = np.asarray(compute_lambda_returns(
        jnp.asarray([[0.5]]), jnp.asarray([[0.0]]), jnp.asarray([[1.0]]),
        jnp.asarray([[2.0]]), 0.99, 0.95))
    np.testing.assert_allclose(ours, [[1.0 + 0.99 * 2.0]], rtol=1e-6)
