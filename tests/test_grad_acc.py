"""Gradient-accumulation conventions (reference trainer.py:368-379 sums micro-grads without
rescaling; our default averages them — tpu.grad_acc_sum=True restores reference parity).
This pins the optax construction used by Trainer.build_tx."""

import jax.numpy as jnp
import numpy as np
import optax


def _inner(lr=0.1, clip=10.0):
    return optax.chain(optax.clip_by_global_norm(clip), optax.sgd(lr))


def _run(tx, grads):
    params = jnp.array([1.0, 2.0])
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update(g, st, params)
        params = optax.apply_updates(params, upd)
    return np.asarray(params)


def test_grad_acc_sum_matches_reference_sum():
    k = 2
    g1, g2 = jnp.array([0.1, -0.2]), jnp.array([0.3, 0.1])
    # our parity construction: scale by k inside MultiSteps (mean * k == unscaled sum)
    tx = optax.MultiSteps(optax.chain(optax.scale(float(k)), _inner()), k)
    ours = _run(tx, [g1, g2])
    # the reference applies clip+step once to the raw SUM of micro-grads
    ref = _run(_inner(), [g1 + g2])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_grad_acc_mean_default():
    k = 2
    g1, g2 = jnp.array([0.1, -0.2]), jnp.array([0.3, 0.1])
    tx = optax.MultiSteps(_inner(), k)
    ours = _run(tx, [g1, g2])
    ref = _run(_inner(), [(g1 + g2) / 2])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
