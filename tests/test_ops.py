"""Pallas kernels validated in interpreter mode against their XLA references
(the target platform's Mosaic compile path is currently unavailable — see ops/__init__.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from diamond_tpu.ops import conv3x3_im2col, fused_adagn_silu, fused_groupnorm_silu

B, H, W, C = 2, 8, 8, 8
GROUPS = 2


def ref_gn(x, num_groups):
    xf = np.asarray(x, np.float32)
    b, h, w, c = xf.shape
    xg = xf.reshape(b, h * w, num_groups, c // num_groups)
    m = xg.mean(axis=(1, 3), keepdims=True)
    v = xg.var(axis=(1, 3), keepdims=True)
    return ((xg - m) / np.sqrt(v + 1e-5)).reshape(b, h, w, c)


def silu(x):
    return x / (1 + np.exp(-x))


def test_fused_groupnorm_silu_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)) * 3 + 1
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    y = fused_groupnorm_silu(x, scale, bias, GROUPS, interpret=True)
    ref = ref_gn(x, GROUPS) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(y), silu(ref), rtol=2e-4, atol=2e-4)


def test_fused_adagn_silu_matches_blocks_semantics():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ss = jnp.asarray(rng.normal(size=(B, 2 * C)).astype(np.float32))
    y = fused_adagn_silu(x, ss, GROUPS, interpret=True)
    scale = np.asarray(ss)[:, None, None, :C]
    shift = np.asarray(ss)[:, None, None, C:]
    ref = ref_gn(x, GROUPS) * (1 + scale) + shift
    np.testing.assert_allclose(np.asarray(y), silu(ref), rtol=2e-4, atol=2e-4)


def test_conv3x3_im2col_matches_xla_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, C, 2 * C)).astype(np.float32) * 0.2)
    y = conv3x3_im2col(x, k, block_h=4, interpret=True)
    ref = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4)
