"""MXU-friendly 3x3-conv lowerings are exact reformulations of the XLA conv
(ops/conv_lowering.py), and the flax wrapper keeps nn.Conv's parameter tree."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.ops.conv_lowering import conv3x3_lowered


@pytest.mark.parametrize("mode", ["paired", "im2col", "s2d"])
@pytest.mark.parametrize("shape", [(2, 8, 8, 16, 16), (2, 8, 8, 16, 32), (1, 4, 6, 8, 8)])
def test_lowerings_match_xla(mode, shape):
    b, h, w, cin, cout = shape
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, h, w, cin), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.1
    ref = conv3x3_lowered(x, kern, 1, "xla")
    alt = conv3x3_lowered(x, kern, 1, mode)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_odd_width_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 5, 8), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8), jnp.float32)
    ref = conv3x3_lowered(x, kern, 1, "xla")
    for mode in ("paired", "s2d"):
        np.testing.assert_allclose(np.asarray(conv3x3_lowered(x, kern, 1, mode)),
                                   np.asarray(ref), rtol=1e-5)


def test_strided_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8), jnp.float32)
    ref = conv3x3_lowered(x, kern, 2, "xla")
    for mode in ("paired", "im2col", "s2d"):
        np.testing.assert_allclose(np.asarray(conv3x3_lowered(x, kern, 2, mode)),
                                   np.asarray(ref), rtol=1e-5)


@pytest.mark.slow
def test_flax_wrapper_param_tree_and_values():
    """DIAMOND_TPU_CONV changes only the lowering: same param tree, same outputs for the
    same init key. Run in a subprocess (the switch is read at import)."""
    code = """
import os, sys
mode = sys.argv[1]
assert os.environ["DIAMOND_TPU_CONV"] == mode
import jax
jax.config.update("jax_platform_name", "cpu")
import jax.numpy as jnp, numpy as np
from diamond_tpu.models.blocks import Conv3x3
m = Conv3x3(16, jnp.float32, name="c")
x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8), jnp.float32)
v = m.init(jax.random.PRNGKey(0), x)
paths = sorted("/".join(map(str, jax.tree_util.tree_flatten_with_path(v)[0][i][0]))
               for i in range(len(jax.tree_util.tree_leaves(v))))
y = m.apply(v, x)
np.save(f"/tmp/conv_lowering_{mode}.npy", np.asarray(y))
print(";".join(paths))
"""
    outs = {}
    for mode in ("xla", "paired"):
        # CPU must be forced in the child's *environment*: sitecustomize pre-imports jax
        # before any line of the -c script runs, so an in-script setdefault is too late and
        # the child would touch the (possibly wedged) TPU tunnel. Dropping PALLAS_AXON_*
        # skips the tunnel PJRT registration entirely — it can BLOCK the child's `import
        # jax` for minutes when the platform is wedged, even with JAX_PLATFORMS=cpu set.
        env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
        env.update({"DIAMOND_TPU_CONV": mode,
                    "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"})
        r = subprocess.run([sys.executable, "-c", code, mode], capture_output=True,
                           text=True, cwd="/root/repo", timeout=300, env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[mode] = r.stdout.strip().splitlines()[-1]
    assert outs["xla"] == outs["paired"]  # identical param trees
    a = np.load("/tmp/conv_lowering_xla.npy")
    b = np.load("/tmp/conv_lowering_paired.npy")
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
