"""Hardware-time the standalone 3x3 conv candidates at the rollout's hot shape
(VERDICT round-2 item #1: settle the 25%->50%-of-peak ceiling question with data).

Shapes: (32, 64, 64, C) x (3, 3, C, C) bf16 for C in {64, 128} — the two channel widths
of the default UNet (reference src/config/agent/default.yaml).

Timing: two-scan-length fit (CLAUDE.md: block_until_ready does not wait over the tunnel;
a value must be materialized and the ~ms dispatch overhead cancelled by fitting
time(L2)-time(L1) over L2-L1 scan steps).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diamond_tpu.ops.conv3x3 import conv3x3_im2col


def scan_time(fn, x, k, length, iters=6):
    @jax.jit
    def run(x):
        def body(x, _):
            return fn(x, k), None
        y, _ = jax.lax.scan(body, x, None, length=length)
        return y

    y = run(x)
    _ = float(y.astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = run(x)
        _ = float(y.astype(jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def fit(fn, x, k, l1=8, l2=40):
    t1 = scan_time(fn, x, k, l1)
    t2 = scan_time(fn, x, k, l2)
    return (t2 - t1) / (l2 - l1)


def conv_xla(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    for c in (64, 128):
        x = jnp.asarray(rng.normal(size=(32, 64, 64, c)), dtype=jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype=jnp.bfloat16)
        flops = 2 * 32 * 64 * 64 * 9 * c * c

        # correctness first (f32 tolerance on bf16 data)
        y_ref = conv_xla(x, k)
        y_pal = conv3x3_im2col(x, k)
        err = float(jnp.abs(y_ref.astype(jnp.float32) - y_pal.astype(jnp.float32)).max())
        print(f"C={c}: max |xla - pallas| = {err:.4f}", flush=True)

        for name, fn in (("xla", conv_xla), ("pallas_im2col", conv3x3_im2col)):
            try:
                per = fit(fn, x, k)
                print(f"C={c} {name:14s}: {per * 1e3:7.3f} ms  "
                      f"{flops / per / 1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"C={c} {name:14s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
