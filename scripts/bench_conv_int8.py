"""Measure int8 conv throughput on the UNet's hot shapes (VERDICT round-2 item #2:
int8 rollout inference — v5e MXU int8 peak is 2x bf16; is the 3x3 conv actually 2x?).

Also times the decoder's skip-concat shape (C_in=128 -> C_out=64), which is ~2/3 of the
UNet's conv FLOPs (3 u_blocks per level double the input channels via concat,
reference src/models/blocks.py:240-243).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, k, acc=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def scan_time(body, x, length, iters=6):
    @jax.jit
    def run(x):
        def f(x, _):
            return body(x), None
        y, _ = jax.lax.scan(f, x, None, length=length)
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


def fit(body, x, l1=8, l2=40):
    return (scan_time(body, x, l2) - scan_time(body, x, l1)) / (l2 - l1)


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("64->64 @64^2", (32, 64, 64, 64), (3, 3, 64, 64)),
        ("128->64 @64^2", (32, 64, 64, 128), (3, 3, 128, 64)),
        ("64->64 @32^2", (32, 32, 32, 64), (3, 3, 64, 64)),
        ("128->64 @32^2", (32, 32, 32, 128), (3, 3, 128, 64)),
    ]
    for name, xs, ks in shapes:
        flops = 2 * np.prod(xs[:3]) * 9 * ks[2] * ks[3]

        xb = jnp.asarray(rng.normal(size=xs), dtype=jnp.bfloat16)
        kb = jnp.asarray(rng.normal(size=ks) * 0.05, dtype=jnp.bfloat16)

        def body_bf16(x, kb=kb, ks=ks):
            y = conv(x, kb)
            # keep carry shape == x shape via a 1x1 back-projection when C changes
            if ks[2] != ks[3]:
                y = jnp.concatenate([y, y], axis=-1)
            return y

        t = fit(body_bf16, xb)
        print(f"{name:14s} bf16: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s", flush=True)

        xi = jnp.asarray(rng.integers(-127, 127, xs), dtype=jnp.int8)
        ki = jnp.asarray(rng.integers(-127, 127, ks), dtype=jnp.int8)

        def body_int8(x, ki=ki, ks=ks):
            y = conv(x, ki, acc=jnp.int32)
            y = (y >> 8).astype(jnp.int8)  # cheap requantize stand-in
            if ks[2] != ks[3]:
                y = jnp.concatenate([y, y], axis=-1)
            return y

        try:
            t = fit(body_int8, xi)
            print(f"{name:14s} int8: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} int8: FAILED {type(e).__name__}: {e}", flush=True)

        # realistic int8 path: bf16 activations quantized per-tensor on the fly,
        # int8 weights, int32 accum, rescale to bf16 (what the rollout would run)
        def body_q(x, ki=ki, ks=ks):
            s = 127.0 / (jnp.max(jnp.abs(x)) + 1e-6)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * s), -127, 127).astype(jnp.int8)
            y = conv(xq, ki, acc=jnp.int32)
            y = (y.astype(jnp.float32) / s * 0.01).astype(jnp.bfloat16)
            if ks[2] != ks[3]:
                y = jnp.concatenate([y, y], axis=-1)
            return y

        try:
            t = fit(body_q, xb)
            print(f"{name:14s} q8  : {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} q8  : FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
