"""Measure alternative lowerings of the U-Net's hot 3x3 convs on TPU (VERDICT item 2b).

The imagination rollout is conv-bound; the default XLA conv at 64 output channels measured
~31 TFLOP/s (16% of v5e bf16 peak). Candidates measured here, all value-forced timing:
  * baseline lax.conv_general_dilated NHWC
  * raw dot_general at the matmul shapes an im2col lowering would produce
  * explicit im2col (conv_general_dilated_patches + dot)
  * space-to-depth: 2x2 s2d -> equivalent 2x2-kernel conv at half resolution with 4x
    channels -> depth-to-space (dense-MXU formulation, 1.78x FLOPs but N=256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 32, 64, 64
T = 15  # scan length


ITERS = 10  # chained dispatches per timing rep (amortizes the ~25 ms tunnel round trip)


def timeit(name, fn, *args, flops=None):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / ITERS)
    per = best / T
    tf = f"  {flops / per / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:55s} {per * 1e3:8.3f} ms{tf}")
    return per


def scan(f, x):
    def body(c, _):
        return f(c), None
    y, _ = jax.lax.scan(body, x, None, length=T)
    return y


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    k = jax.random.PRNGKey(0)
    x64 = jax.random.normal(k, (B, H, W, 64), jnp.bfloat16)
    w64 = jax.random.normal(k, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    x128 = jax.random.normal(k, (B, H, W, 128), jnp.bfloat16)
    w128_64 = jax.random.normal(k, (3, 3, 128, 64), jnp.bfloat16) * 0.05

    f_conv = 2 * B * H * W * 9 * 64 * 64
    f_conv128 = 2 * B * H * W * 9 * 128 * 64

    # 1) baselines
    timeit("conv 3x3 64->64 @64^2 (baseline)",
           jax.jit(lambda x: scan(lambda y: conv(y, w64), x)), x64, flops=f_conv)
    timeit("conv 3x3 128->64 @64^2 (u-block shape)",
           jax.jit(lambda x: scan(
               lambda y: jnp.concatenate([conv(y, w128_64), y[..., :64]], -1), x128)),
           x128, flops=f_conv128)

    # 2) raw dot_general ceilings for candidate matmul shapes
    for (m, kk, n) in [(B * H * W, 576, 64), (B * H * W // 2, 768, 128),
                       (B * H * W // 4, 1024, 256), (B * H * W, 576, 128),
                       (B * H * W, 1152, 64)]:
        a = jax.random.normal(k, (m, kk), jnp.bfloat16)
        b = jax.random.normal(k, (kk, n), jnp.bfloat16) * 0.05
        fl = 2 * m * kk * n

        def mk(b_):
            def f(a_):
                y = a_ @ b_
                # keep shape for scan: project back
                return (y @ jnp.ones((n, kk), jnp.bfloat16) * 1e-3).astype(jnp.bfloat16)
            return f
        timeit(f"dot ({m},{kk})@({kk},{n})",
               jax.jit(lambda a_, b_=b: scan(mk(b_), a_)), a, flops=fl)

    # 3) explicit im2col + dot
    def im2col_conv(x, w):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches: (B, H, W, 9*64) with channel-major order C*9? verify numerics below
        y = p.reshape(-1, p.shape[-1]) @ w.reshape(-1, 64)
        return y.reshape(B, H, W, 64)

    # numeric check of patch ordering: conv_general_dilated_patches returns channels
    # ordered (C_in, KH, KW) in the feature dim; kernel HWIO reshape is (KH, KW, C_in)
    # -> build the matching weight matrix by transpose.
    p_test = jax.lax.conv_general_dilated_patches(
        x64[:1], (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w_mat = jnp.transpose(w64, (2, 0, 1, 3)).reshape(576, 64)  # (C,KH,KW) order
    y_ref = conv(x64[:1], w64)
    y_im2col = (p_test.reshape(-1, 576) @ w_mat).reshape(1, H, W, 64)
    err = float(jnp.abs(y_ref - y_im2col).max())
    print(f"im2col numeric max err: {err:.4f}")

    def im2col_conv2(x):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = p.reshape(-1, 576) @ w_mat
        return y.reshape(B, H, W, 64).astype(jnp.bfloat16)

    timeit("im2col patches+dot 64->64 @64^2",
           jax.jit(lambda x: scan(im2col_conv2, x)), x64, flops=f_conv)

    # 4) space-to-depth conv: y = conv3x3(x) computed as s2d(x) -> conv2x2(256->256) -> d2s
    def s2d(x):  # (B,H,W,C) -> (B,H/2,W/2,4C), block order (dy,dx)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)

    def d2s(x):
        b, h, w, c4 = x.shape
        c = c4 // 4
        x = x.reshape(b, h, w, 2, 2, c)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, c)

    # Build the equivalent s2d-space kernel (4C_in -> 4C_out) from the 3x3 kernel.
    # Output pixel at block (I,J), offset (oy,ox) in {0,1}: y[2I+oy, 2J+ox] =
    # sum_{ky,kx} w[ky,kx] x[2I+oy+ky-1, 2J+ox+kx-1]. Input rows span 2I-1..2I+2 ->
    # blocks I-1, I, I+1 across offsets, so the s2d conv kernel is 3x3 in block space
    # (structured zeros; 4x the dense FLOPs but N=256 fills the MXU).
    def build_s2d_kernel(w):
        kh, kw, cin, cout = w.shape  # 3,3,C,C
        wk = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
        w_np = np.asarray(w, np.float32)
        for oy in range(2):
            for ox in range(2):
                for ky in range(3):
                    for kx in range(3):
                        iy_abs = oy + ky - 1  # -1..2 relative to row 2I
                        ix_abs = ox + kx - 1
                        By, iy = divmod(iy_abs + 2, 2)
                        Bx, ix = divmod(ix_abs + 2, 2)
                        ti, tj = By, Bx  # block offset -1..1 -> kernel tap 0..2
                        in_off = (iy * 2 + ix) * cin
                        out_off = (oy * 2 + ox) * cout
                        wk[ti, tj, in_off:in_off + cin, out_off:out_off + cout] += w_np[ky, kx]
        return jnp.asarray(wk, jnp.bfloat16)

    wk = build_s2d_kernel(w64)

    def s2d_conv(x):
        xs = s2d(x)
        y = jax.lax.conv_general_dilated(
            xs, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return d2s(y)

    y_s2d = s2d_conv(x64[:8])
    y_ref8 = conv(x64[:8], w64)
    err2 = float(jnp.abs(y_ref8 - y_s2d).max())
    print(f"s2d numeric max err: {err2:.4f}")

    timeit("s2d 2x2-conv(256->256)@32^2 + d2s",
           jax.jit(lambda x: scan(lambda y: s2d_conv(y).astype(jnp.bfloat16), x)),
           x64, flops=f_conv)  # report vs ORIGINAL conv flops (real speed comparison)

    # 5) conv with 128 output channels then slice (pad N to MXU width)
    w64_128 = jnp.concatenate([w64, w64], axis=-1)

    def conv_pad_n(x):
        return conv(x, w64_128)[..., :64]

    timeit("conv 3x3 64->128-then-slice @64^2",
           jax.jit(lambda x: scan(lambda y: conv_pad_n(y).astype(jnp.bfloat16), x)),
           x64, flops=f_conv)


if __name__ == "__main__":
    main()
