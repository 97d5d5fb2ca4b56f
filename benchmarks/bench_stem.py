"""Micro-benchmark: irCSN stem conv 3x7x7 s(1,2,2) formulations on TPU.

The stem is the single hottest op in the round-1 profile (6.6 ms of the
27.5 ms bs=4 forward): C_in=3 starves the MXU's contraction dimension.
This bench compares mathematically-equal formulations so the backbone can
dispatch to the fastest:

  conv3d      direct lax.conv_general_dilated (XLA's choice)
  conv2d_t    temporal decomposition: 3 x 2D 7x7 stride-2 convs + T-shifts
  s2d         space-to-depth(2x2): 3x4x4 conv, C_in=12, stride 1 (exact)
  s2d2d       s2d + temporal decomposition combined (2D 4x4 C=12 convs)
  patches     im2col (conv_general_dilated_patches) + 441x64 matmul

Timing: K iterations inside one jitted fori_loop (carry chained into the
input so nothing hoists), scalar fetch to synchronize, difference of two K
values (axon relay: block_until_ready does not wait; see bench.py).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_variants(jnp, lax):
    def conv3d(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 2, 2), [(1, 1), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv2d_t(x, w):
        b, t, h, wd, c = x.shape
        xf = x.reshape(b * t, h, wd, c)
        ys = []
        for kt in range(3):
            y = lax.conv_general_dilated(
                xf, w[kt], (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            ys.append(y.reshape(b, t, h // 2, wd // 2, -1))
        z = jnp.zeros_like(ys[0][:, :1])
        # out[t] = y0[t-1] + y1[t] + y2[t+1]
        out = (jnp.concatenate([z, ys[0][:, :-1]], axis=1) + ys[1]
               + jnp.concatenate([ys[2][:, 1:], z], axis=1))
        return out

    def _s2d_input(x):
        b, t, h, wd, c = x.shape
        xp = jnp.pad(x, [(0, 0), (0, 0), (3, 3), (3, 3), (0, 0)])
        hp, wp = h + 6, wd + 6
        xs = xp.reshape(b, t, hp // 2, 2, wp // 2, 2, c)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6)
        return xs.reshape(b, t, hp // 2, wp // 2, 4 * c)

    def _s2d_kernel(w, jnp):
        # w (3,7,7,C,O) -> (3,4,4, 2*2*C, O); tap (2j+r) of the stride-2
        # kernel lands on s2d plane r at offset j; j=3,r=1 is zero.
        kt, kh, kw, c, o = w.shape
        ws = np.zeros((3, 4, 4, 2, 2, c, o), w.dtype)
        ws = jnp.zeros((3, 4, 4, 2, 2, c, o), w.dtype)
        for jh in range(4):
            for rh in range(2):
                if 2 * jh + rh > 6:
                    continue
                for jw in range(4):
                    for rw in range(2):
                        if 2 * jw + rw > 6:
                            continue
                        ws = ws.at[:, jh, jw, rh, rw].set(
                            w[:, 2 * jh + rh, 2 * jw + rw])
        return ws.reshape(3, 4, 4, 4 * c, o)

    def s2d(x, w):
        xs = _s2d_input(x)
        ws = _s2d_kernel(w, jnp)
        return lax.conv_general_dilated(
            xs, ws, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def s2d2d(x, w):
        xs = _s2d_input(x)
        ws = _s2d_kernel(w, jnp)
        b, t, h2, w2, c12 = xs.shape
        xf = xs.reshape(b * t, h2, w2, c12)
        ys = []
        for kt in range(3):
            y = lax.conv_general_dilated(
                xf, ws[kt], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            ys.append(y.reshape(b, t, h2 - 3, w2 - 3, -1))
        z = jnp.zeros_like(ys[0][:, :1])
        return (jnp.concatenate([z, ys[0][:, :-1]], axis=1) + ys[1]
                + jnp.concatenate([ys[2][:, 1:], z], axis=1))

    def patches(x, w):
        b, t, h, wd, c = x.shape
        p = lax.conv_general_dilated_patches(
            x, (3, 7, 7), (1, 2, 2), [(1, 1), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        # patches feature order is (C, kt, kh, kw)
        wf = w.transpose(3, 0, 1, 2, 4).reshape(-1, w.shape[-1])
        return jnp.einsum("bthwk,ko->bthwo", p, wf)

    def pallas(x, w):
        import jax.numpy as jnp
        from tubelet_transformer_tpu.ops.pallas.stem import _stem_pallas
        ones = jnp.ones((64,), jnp.float32)
        zeros = jnp.zeros((64,), jnp.float32)
        return _stem_pallas(x, w, ones, zeros, relu=False).transpose(
            0, 1, 3, 4, 2)

    return {"conv3d": conv3d, "conv2d_t": conv2d_t, "s2d": s2d,
            "s2d2d": s2d2d, "patches": patches, "pallas": pallas}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bs = int(os.environ.get("BS", "4"))
    t_len, img = 32, 256
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, t_len, img, img, 3)), dtype)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 7, 7, 3, 64)), dtype)

    variants = build_variants(jnp, lax)
    only = sys.argv[1:] or list(variants)

    # correctness vs conv3d first (small shapes; pallas needs W' % 128 == 0
    # and runs bf16 internally, so it gets its own shape and tolerance)
    for name in only:
        if name == "pallas":
            xs = jnp.asarray(rng.normal(0, 1, (1, 4, 64, 256, 3)), dtype)
            tol = 0.1
        else:
            xs = jnp.asarray(rng.normal(0, 1, (1, 4, 32, 32, 3)), jnp.float32)
            tol = 1e-3
        ws = jnp.asarray(rng.normal(0, 0.05, (3, 7, 7, 3, 64)), xs.dtype)
        ref = np.asarray(jax.jit(variants["conv3d"])(xs, ws), np.float32)
        got = np.asarray(jax.jit(variants[name])(xs, ws), np.float32)
        err = np.abs(got - ref).max()
        status = "OK" if err < tol else f"MISMATCH {err:.2e}"
        print(f"parity {name:10s} {status}  (max|d|={err:.2e})", flush=True)

    flops = 2 * bs * t_len * (img // 2) ** 2 * 64 * (3 * 7 * 7 * 3)

    def timed(fn, k_lo=2, k_hi=10):
        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(x, w, k):
            def body(i, c):
                out = fn((x * (1 + c * 1e-12)).astype(x.dtype), w)
                return jnp.sum(out.astype(jnp.float32))
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        def run(k):
            best = float("inf")
            float(loop(x, w, k))  # compile+warm
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, w, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)

    for name in only:
        dt = timed(variants[name])
        print(f"{name:10s} {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
