"""Layer1-scale depthwise microbench: XLA 3D vs Pallas v2 vs T-folded 2D.

Method per bench.py header: K-loop differencing inside one jitted program
(dynamic_update_slice perturbation so XLA cannot hoist), one host fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(b=2, t=32, hw=64, c=64):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tubelet_transformer_tpu.ops.pallas import depthwise as dw

    dtype = jnp.bfloat16
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (b, t, hw, hw, c)), dtype)
    w = jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (3, 3, 3, c)),
                    jnp.float32).astype(dtype)

    def bfold(x_):
        # Depthwise conv is independent per channel AND per batch item, so
        # two batch items stacked along channels (with the filter tiled 2x)
        # compute the identical result while filling the 128-lane registers
        # that C=64 leaves half-empty (round-4 layer1 attack).
        bb = x_.shape[0]
        x2 = jnp.concatenate([x_[: bb // 2], x_[bb // 2:]], axis=-1)
        y2 = dw._dw_lax(x2, jnp.tile(w, (1, 1, 1, 2)))
        return jnp.concatenate([y2[..., :c], y2[..., c:]], axis=0)

    impls = {
        "xla3d": lambda x_: dw._dw_lax(x_, w),
        "tfold": lambda x_: dw._dw_tfold(x_, w),
    }
    if b % 2 == 0 and c < 128:
        impls["bfold"] = bfold
    if jax.default_backend() == "tpu" and os.environ.get("BENCH_PALLAS"):
        # t_blk=2: the default t_blk=4 VMEM-OOMs at layer1 scale (W*C=4096)
        impls["pallas_v2"] = lambda x_: dw._dw_pallas_v2(x_, w, t_blk=2)

    # correctness first
    ref = np.asarray(impls["xla3d"](x), np.float32)
    for name, fn in impls.items():
        got = np.asarray(fn(x), np.float32)
        err = np.abs(got - ref).max()
        print(f"# {name}: max err vs xla3d = {err:.4f}", file=sys.stderr)
        assert err < 0.5, (name, err)

    def timed(fn, k):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                xp = jax.lax.dynamic_update_slice(
                    x0, (carry[None, None, None, None, None]
                         ).astype(dtype), (0, 0, 0, 0, 0))
                out = fn(xp)
                # sum the FULL output: a single-element readout lets XLA
                # slice back through the conv and dead-code-eliminate the
                # work (measured: "-0.01 ms/call" for the xla3d variant)
                return jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(loop(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = (4, 24) if jax.default_backend() == "tpu" else (1, 3)
    for name, fn in impls.items():
        tl, th = timed(fn, k_lo), timed(fn, k_hi)
        per = (th - tl) / (k_hi - k_lo)
        print(f"{name}: {per * 1e3:.3f} ms/call  "
              f"({per * 1e6 / (b * t):.1f} us/frame)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
