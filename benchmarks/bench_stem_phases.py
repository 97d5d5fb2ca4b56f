"""Where does the pooled stem kernel's time go? (round-5 groundwork)

Times the pooled K2 stem matmul with the kernel's _DEBUG ablations:

  full        the real kernel (conv + in-kernel 1x3x3/2 max-pool)
  skip_build  P assembly disabled: measures dot + pool + DMA on garbage
              VMEM (upper-bounds what a zero-cost P-build could reach)
  one_jw      1 of the 4 jw tap-dots: isolates the MXU share
  skip_dot    dots skipped, pool machinery still runs on zeros

WRONG NUMERICS under every ablation except `full` — measurement only.
The gap (full - skip_build) is the VPU P-assembly cost the ROADMAP
round-5 candidate (#3, one-hot-matmul P-build) would attack.

Usage: python benchmarks/bench_stem_phases.py [b] [t]   (default 8 32)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(b=8, t=32, img=256):
    import jax
    import jax.numpy as jnp

    from tubelet_transformer_tpu.ops.pallas import stem as S
    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    # bf16 like the model's stem path (csn.py casts to compute dtype)
    x = jnp.asarray(rng.normal(0, 1, (b, t, img, img, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, .05, (3, 7, 7, 3, 64)), jnp.bfloat16)
    sc = jnp.ones((64,), jnp.float32)
    bi = jnp.zeros((64,), jnp.float32)
    xd = jax.jit(S.stem_prep)(x)

    def timed(tag):
        # _DEBUG flags are read at trace time -> each setting is its own
        # compile. NOTE: wrapping this kernel alone in a fori_loop crashes
        # the remote TPU compiler (CHECK "limits[i] <= dim(i)", regardless
        # of how the carry is threaded — the full-model loop in bench.py
        # is fine), so this probe times N QUEUED sequential dispatches and
        # differences two N values: async dispatch keeps the device queue
        # full, and the N-diff cancels the relay RTT + dispatch overheads.
        # A scalar SLICE of the kernel output crashes the compiler too
        # (same CHECK) — slicing into the custom-call result is the
        # trigger. A full-tensor reduce avoids it and adds the same
        # ~0.16 ms (134 MB read) to every variant, cancelling in the
        # phase comparison.
        @jax.jit
        def once(xd_, w_):
            y = S.stem_from_xd(xd_, x.shape, x.dtype, w_, sc, bi,
                               relu=True, pool=True)
            # the barrier keeps XLA from fusing the reduce into the
            # custom-call output's reshape, which trips the same CHECK
            y = jax.lax.optimization_barrier(y)
            return jnp.sum(y.astype(jnp.float32))

        def run(n):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = once(xd, w)
            jax.device_get(r)
            return time.perf_counter() - t0

        run(2)  # compile + warm
        best = float("inf")
        for _ in range(5):
            lo = run(5)
            hi = run(45)
            best = min(best, (hi - lo) / 40)
        print(f"{tag:12s} {best * 1e3:7.3f} ms/call", flush=True)
        return best

    results = {}
    results["full"] = timed("full")
    for flag in ("skip_build", "one_jw", "skip_dot"):
        S._DEBUG[flag] = True
        try:
            results[flag] = timed(flag)
        finally:
            S._DEBUG[flag] = False

    import json

    print(json.dumps({
        "metric": "stem_pool_k2_phase_split_ms",
        "batch": b, "t": t,
        **{k: round(v * 1e3, 3) for k, v in results.items()},
        "build_share_ms": round((results["full"]
                                 - results["skip_build"]) * 1e3, 3),
    }))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(b, t)
