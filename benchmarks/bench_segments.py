"""Segment profile of the flagship CSN-152 TubeR forward on TPU.

Times nested prefixes of the model (stem, stem+layer1, full trunk, full
model) with the in-graph K-loop methodology (see bench.py) and prints the
per-segment deltas.  Run after any kernel/model change to re-rank hotspots.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tubelet_transformer_tpu.models import csn as csn_mod
    from tubelet_transformer_tpu.models.tuber import build_model
    from __graft_entry__ import _flagship_cfg

    bs = int(os.environ.get("BS", "4"))
    cfg = _flagship_cfg()
    t_len, img = cfg.data.temp_len, cfg.data.img_size
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(0, 1, (bs, t_len, img, img, 3)), np.float32)

    def timed(apply_fn, variables, k_lo=2, k_hi=8):
        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(v, x, k):
            def body(i, c):
                out = apply_fn(v, (x * (1 + c * 1e-12)).astype(x.dtype))
                return jnp.sum(out.astype(jnp.float32))
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        def run(k):
            float(loop(variables, clips, k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(variables, clips, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)

    results = {}

    # trunk prefixes via block_nums overrides
    for name, blocks in [("stem", (0, 0, 0, 0)), ("l1", (3, 0, 0, 0)),
                         ("l12", (3, 8, 0, 0)), ("trunk", (3, 8, 36, 3))]:
        csn_mod.BLOCK_NUMS["SEG"] = blocks
        m = csn_mod.build_csn("SEG", last_stride=False, dtype=dtype)
        v = jax.jit(lambda r: m.init({"params": r}, clips[:1, :, :64, :256],
                                     train=False))(jax.random.PRNGKey(0))
        results[name] = timed(
            lambda vv, x: m.apply(vv, x, train=False), v)
        print(f"{name:6s} {results[name]*1e3:7.2f} ms", flush=True)

    model = build_model(cfg)
    v = jax.jit(lambda r: model.init({"params": r},
                                     np.zeros((1, t_len, img, img, 3),
                                              np.float32),
                                     train=False))(jax.random.PRNGKey(0))
    results["full"] = timed(
        lambda vv, x: model.apply(vv, x, train=False)["pred_logits"], v)
    print(f"full   {results['full']*1e3:7.2f} ms", flush=True)

    print("--- deltas ---")
    print(f"stem        {results['stem']*1e3:7.2f} ms")
    print(f"layer1      {(results['l1'] - results['stem'])*1e3:7.2f} ms")
    print(f"layer2      {(results['l12'] - results['l1'])*1e3:7.2f} ms")
    print(f"layer3+4    {(results['trunk'] - results['l12'])*1e3:7.2f} ms")
    print(f"heads+xfmr  {(results['full'] - results['trunk'])*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
