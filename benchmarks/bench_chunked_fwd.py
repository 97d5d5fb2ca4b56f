"""Chunked inference forward: run a large batch as lax.map over bs=2 chunks.

Round-3 VERDICT #4 diagnosis (BASELINE.md "Batch scaling"): the conv
emitter's layer1/layer2 fusions run 2.5-3.3x slower at bs=4 than at bs=2
(not 2x), making per-clip cost 12-16% worse at the batch sizes the serving
pool uses. If the bs=2 kernels are the efficient ones, a batched forward
that reshapes (B, ...) -> (B/2, 2, ...) and lax.map's the bs=2 model over
the leading axis should recover bs=2 per-clip efficiency at any batch —
one compiled body, sequential chunks, same results.

Measures plain vs chunked forward at the given batch sizes and prints one
JSON line per (bs, variant) with the K-loop-differenced median.

Usage: python benchmarks/bench_chunked_fwd.py [bs ...]   (default 4 8)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch_sizes):
    import jax
    import jax.numpy as jnp

    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.utils import enable_compile_cache
    from __graft_entry__ import _flagship_cfg

    enable_compile_cache()
    cfg = _flagship_cfg()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        cfg.model.backbone_name = "CSN-50"
        cfg.data.temp_len = 8
        cfg.data.img_size = 64
        cfg.model.compute_dtype = "float32"
    t_len, img = cfg.data.temp_len, cfg.data.img_size
    model = build_model(cfg)
    variables = jax.jit(
        lambda r: model.init({"params": r},
                             np.zeros((1, t_len, img, img, 3), np.float32),
                             train=False))(jax.random.PRNGKey(0))

    def plain(v, clips):
        return model.apply(v, clips, train=False)["pred_logits"]

    def chunked(v, clips):
        b = clips.shape[0]
        xs = clips.reshape(b // 2, 2, *clips.shape[1:])
        ys = jax.lax.map(lambda c: model.apply(v, c, train=False)
                         ["pred_logits"], xs)
        return ys.reshape(b, *ys.shape[2:])

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def loop(v, clips, k, which):
        fn = chunked if which else plain

        def body(i, carry):
            out = fn(v, clips + carry * 1e-12)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # k values match bench.py --sweep so the plain variants hit the
    # persistent-cache entries the sweep already compiled
    k_lo, k_hi = (2, 42) if on_tpu else (1, 3)
    for bs in batch_sizes:
        clips = jax.device_put(np.random.default_rng(0).normal(
            0, 1, (bs, t_len, img, img, 3)).astype(np.float32))
        for which, name in ((0, "plain"), (1, "chunked2")):
            float(loop(variables, clips, k_lo, which))
            float(loop(variables, clips, k_hi, which))
            diffs = []
            for _ in range(7):
                t0 = time.perf_counter()
                float(loop(variables, clips, k_lo, which))
                tl = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(variables, clips, k_hi, which))
                th = time.perf_counter() - t0
                diffs.append(max((th - tl) / (k_hi - k_lo), 1e-9))
            diffs.sort()
            med = diffs[len(diffs) // 2]
            print(json.dumps({
                "metric": f"fwd_{name}_bs{bs}",
                "value": round(bs / med, 2), "unit": "clips/s",
                "ms_per_batch": round(med * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [4, 8])
