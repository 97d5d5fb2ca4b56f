"""MoE encoder cost on the real chip: dense FFN vs sparse MoE variants.

Usage: python benchmarks/bench_moe.py [batch_size]

Measures the flagship CSN-152 AVA inference throughput with the stock dense
encoder FFN and two MoE variants: 4 experts top-1 (per-token FFN FLOPs
identical to dense, so its gap is pure routing/dispatch overhead) and
8 experts top-2 (2x per-token FFN FLOPs + doubled capacity — its gap mixes
routing cost with the genuinely larger compute). Single chip: experts are
NOT sharded here (EP needs a multi-chip 'model' axis); the top-1 row bounds
the overhead EP must beat.
Methodology identical to bench.py (in-graph K-loop differencing).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_variant(name: str, moe_experts: int, batch_size: int,
                  top_k: int = 1) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_cfg
    from tubelet_transformer_tpu.models.tuber import build_model

    cfg = _flagship_cfg()
    cfg.model.moe_experts = moe_experts
    cfg.model.moe_top_k = top_k

    model = build_model(cfg)
    t_len, img = cfg.data.temp_len, cfg.data.img_size
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(0, 1, (batch_size, t_len, img, img, 3)),
                        np.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r},
                             np.zeros((1, t_len, img, img, 3), np.float32),
                             train=False))(jax.random.PRNGKey(0))

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(v, x, k):
        def body(i, c):
            out = model.apply(v, (x * (1 + c * 1e-12)).astype(x.dtype),
                              train=False)["pred_boxes"]
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

    dt = (run(8) - run(2)) / 6
    print(json.dumps({
        "metric": f"clips_per_sec_csn152_ava_{name}",
        "value": round(batch_size / dt, 2),
        "unit": "clips/s",
        "ms_per_batch": round(dt * 1e3, 2),
        "batch_size": batch_size,
        "moe_experts": moe_experts,
        "moe_top_k": top_k,
    }), flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    bench_variant("dense_ffn", moe_experts=0, batch_size=bs)
    bench_variant("moe4_top1", moe_experts=4, batch_size=bs)
    bench_variant("moe8_top2", moe_experts=8, batch_size=bs, top_k=2)


if __name__ == "__main__":
    main()
