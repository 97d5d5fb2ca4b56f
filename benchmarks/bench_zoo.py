"""Model-zoo inference benchmark: one JSON line per reference config.

Covers the reference model zoo's released configurations (README.md:11-31):
CSN-50 AVA 2.1 (256px), CSN-152 AVA 2.1/2.2 (256px), CSN-152 JHMDB (224px).
Methodology identical to bench.py (in-graph K-loop differencing).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_config(name: str, backbone: str, img: int, dataset: str,
                 batch_size: int, query_num: int = 15) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_cfg
    from tubelet_transformer_tpu.models.tuber import build_model

    cfg = _flagship_cfg()
    cfg.model.backbone_name = backbone
    cfg.data.img_size = img
    cfg.data.dataset_name = dataset
    cfg.model.query_num = query_num
    if dataset in ("jhmdb", "ucf"):
        cfg.data.num_classes = 21

    model = build_model(cfg)
    t_len = cfg.data.temp_len
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
        "metric": f"clips_per_sec_{name}",
        "value": round(batch_size / dt, 2),
        "unit": "clips/s",
        "ms_per_batch": round(dt * 1e3, 2),
        "batch_size": batch_size,
    }), flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bench_config("csn50_ava_infer", "CSN-50", 256, "ava", batch_size=2)
    bench_config("csn152_ava_infer", "CSN-152", 256, "ava", batch_size=2)
    bench_config("csn152_jhmdb_infer", "CSN-152", 224, "jhmdb",
                 batch_size=2, query_num=10)


if __name__ == "__main__":
    main()
