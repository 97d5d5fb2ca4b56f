"""Benchmark: flagship TubeR CSN-152 AVA inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md: "published: {}").
``vs_baseline`` is therefore reported against the repo's north-star target
(BASELINE.json): >= 2x an A100 running CSN-152 TubeR inference. With no
published A100 number either, we peg the A100 estimate at 300 clips/s
(120 GFLOPs/view at ~23% bf16 MFU — typical for conv3d-heavy models), so
vs_baseline = clips_per_sec / 600.0 and >= 1.0 means the target is met.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from tubelet_transformer_tpu.models.tuber import build_model
    from __graft_entry__ import _flagship_cfg

    on_tpu = jax.default_backend() == "tpu"
    cfg = _flagship_cfg()
    if not on_tpu:
        # CPU fallback so the bench runs anywhere (reduced shapes).
        cfg.model.backbone_name = "CSN-50"
        cfg.data.temp_len = 8
        cfg.data.img_size = 64
        cfg.model.compute_dtype = "float32"

    t_len, img = cfg.data.temp_len, cfg.data.img_size
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    init_clip = np.zeros((1, t_len, img, img, 3), np.float32)
    variables = model.init({"params": rng}, init_clip, train=False)

    @jax.jit
    def forward(clips):
        out = model.apply(variables, clips, train=False)
        return out["pred_logits"], out["pred_boxes"], out["pred_logits_b"]

    best = 0.0
    best_bs = 1
    for bs in ([1, 2, 4, 8] if on_tpu else [1]):
        try:
            clips = jax.device_put(
                np.random.default_rng(0).normal(
                    0, 1, (bs, t_len, img, img, 3)).astype(np.float32))
            # warmup (compile)
            jax.block_until_ready(forward(clips))
            n_iter = 10 if on_tpu else 3
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = forward(clips)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            cps = bs * n_iter / dt
            print(f"# bs={bs}: {cps:.2f} clips/s ({dt / n_iter * 1e3:.1f} ms/it)",
                  file=sys.stderr)
            if cps > best:
                best, best_bs = cps, bs
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"# bs={bs} failed: {type(e).__name__}", file=sys.stderr)
            break

    metric = ("clips_per_sec_csn152_tuber_ava_infer_1chip" if on_tpu
              else "clips_per_sec_cpu_smoke")
    print(json.dumps({
        "metric": metric,
        "value": round(best, 3),
        "unit": "clips/s",
        "vs_baseline": round(best / 600.0, 4),
        "batch_size": best_bs,
    }))


if __name__ == "__main__":
    main()
