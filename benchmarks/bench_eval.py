"""Benchmark: flagship eval step (forward + criterion losses + on-device
postprocess) on one chip — the hot loop of ``validate_tuber_detection``.

Usage: python benchmarks/bench_eval.py [bs]
Prints one JSON line per batch size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch_size: int = 4, losses: bool = True) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import engine

    cfg = _flagship_cfg()
    cfg.train.batch_size = batch_size
    cfg.val.compute_losses = losses
    ds = SyntheticAVADataset(cfg, size=batch_size, square=True)
    rng = np.random.default_rng(0)
    batch = collate([ds.get(i, rng) for i in range(batch_size)])
    db = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}

    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    eval_step = engine.make_eval_step(cfg, model)

    out = eval_step(state, db)
    np.asarray(out["scores"])  # compile + sync

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = eval_step(state, db)
        np.asarray(out["scores"])  # fetch = sync
        best = min(best, (time.perf_counter() - t0) / n)

    print(json.dumps({
        "metric": "eval_step_ms_csn152" + ("" if losses else "_nolosses"),
        "value": round(best * 1e3, 1),
        "unit": "ms/step",
        "clips_per_sec_chip": round(batch_size / best, 2),
        "batch_size": batch_size,
    }))


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(bs, losses="--no-losses" not in sys.argv)
