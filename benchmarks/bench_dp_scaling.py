"""Full-model data-parallel scaling bound for v5e-8 (round-3 VERDICT #8).

ROADMAP claimed "DP is linear here" without evidence. This benchmark bounds
it two ways:

1. **Analytic payload (the projection's numerator).** Data-parallel
   gradient synchronization moves exactly the trainable-gradient bytes per
   step per device (ring all-reduce: ``2*(n-1)/n * payload``) — a function
   of parameter shapes and the freeze recipe only, independent of batch or
   image size. This is the same payload the reference's DDP/NCCL implicit
   all-reduce moves (/root/reference/pipelines/launch.py:20-50, SURVEY
   §2.8), and an UPPER bound on what GSPMD needs (it may reduce-scatter or
   overlap, never send more). Trainable bytes come from the real param
   tree via ``param_labels`` (frozen params get optax.set_to_zero and
   their grads are pruned by stop_gradient, so they never sync).

2. **Compiled-HLO diagnostic.** The FULL train step (forward + on-device
   matcher + backward + AdamW + NaN-guard) is compiled under GSPMD over an
   8-device virtual CPU mesh with the batch sharded over 'data', and the
   collective inventory is read from the compiled module. CAVEAT, found
   while building this: at the reduced activation shapes a 1-core host can
   compile (img 64, T=8), GSPMD's cost model re-plans — it all-gathers the
   few-MB batch and replicates parts of the compute instead of emitting
   the large gradient all-reduces it would emit at flagship shapes, so the
   HLO collective bytes here are NOT the flagship sync traffic. The HLO
   compile still proves the step partitions and runs over the data axis;
   the projection uses the analytic payload above.

Cost model (v5e-8, ring all-reduce over ICI, no overlap — worst case; XLA
overlaps grad all-reduces with remaining backward compute, so the true
efficiency lies between this and 1.0):
  t_allreduce = 2 * (n-1)/n * trainable_bytes / ici_link_bytes_per_sec
  efficiency_no_overlap = t_step / (t_step + t_allreduce)

Real-chip step times are BASELINE.md's v5e measurements (bs=8).

Usage:
    python benchmarks/bench_dp_scaling.py            # both recipes
    python benchmarks/bench_dp_scaling.py --no-hlo   # analytic only (fast)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from benchmarks.bench_moe_ep import collective_stats          # noqa: E402

N_DEV = 8
ICI_BPS = 4.5e10          # v5e per-link, per-direction (bench_moe_ep model)
# real-chip per-step wall time from BASELINE.md round-3/4 v5e trace (bs=8)
REAL_STEP_MS = {"finetune_tp4": 108.3, "full_backprop": 241.7}
REAL_BS_PER_CHIP = 8


def _flagship_cfg(pretrained: bool):
    from tubelet_transformer_tpu.config import Config

    cfg = Config()
    cfg.data.dataset_name = "synthetic"
    cfg.data.num_classes = 80
    cfg.data.img_size = 64    # reduced activations: XLA:CPU-compilable
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-152"
    cfg.model.temporal_ds_strategy = "decode"
    cfg.model.last_stride = False
    cfg.model.query_num = 15
    cfg.model.pretrained = pretrained   # tune_point=4 freeze recipe
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = N_DEV        # 1 clip per device
    return cfg


def trainable_grad_bytes(pretrained: bool) -> dict:
    """Analytic DP payload: fp32 bytes of params whose grads sync.

    Parameter shapes are the FLAGSHIP CSN-152 AVA ones (they do not depend
    on image size / clip length), so this is exact for the real model."""
    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import engine
    from tubelet_transformer_tpu.train.optimizer import param_labels

    cfg = _flagship_cfg(pretrained)
    ds = SyntheticAVADataset(cfg, size=2, square=True)
    rng = np.random.default_rng(0)
    batch = collate([ds.get(i, rng) for i in range(2)])
    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1000)
    labels = param_labels(state.params, cfg)
    total, trainable = 0, 0
    for (path, leaf), (_, lab) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(labels)):
        b = int(np.prod(leaf.shape)) * 4
        total += b
        if lab != "frozen":
            trainable += b
    return {"param_bytes_total_fp32": total,
            "trainable_grad_bytes_fp32": trainable}


def compile_case(pretrained: bool) -> dict:
    """HLO diagnostic: compile the full train step over the virtual mesh
    and inventory its collectives (see module docstring caveat)."""
    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.parallel.sharding_rules import (
        shard_train_state,
    )
    from tubelet_transformer_tpu.train import engine

    name = "finetune_tp4" if pretrained else "full_backprop"
    cfg = _flagship_cfg(pretrained)
    mesh = mesh_lib.create_mesh(data=N_DEV, model=1)

    ds = SyntheticAVADataset(cfg, size=cfg.train.batch_size, square=True)
    rng = np.random.default_rng(0)
    batch = collate([ds.get(i, rng) for i in range(cfg.train.batch_size)])
    db = {k: v for k, v in batch.items()
          if k in ("clips", "pad_mask", "boxes", "labels", "valid", "sizes")}
    sharded = mesh_lib.shard_batch(db, mesh)

    model = build_model(cfg, mesh=mesh)
    state, tx, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1000)
    state = shard_train_state(state, mesh)
    train_step = engine.make_train_step(cfg, model, tx)

    compiled = train_step.lower(state, sharded, jax.random.PRNGKey(1),
                                jnp.float32(12.0)).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    colls = collective_stats(compiled.as_text())

    return {
        "metric": f"dp8_hlo_train_step_{name}",
        "mesh": f"data={N_DEV}",
        "collectives_at_reduced_shapes": colls,
        "flops_per_device_at_reduced_shapes": int(cost.get("flops", 0)),
        "note": ("diagnostic only: GSPMD re-plans at reduced shapes "
                 "(gathers the small batch instead of all-reducing "
                 "grads); projection uses the analytic DDP payload"),
        "unit": "hlo",
    }


def main() -> None:
    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache(per_machine=True)
    run_hlo = "--no-hlo" not in sys.argv
    for pretrained, (name, step_ms) in zip((True, False),
                                           REAL_STEP_MS.items()):
        sizes = trainable_grad_bytes(pretrained)
        payload = sizes["trainable_grad_bytes_fp32"]
        t_ar = 2 * (N_DEV - 1) / N_DEV * payload / ICI_BPS
        t_step = step_ms / 1e3
        eff = t_step / (t_step + t_ar)
        print(json.dumps({
            "metric": f"dp8_scaling_projection_{name}",
            "value": round(eff, 4),
            "unit": "efficiency_no_overlap_lower_bound",
            "modeled_allreduce_ms": round(t_ar * 1e3, 2),
            "real_chip_step_ms": step_ms,
            "projected_v5e8_clips_per_sec": round(
                N_DEV * REAL_BS_PER_CHIP / (t_step + t_ar), 1),
            "ici_link_gbps_assumed": ICI_BPS / 1e9,
            **sizes,
        }), flush=True)
        if run_hlo:
            print(json.dumps(compile_case(pretrained)), flush=True)


if __name__ == "__main__":
    main()
