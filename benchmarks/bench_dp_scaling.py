"""Full-model data-parallel scaling bound from compiled HLO (virtual mesh).

Round-3 VERDICT #8: ROADMAP claimed "DP is linear here" without evidence.
This benchmark bounds it the same zero-hardware way bench_moe_ep.py bounds
EP: compile the FULL train step (forward + on-device matcher + backward +
AdamW + NaN-guard) under GSPMD over an 8-device virtual CPU mesh with the
batch sharded over 'data', then read the gradient all-reduce traffic
straight out of the compiled module and model its ICI cost against the
real-chip per-step compute time from BASELINE.md's v5e trace.

Key fact making this exact despite the virtual mesh: the DP all-reduce
payload is the TRAINABLE-GRADIENT byte count, a function of parameter
shapes only — so the model compiles with flagship CSN-152 parameters but
reduced activation shapes (img 64, T=8, 1 clip/device), which a 1-core
host can compile in minutes. Activation-dependent numbers (per-device
FLOPs at these shapes) are reported but NOT used for the projection; the
projection uses the real-chip step times (BASELINE.md: 108.3 ms/step
fine-tune, 241.7 ms full backprop, both bs=8).

Cost model (v5e-8, ring all-reduce over ICI):
  t_allreduce = 2 * (n-1)/n * payload_bytes / ici_link_bytes_per_sec
  efficiency_no_overlap = t_step / (t_step + t_allreduce)   [worst case:
  XLA overlaps grad all-reduces with remaining backward compute, so the
  true number lies between this and 1.0]

No reference analog beyond DDP's implicit NCCL all-reduce
(/root/reference/pipelines/launch.py:20-50, SURVEY §2.8).  Usage:
    python benchmarks/bench_dp_scaling.py            # both recipes
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
# real-chip per-step compute from BASELINE.md round-3 v5e trace (bs=8)
REAL_STEP_MS = {"finetune_tp4": 108.3, "full_backprop": 241.7}
REAL_BS_PER_CHIP = 8


def compile_case(pretrained: bool) -> dict:
    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.parallel.sharding_rules import (
        shard_train_state,
    )
    from tubelet_transformer_tpu.train import engine

    name = "finetune_tp4" if pretrained else "full_backprop"

    # Flagship CSN-152 AVA parameters (determines the all-reduce payload);
    # activation shapes reduced so XLA:CPU can compile fwd+bwd on one core.
    cfg = Config()
    cfg.data.dataset_name = "synthetic"
    cfg.data.num_classes = 80
    cfg.data.img_size = 64
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-152"
    cfg.model.temporal_ds_strategy = "decode"
    cfg.model.last_stride = False
    cfg.model.query_num = 15
    cfg.model.pretrained = pretrained   # tune_point=4 freeze (stop_gradient)
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = N_DEV       # 1 clip per device

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

    # ground truth the payload should track: trainable params in fp32 grads
    import optax

    zero_g = jax.tree.map(jnp.zeros_like, jax.device_get(state.params))
    total_param_bytes = sum(
        int(np.prod(x.shape)) * 4
        for x in jax.tree_util.tree_leaves(zero_g))
    del zero_g, optax

    return {
        "metric": f"dp8_hlo_train_step_{name}",
        "mesh": f"data={N_DEV}",
        "collectives": colls,
        "allreduce_bytes_per_device": colls.get("all-reduce",
                                                {}).get("bytes", 0),
        "param_bytes_total_fp32": total_param_bytes,
        "flops_per_device_at_reduced_shapes": int(cost.get("flops", 0)),
        "unit": "hlo",
    }


def main() -> None:
    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache(per_machine=True)
    out_rows = []
    for pretrained in (True, False):
        row = compile_case(pretrained)
        print(json.dumps(row), flush=True)
        out_rows.append(row)

    for row, (name, step_ms) in zip(out_rows, REAL_STEP_MS.items()):
        payload = row["allreduce_bytes_per_device"]
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
        }), flush=True)


if __name__ == "__main__":
    main()
