"""Per-axis multi-chip dry-run micro-steps.

Each proof is ONE tiny jitted train step exercising ONE parallelism axis
(one collective family per compiled program):

  dp_tp  — full n-device ('data','model') mesh: batch over 'data' (gradient
           all-reduce) + Megatron tensor-parallel qkv/FFN over 'model'
           (XLA-inserted psums). The headline full-mesh step.
  sp     — 2-device spatial parallelism: clip H over 'model', GSPMD
           collective-permute halo exchanges for the 3D convs.
  ep     — 2-device expert parallelism: MoE expert stacks over 'model'
           (all-gather dispatch / all-reduce combine).
  pp     — 2-device pipeline parallelism: encoder over 'pipe' (GPipe
           microbatch shard_map schedule, parallel/pipeline.py).
  zero1  — 2-device ZeRO-1: Adam moments sharded over 'data', loss checked
           exactly equal to the replicated-optimizer run.

Why micro-steps: round 2's monolithic dryrun composed SP halo permutes with
EP/data all-gathers in one program over 8 virtual CPU devices; on a 1-core
driver host the 8 device threads starve each other at XLA:CPU's hardcoded
20 s-warn / 40 s-abort collective-rendezvous timeouts (rc=134, two rounds
in a row, pass/fail a coin flip). Small single-family programs reach their
rendezvous almost immediately; `__graft_entry__.dryrun_multichip` runs each
axis in its own subprocess so no two programs' collectives ever interleave.

Replaces the reference worker spawner, /root/reference/pipelines/launch.py:20-50.

Usage: python -m tubelet_transformer_tpu.parallel.dryrun_steps \
           --axis sp --devices 2
(The CLI bootstraps its own virtual CPU platform; safe under the axon
single-chip environment.)
"""

from __future__ import annotations

import numpy as np

AXES = ("dp_tp", "sp", "ep", "pp", "zero1")


def _tiny_cfg(n_data: int):
    """Smallest config that exercises every sharded code path: CSN-TINY
    backbone, 2+1 transformer, one sample per data shard."""
    from tubelet_transformer_tpu.config import Config

    cfg = Config()
    cfg.data.dataset_name = "synthetic"
    cfg.data.num_classes = 6
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 2
    cfg.model.dec_layers = 1
    cfg.model.d_model = 32
    cfg.model.nhead = 2
    cfg.model.dim_feedforward = 32
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "decode"
    cfg.train.batch_size = max(2, n_data)
    return cfg


def _one_step(cfg, mesh, spatial: bool = False, zero1: bool = False):
    """Build model/state on `mesh`, run one jitted train step, return loss."""
    import jax
    import jax.numpy as jnp

    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.parallel.sharding_rules import (
        shard_train_state,
        state_shardings,
    )
    from tubelet_transformer_tpu.train import engine

    ds = SyntheticAVADataset(cfg, size=cfg.train.batch_size)
    rng = np.random.default_rng(0)
    batch = collate([ds.get(i, rng) for i in range(cfg.train.batch_size)])
    db = {k: v for k, v in batch.items()
          if k in ("clips", "pad_mask", "boxes", "labels", "valid", "sizes")}
    sharded = mesh_lib.shard_batch(db, mesh, spatial=spatial)

    model = build_model(cfg, mesh=mesh)
    state, tx, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
    state = shard_train_state(state, mesh, zero1=zero1)
    out_sh = state_shardings(state, mesh, zero1=zero1) if zero1 else None
    train_step = engine.make_train_step(cfg, model, tx,
                                        state_out_shardings=out_sh)
    state, metrics = train_step(state, sharded, jax.random.PRNGKey(1),
                                jnp.float32(cfg.loss.dice_cof))
    total = float(jax.device_get(metrics["total_loss"]))
    assert np.isfinite(total), f"non-finite dryrun loss: {total}"
    assert int(jax.device_get(state.step)) == 1
    return total


def run_axis(axis: str, n_devices: int) -> str:
    """Run one parallelism-axis proof; returns a one-line summary."""
    import jax

    from tubelet_transformer_tpu.parallel import mesh as mesh_lib

    devices = jax.devices()[:n_devices]
    if axis == "dp_tp":
        n_model = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
        n_data = n_devices // n_model
        cfg = _tiny_cfg(n_data)
        mesh = mesh_lib.create_mesh(data=n_data, model=n_model,
                                    devices=devices)
        loss = _one_step(cfg, mesh)
        return f"dp_tp: mesh {n_data}x{n_model} ok, loss={loss:.4f}"
    if axis == "sp":
        cfg = _tiny_cfg(1)
        mesh = mesh_lib.create_mesh(data=1, model=2, devices=devices[:2])
        loss = _one_step(cfg, mesh, spatial=True)
        return f"sp: mesh 1x2 spatial ok, loss={loss:.4f}"
    if axis == "ep":
        cfg = _tiny_cfg(1)
        cfg.model.moe_experts = 2
        mesh = mesh_lib.create_mesh(data=1, model=2, devices=devices[:2])
        loss = _one_step(cfg, mesh)
        return f"ep: mesh 1x2 moe ok, loss={loss:.4f}"
    if axis == "pp":
        cfg = _tiny_cfg(1)
        cfg.mesh.pipe = 2
        cfg.mesh.pipe_microbatches = 2
        mesh = mesh_lib.create_mesh(data=1, model=1, pipe=2,
                                    devices=devices[:2])
        loss = _one_step(cfg, mesh)
        return f"pp: mesh 1x1x2 ok, loss={loss:.4f}"
    if axis == "zero1":
        cfg = _tiny_cfg(2)
        mesh = mesh_lib.create_mesh(data=2, model=1, devices=devices[:2])
        loss_z = _one_step(cfg, mesh, zero1=True)
        loss_r = _one_step(cfg, mesh, zero1=False)
        assert loss_z == loss_r, (
            f"zero1 loss {loss_z} != replicated {loss_r}")
        return f"zero1: mesh 2x1 ok, loss={loss_z:.4f} (== replicated)"
    raise ValueError(f"unknown axis {axis!r} (choose from {AXES})")


def main(argv=None) -> None:
    import argparse
    import os

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--axis", required=True, choices=AXES)
    parser.add_argument("--devices", type=int, required=True)
    args = parser.parse_args(argv)

    # Self-contained virtual CPU platform bootstrap (same dance as
    # tests/conftest.py): must happen before the JAX backend initializes.
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache(per_machine=True)

    if len(jax.devices()) < args.devices:
        raise RuntimeError(
            f"needed {args.devices} devices, have {len(jax.devices())}")
    print(run_axis(args.axis, args.devices), flush=True)


if __name__ == "__main__":
    main()
