"""Shared train/eval runners behind the CLI entry points.

Replaces the reference's per-entry-point ``main_worker`` + ``spawn_workers``
(one process per GPU, pipelines/launch.py): under JAX one process drives all
local chips; multi-host runs call ``jax.distributed.initialize()`` once and
feed per-host data shards.
"""

from __future__ import annotations

import time
import jax

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.data.loader import DataLoader
from tubelet_transformer_tpu.models.tuber import build_model
from tubelet_transformer_tpu.parallel import mesh as mesh_lib
from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
from tubelet_transformer_tpu.train import engine
from tubelet_transformer_tpu.train import loop as loop_lib
from tubelet_transformer_tpu.utils import MetricsWriter, build_log_dir


def build_dataset(cfg: Config, split: str):
    name = cfg.data.dataset_name
    if name == "ava":
        if cfg.data.packed_path:
            from tubelet_transformer_tpu.data.packed import PackedAVADataset

            ds = PackedAVADataset(cfg, split)
        else:
            from tubelet_transformer_tpu.data.ava import AVADataset

            ds = AVADataset(cfg, split)
    elif name in ("jhmdb", "ucf"):
        if cfg.data.packed_path:
            from tubelet_transformer_tpu.data.packed import (
                PackedJHMDBDataset,
            )

            ds = PackedJHMDBDataset(cfg, split)
        else:
            from tubelet_transformer_tpu.data.jhmdb import JHMDBDataset

            ds = JHMDBDataset(cfg, split)
    elif name == "synthetic":
        from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset

        ds = SyntheticAVADataset(cfg, size=cfg.data.synthetic_size)
    else:
        raise ValueError(f"unknown dataset {name!r}")
    return _maybe_attach_lfb(cfg, ds)


def _maybe_attach_lfb(cfg: Config, ds):
    """USE_LFB: ship a long-term memory window with every sample, as the
    reference's collate variants do (utils/misc.py:284-308) — without this
    the flag would silently train/eval with no long-term context."""
    if not cfg.use_lfb or cfg.model.generate_lfb:
        return ds
    if not cfg.lfb.bank_path:
        raise ValueError(
            "USE_LFB needs LFB.BANK_PATH (an .npz feature bank; produce "
            "one with `python -m tubelet_transformer_tpu.cli.generate_lfb`)")
    from tubelet_transformer_tpu.eval.lfb import (BankAttachDataset,
                                                  FeatureBank)

    return BankAttachDataset(ds, FeatureBank.load(cfg.lfb.bank_path),
                             half_window=cfg.lfb.half_window)


def make_loaders(cfg: Config, val_only: bool = False):
    """(train_loader, val_loader); ``val_only`` skips building the train
    dataset (eval/bank CLIs — the AVA train annotation parse is expensive
    and its loader would be discarded)."""
    rank, world = jax.process_index(), jax.process_count()
    # BATCH_SIZE is per-chip, like the reference's per-GPU batch under
    # mp.spawn DDP: the host loader feeds batch_size * local chips, so the
    # global batch is always divisible by the 'data' mesh axis.
    n_local = jax.local_device_count()
    train_loader = None
    if not val_only:
        train_ds = build_dataset(cfg, "train")
        train_loader = DataLoader(train_ds, cfg.train.batch_size * n_local,
                                  shuffle=True, seed=cfg.train.seed,
                                  rank=rank, world=world,
                                  num_workers=cfg.data.num_workers)
    val_ds = build_dataset(cfg, "val")
    # wrap-padded tail: every val keyframe is evaluated (the evaluators
    # dedupe the duplicated pad samples by image_key) with full batches
    val_loader = DataLoader(val_ds, cfg.val.batch_size * n_local,
                            shuffle=False, rank=rank, world=world,
                            num_workers=cfg.data.num_workers,
                            drop_last=True, pad_to_batch=True)
    return train_loader, val_loader


def init_state(cfg: Config, model, steps_per_epoch: int, sample_batch):
    rng = jax.random.PRNGKey(cfg.train.seed)
    state, tx, sched = engine.create_train_state(
        cfg, model, rng, sample_batch, steps_per_epoch)
    # Foreign pretrained weights (reference order, model_utils.deploy_model).
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    new_vars = ckpt_lib.load_pretrained(cfg, variables)
    if new_vars is not variables:
        state = state.replace(params=new_vars["params"],
                              batch_stats=new_vars["batch_stats"])
    return state, tx


def _sample_batch_from(loader) -> dict:
    for batch in loader:
        return {k: v for k, v in batch.items()
                if k in loop_lib._DEVICE_KEYS}
    raise RuntimeError("empty loader")


def _validate(cfg, eval_step, state, val_loader, mesh, epoch, writer):
    if cfg.data.dataset_name in ("jhmdb", "ucf"):
        return loop_lib.validate_ucf(cfg, eval_step, state, val_loader,
                                     mesh, epoch, writer)
    return loop_lib.validate_ava(cfg, eval_step, state, val_loader, mesh,
                                 epoch, writer)


def _check_supported(cfg: Config) -> None:
    if cfg.two_stream:
        # The reference plumbs TWO_STREAM through collate/forward but ships
        # no second-stream model (SURVEY §2.3/§2.6); explicit here.
        raise NotImplementedError(
            "TWO_STREAM is not implemented (the reference ships no "
            "two-stream model either); set CONFIG.TWO_STREAM: false")
    if cfg.use_location:
        # The reference plumbs USE_LOCATION (lfb_location_features through
        # collate_fn_lstr_location / the train loop,
        # utils/video_action_recognition.py:109-139, utils/misc.py:284-308)
        # but the consuming model code (forward_lfb_locations) is absent
        # from the release; explicit guard rather than silence.
        raise NotImplementedError(
            "USE_LOCATION is not implemented (the reference's consuming "
            "model code is absent from its release); set "
            "CONFIG.USE_LOCATION: false")


def run_training(cfg: Config) -> None:
    _check_supported(cfg)
    # Graceful-preemption handling (the reference has none — it exits(1) on
    # any trouble, SURVEY §5.3): SIGTERM/SIGINT request a checkpoint at the
    # next epoch boundary; a resumed run continues from it (MODEL.LOAD).
    # Installed first so a signal during the (minutes-long) compile phase
    # is not fatal.
    import os
    import signal

    preempted = {"flag": False}

    def _request_stop(signum, frame):
        preempted["flag"] = True
        # os.write, not print(): the signal can interrupt the main thread
        # mid-write to buffered stdout, and a nested print() raises
        # "reentrant call inside BufferedWriter" — killing the run instead
        # of checkpointing it
        os.write(2, (f"signal {signum}: will checkpoint and stop at the "
                     "next epoch boundary\n").encode())

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }
    # everything below runs under the handler-restoring try/finally — an
    # error during setup (bad config, missing bank/data) must not leak
    # _request_stop into the caller's process
    try:
        _run_training_body(cfg, preempted)
    finally:
        for s, h in prev_handlers.items():
            signal.signal(s, h)


def _run_training_body(cfg: Config, preempted) -> None:
    mesh = mesh_lib.create_mesh(cfg.mesh.data, cfg.mesh.model,
                                cfg.mesh.pipe)
    is_main = mesh_lib.is_main_process()
    # Every process resolves the SAME run dir (orbax checkpointing is a
    # collective: all hosts must join each save) — broadcast rank 0's stamp.
    stamp = time.strftime("%Y%m%d_%H%M%S")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        import numpy as np

        stamp_num = multihost_utils.broadcast_one_to_all(
            np.int64(int(time.strftime("%Y%m%d%H%M%S"))))
        s = f"{int(stamp_num):014d}"
        stamp = f"{s[:8]}_{s[8:]}"
    # every rank makes the dirs (collective save needs them); only rank 0
    # writes config.json — concurrent writers on a shared FS interleave
    dirs = build_log_dir(cfg, stamp=stamp, write_config=is_main)
    writer = MetricsWriter(dirs["tb"], enabled=True) if is_main else None

    train_loader, val_loader = make_loaders(cfg)
    steps_per_epoch = len(train_loader)
    model = build_model(cfg, mesh=mesh)

    sample_batch = _sample_batch_from(train_loader)
    state, tx = init_state(cfg, model, steps_per_epoch, sample_batch)

    start_epoch = cfg.train.start_epoch
    if cfg.model.load and not cfg.model.pretrained_path:
        # Resume from the newest checkpoint of this experiment's previous
        # runs under BASE_PATH (each run writes a fresh timestamped exp dir;
        # scoping by EXP_NAME keeps co-located experiments apart). Runs
        # BEFORE shard_train_state: load_checkpoint materializes host
        # arrays, which would silently discard a TP/PP placement (and
        # device_get of non-addressable shards fails on multi-host meshes).
        latest = ckpt_lib.latest_checkpoint_any_run(
            cfg.log.base_path, cfg.log.save_dir, exp_name=cfg.log.exp_name)
        # Rank 0's choice is authoritative: independent globs on a shared
        # FS can disagree (attribute-cache lag) and offset the hosts'
        # epoch loops — mismatched collectives hang the job.
        latest = mesh_lib.broadcast_string(latest or "") or None
        if latest:
            state, start_epoch, _ = ckpt_lib.load_checkpoint(latest, state)
            start_epoch += 1
            print(f"resumed from {latest} at epoch {start_epoch}")

    state_out_sh = None
    if cfg.mesh.model > 1 or cfg.mesh.pipe > 1 or cfg.mesh.zero1:
        from tubelet_transformer_tpu.parallel.sharding_rules import (
            shard_train_state,
            state_shardings,
        )

        state = shard_train_state(state, mesh, zero1=cfg.mesh.zero1)
        if cfg.mesh.zero1:
            # pin the output layout: keeps the Adam-moment update
            # shard-local over 'data' (one all-gather for the param delta)
            state_out_sh = state_shardings(state, mesh, zero1=True)

    train_step = engine.make_train_step(cfg, model, tx,
                                        state_out_shardings=state_out_sh)
    eval_step = engine.make_eval_step(cfg, model, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.train.seed + 7)

    print(f"Start training on {jax.device_count()} devices "
          f"({jax.process_count()} hosts), {steps_per_epoch} steps/epoch")
    t0 = time.time()
    try:
        for epoch in range(start_epoch, cfg.train.epoch_num):
            state, _ = loop_lib.train_one_epoch(
                cfg, train_step, state, train_loader, mesh, rng, epoch,
                writer)
            # Snapshot the stop decision ONCE per boundary. A SIGTERM may
            # reach only some hosts (or at different epoch boundaries); the
            # save/stop decision must be collective or the orbax save
            # deadlocks — and every later branch must read the SNAPSHOT,
            # not the live flag: a signal landing after the allgather would
            # otherwise flip this host's branches while the others (which
            # agreed on stop=False) run validate/train collectives instead.
            # The live flag stays set as input to the NEXT boundary's
            # allgather, so the late signal is honored one epoch later on
            # every host at once.
            stop = bool(preempted["flag"])
            if jax.process_count() > 1:
                import numpy as np
                from jax.experimental import multihost_utils

                stop = bool(multihost_utils.process_allgather(
                    np.int32(stop)).max())
            if (stop or epoch % cfg.log.save_freq == 0
                    or epoch == cfg.train.epoch_num - 1):
                # all processes participate (orbax save is a collective;
                # the primary host writes the data); with LOG.ASYNC_CKPT
                # the write commits on a background thread and the loop
                # moves on — the finally-block wait makes it durable
                # before this function returns
                ckpt_lib.save_checkpoint(dirs["ckpt"], state, epoch, cfg=cfg,
                                         keep=cfg.log.keep_ckpts,
                                         async_save=cfg.log.async_ckpt)
            if stop:
                print(f"preempted: checkpointed epoch {epoch}, exiting")
                break
            if epoch % cfg.val.freq == 0 or epoch == cfg.train.epoch_num - 1:
                _validate(cfg, eval_step, state, val_loader, mesh, epoch,
                          writer)
    finally:
        ckpt_lib.wait_for_checkpoints()
        if writer:
            writer.close()
    print(f"Training time {time.time() - t0:.0f}s")


def run_eval(cfg: Config) -> dict:
    _check_supported(cfg)
    if not (cfg.model.load and cfg.model.pretrained_path):
        raise ValueError("eval requires MODEL.LOAD with PRETRAINED_PATH")
    mesh = mesh_lib.create_mesh(cfg.mesh.data, cfg.mesh.model,
                                cfg.mesh.pipe)
    _, val_loader = make_loaders(cfg, val_only=True)
    model = build_model(cfg, mesh=mesh)
    sample_batch = _sample_batch_from(val_loader)
    state, _ = init_state(cfg, model, steps_per_epoch=1,
                          sample_batch=sample_batch)
    eval_step = engine.make_eval_step(cfg, model, mesh=mesh)
    return _validate(cfg, eval_step, state, val_loader, mesh, epoch=0,
                     writer=None)


def run_generate_lfb(cfg: Config, out_path: str = "lfb_bank.npz") -> str:
    """Run the model in generate_lfb mode over the val split and save the
    long-term feature bank (reference GENERATE_LFB hook, never shipped)."""
    if not (cfg.model.load and cfg.model.pretrained_path):
        # a bank from random-init weights is silently poisonous to every
        # later USE_LFB run — refuse like run_eval does
        raise ValueError(
            "generate_lfb requires MODEL.LOAD with PRETRAINED_PATH "
            "(a feature bank needs trained weights)")
    mesh = mesh_lib.create_mesh(cfg.mesh.data, cfg.mesh.model,
                                cfg.mesh.pipe)
    cfg.model.generate_lfb = True
    _, val_loader = make_loaders(cfg, val_only=True)
    model = build_model(cfg, mesh=mesh)
    sample_batch = _sample_batch_from(val_loader)
    state, _ = init_state(cfg, model, steps_per_epoch=1,
                          sample_batch=sample_batch)
    from tubelet_transformer_tpu.eval.lfb import generate_bank

    bank = generate_bank(
        cfg, model,
        {"params": state.params, "batch_stats": state.batch_stats},
        val_loader, mesh)
    bank.save(out_path)
    print(f"saved feature bank ({len(bank)} keyframes) to {out_path}")
    return out_path


def main(mode: str, default_dataset: str) -> None:
    import argparse

    from tubelet_transformer_tpu.config import load_config

    parser = argparse.ArgumentParser(
        description="TubeR-TPU video action detection")
    parser.add_argument("--config-file", default=None,
                        help="path to a YAML config (reference format OK)")
    args = parser.parse_args()
    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = load_config(args.config_file)
    if not args.config_file:
        cfg.data.dataset_name = default_dataset
    if mode == "train":
        run_training(cfg)
    elif mode == "generate-lfb":
        run_generate_lfb(cfg)
    else:
        cfg.eval_only = True
        run_eval(cfg)
