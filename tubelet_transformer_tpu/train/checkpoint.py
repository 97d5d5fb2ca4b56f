"""Checkpoint I/O: native (orbax) + the three foreign reference formats.

Native checkpoints carry the FULL training state — params, batch_stats,
optimizer state, step, epoch, config — fixing the reference's model-only
resume (utils/model_utils.py:66-95 drops optimizer/scheduler state and takes
START_EPOCH from config; SURVEY §5.4).

Foreign formats (for reproducing published numbers):
  * released TubeR ``.pth`` -> ``load_tuber_pth`` (DDP prefix strip +
    name-mapped conversion, torch_convert.tuber_params_from_torch_state);
  * Caffe2 CSN ``.mat`` -> ``load_backbone_mat``;
  * COCO DETR ``detr.pth`` seed -> ``seed_from_detr`` (transformer +
    bbox_embed + query_embed rows sliced to the query count,
    model_utils.py:10-36).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.train import torch_convert as tc
from tubelet_transformer_tpu.models.csn import BLOCK_NUMS


# ---------------------------------------------------------------------------
# Native checkpoints
# ---------------------------------------------------------------------------

_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk.

    Call before process exit (preemption, end of training) and before
    reading a checkpoint written by this process."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _prune_old_checkpoints(ckpt_dir: str, keep: int, skip: str) -> None:
    """Delete committed ckpt_epoch_* dirs beyond the newest ``keep``
    (never ``skip``, the one just written; tmp dirs of in-flight async
    saves are excluded by the committed-name filter). Caller gates on
    process 0."""
    import shutil

    cands = [d for d in os.listdir(ckpt_dir) if _is_committed_ckpt(d)]
    cands.sort(key=lambda d: int(d.rsplit("_", 1)[1]))
    for d in cands[:-keep] if len(cands) > keep else []:
        full = os.path.join(ckpt_dir, d)
        if os.path.abspath(full) != os.path.abspath(skip):
            shutil.rmtree(full, ignore_errors=True)


def save_checkpoint(ckpt_dir: str, state, epoch: int,
                    max_accuracy: float = 0.0, cfg: Optional[Config] = None,
                    keep: int = 0, async_save: bool = False) -> str:
    """Write ``ckpt_epoch_{N}`` with the full train state (rank-0 only caller).

    Layout mirrors the reference naming (model_utils.py:118-134).

    ``async_save`` hands the jax.Arrays to orbax's AsyncCheckpointer: the
    host fetch + serialization + write happen on a background thread so the
    train loop resumes immediately (the reference's torch.save blocks the
    loop for the full write). Consecutive saves serialize; call
    :func:`wait_for_checkpoints` before exiting or reading the file.

    ``keep`` > 0 prunes this run's committed checkpoints down to the
    newest ``keep`` after the save (LOG.KEEP_CKPTS; 0 keeps everything,
    the reference's behavior).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_epoch_{epoch}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    meta = {"step": int(state.step), "epoch": epoch,
            "max_accuracy": float(max_accuracy)}
    # Both paths hand orbax the live jax.Arrays: orbax gathers each array's
    # shards itself, so TP/PP-sharded params spanning non-addressable
    # devices save correctly (an eager jax.device_get here would raise
    # "spans non-addressable devices" on any multi-host MESH.MODEL>1 run).
    payload = {"params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, **meta}
    if async_save:
        _async_checkpointer().save(path, payload, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
    if keep > 0 and jax.process_index() == 0:
        _prune_old_checkpoints(ckpt_dir, keep, skip=path)
    return path


def load_checkpoint(path: str, state):
    """Restore a native checkpoint into an existing TrainState skeleton.

    Refuses a checkpoint whose encoder layout (sequential
    ``encoder_layer_{i}`` vs pipeline-parallel ``encoder_stack``) differs
    from the live state's: orbax's partial restore would silently keep the
    random-init values for the missing keys (and the optimizer moments
    cannot be converted reliably). Weight-only loading across a MESH.PIPE
    change goes through MODEL.LOAD + PRETRAINED_PATH, which converts.
    """
    import orbax.checkpoint as ocp

    state_pp = "encoder_stack" in dict(state.params).get("transformer", {})
    ckpt_pp = _orbax_has_encoder_stack(path)
    if state_pp != ckpt_pp:
        raise ValueError(
            f"cannot resume {path!r}: checkpoint encoder layout "
            f"({'stacked/PP' if ckpt_pp else 'sequential'}) does not match "
            f"the run's MESH.PIPE setting "
            f"({'stacked/PP' if state_pp else 'sequential'}). To continue "
            "training across a MESH.PIPE change, load weights only via "
            "MODEL.LOAD + MODEL.PRETRAINED_PATH (optimizer state restarts).")

    ckptr = ocp.PyTreeCheckpointer()
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0, "epoch": 0, "max_accuracy": 0.0,
    }
    restored = ckptr.restore(os.path.abspath(path), item=target)
    new_state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=np.int32(restored["step"]))
    return new_state, int(restored["epoch"]), float(restored["max_accuracy"])


def _is_committed_ckpt(name: str) -> bool:
    """ckpt_epoch_<N> with an integer suffix — filters orbax's uncommitted
    tmp dirs ('ckpt_epoch_N.orbax-checkpoint-tmp-<ts>') left behind by a
    hard kill during an (async) save; matching them would crash resume."""
    return (name.startswith("ckpt_epoch_")
            and name.rsplit("_", 1)[1].isdigit())


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if _is_committed_ckpt(d)]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.rsplit("_", 1)[1]))
    return os.path.join(ckpt_dir, cands[-1])


def latest_checkpoint_any_run(base_path: str, save_dir: str = "checkpoints",
                              exp_name: str = "") -> Optional[str]:
    """Newest ckpt across the timestamped experiment dirs under base_path
    (each run gets a fresh exp dir, so resume must search siblings).

    ``exp_name`` scopes the search to this experiment's own runs
    (dirs are named ``{exp_name}_{stamp}``): two experiments sharing a
    BASE_PATH must not cross-resume each other's incompatible states."""
    import glob

    import re

    pat = f"{glob.escape(exp_name)}_*" if exp_name else "*"
    cands = [p for p in glob.glob(os.path.join(base_path, pat, save_dir,
                                               "ckpt_epoch_*"))
             if _is_committed_ckpt(os.path.basename(p))]
    if exp_name:
        # "{exp_name}_*" would also match sibling experiments whose name
        # extends ours ("tuber" globs "tuber_large_<stamp>"); require the
        # suffix to be exactly a run stamp (build_log_dir: %Y%m%d_%H%M%S)
        rx = re.compile(re.escape(exp_name) + r"_\d{8}_\d{6}$")
        cands = [p for p in cands if rx.fullmatch(
            os.path.basename(os.path.dirname(os.path.dirname(p))))]
    if not cands:
        return None
    cands.sort(key=lambda p: (int(p.rsplit("_", 1)[1]), os.path.getmtime(p)))
    return cands[-1]


# ---------------------------------------------------------------------------
# Foreign checkpoints
# ---------------------------------------------------------------------------

def _merge(dst: Dict, src: Dict, path="") -> int:
    """Recursively copy matching leaves src -> dst; returns #leaves copied."""
    n = 0
    for k, v in src.items():
        if k not in dst:
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            n += _merge(dst[k], v, path + k + "/")
        else:
            arr = np.asarray(v)
            if np.shape(dst[k]) != arr.shape:
                raise ValueError(
                    f"shape mismatch at {path}{k}: "
                    f"{np.shape(dst[k])} vs {arr.shape}")
            dst[k] = arr.astype(np.asarray(dst[k]).dtype)
            n += 1
    return n


def load_tuber_pth(cfg: Config, variables: Dict[str, Any],
                   path: Optional[str] = None) -> Dict[str, Any]:
    """Load a released TubeR checkpoint into initialized variables."""
    path = path or cfg.model.pretrained_path
    sd = tc.load_torch_checkpoint(path)
    params, batch_stats = tc.tuber_params_from_torch_state(
        sd, block_nums=BLOCK_NUMS[cfg.model.backbone_name],
        enc_layers=cfg.model.enc_layers, dec_layers=cfg.model.dec_layers,
        temporal_ds_strategy=cfg.model.temporal_ds_strategy,
        single_frame=cfg.model.single_frame)
    new_vars = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    n_p = _merge(new_vars["params"], params)
    n_s = _merge(new_vars["batch_stats"], batch_stats)
    print(f"loaded TubeR checkpoint {path}: {n_p} params, {n_s} stats")
    return new_vars


def load_backbone_mat(cfg: Config, variables: Dict[str, Any],
                      path: Optional[str] = None) -> Dict[str, Any]:
    """Load the Caffe2 CSN ``.mat`` backbone export into variables."""
    path = path or cfg.model.pretrain_backbone_dir
    params, stats = tc.csn_params_from_mat(
        path, BLOCK_NUMS[cfg.model.backbone_name])
    new_vars = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    n_p = _merge(new_vars["params"]["backbone"], params)
    n_s = _merge(new_vars["batch_stats"]["backbone"], stats)
    print(f"loaded CSN .mat {path}: {n_p} params, {n_s} stats")
    return new_vars


def seed_from_detr(cfg: Config, variables: Dict[str, Any],
                   path: Optional[str] = None) -> Dict[str, Any]:
    """Seed transformer/bbox_embed/query_embed from COCO DETR ``detr.pth``.

    Reference filter + query-row slice: model_utils.py:10-36.
    """
    path = path or cfg.model.pretrain_transformer_dir
    sd = tc.load_torch_checkpoint(path)
    new_vars = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    p = new_vars["params"]

    tr: Dict[str, Any] = {}
    for i in range(cfg.model.enc_layers):
        tr[f"encoder_layer_{i}"] = tc.encoder_layer_params(
            sd, f"transformer.encoder.layers.{i}")
    for i in range(cfg.model.dec_layers):
        tr[f"decoder_layer_{i}"] = tc.decoder_layer_params(
            sd, f"transformer.decoder.layers.{i}")
    tr["decoder_norm"] = tc.ln_params(sd, "transformer.decoder.norm")
    n = _merge(p["transformer"], tr)
    n += _merge(p["bbox_embed"], tc.mlp_params(sd, "bbox_embed"))

    q = np.asarray(sd["query_embed.weight"])
    n_q = p["query_embed"].shape[0]
    if q.shape[0] >= n_q:
        p["query_embed"] = q[:n_q].astype(p["query_embed"].dtype)
        n += 1
    print(f"seeded from DETR {path}: {n} tensors")
    return new_vars



def _convert_encoder_layout(variables: Dict[str, Any], n_layers: int,
                            to_stacked: bool) -> Dict[str, Any]:
    """Copy of ``variables`` with the transformer's encoder params converted
    between the sequential ``encoder_layer_{i}`` layout and the
    pipeline-parallel stacked ``encoder_stack`` layout (both directions of
    checkpoint interop go through here)."""
    from tubelet_transformer_tpu.parallel.pipeline import (
        stack_encoder_params,
        unstack_encoder_params,
    )

    fn = stack_encoder_params if to_stacked else unstack_encoder_params
    p = dict(variables["params"])
    p["transformer"] = fn(dict(p["transformer"]), n_layers)
    return {"params": p, "batch_stats": variables["batch_stats"]}


def load_pretrained(cfg: Config, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Apply the reference's load order: backbone .mat (if PRETRAINED), then
    DETR seed (deploy_model, model_utils.py:60-61), then full TubeR ckpt
    (if LOAD).

    Pipeline-parallel runs (MESH.PIPE > 1) hold encoder params stacked
    under 'encoder_stack'; every foreign format (and sequential orbax
    checkpoints) uses the per-layer 'encoder_layer_{i}' layout, so the
    tree is unstacked around the loaders and restacked after. Orbax dirs
    are first tried in the stacked layout (a checkpoint from another PP
    run loads directly)."""
    wants_load = ((cfg.model.pretrained and cfg.model.pretrain_backbone_dir)
                  or (cfg.model.load_detr
                      and cfg.model.pretrain_transformer_dir)
                  or (cfg.model.load and cfg.model.pretrained_path))
    pp = (wants_load
          and "encoder_stack" in dict(variables["params"]).get(
              "transformer", {}))
    if pp:
        if (cfg.model.load and cfg.model.pretrained_path
                and os.path.isdir(cfg.model.pretrained_path)
                and _orbax_has_encoder_stack(cfg.model.pretrained_path)):
            # native PP-shaped orbax checkpoint loads directly (orbax's
            # partial restore silently keeps item values for keys missing
            # from the checkpoint, so the layout must be checked, not tried)
            return load_orbax_variables(cfg.model.pretrained_path, variables)
        n = cfg.model.enc_layers
        out = load_pretrained(
            cfg, _convert_encoder_layout(variables, n, to_stacked=False))
        return _convert_encoder_layout(out, n, to_stacked=True)

    if cfg.model.pretrained and cfg.model.pretrain_backbone_dir:
        variables = load_backbone_mat(cfg, variables)
    if cfg.model.load_detr and cfg.model.pretrain_transformer_dir:
        variables = seed_from_detr(cfg, variables)
    if cfg.model.load and cfg.model.pretrained_path:
        if os.path.isdir(cfg.model.pretrained_path):
            # one of our own orbax checkpoints (a directory), not a
            # reference .pth — eval CLIs accept either format
            if _orbax_has_encoder_stack(cfg.model.pretrained_path):
                # PP-trained checkpoint into a sequential run (export,
                # pipe=1 eval): restore in the stacked layout, unstack
                n = cfg.model.enc_layers
                out = load_orbax_variables(
                    cfg.model.pretrained_path,
                    _convert_encoder_layout(variables, n, to_stacked=True))
                variables = _convert_encoder_layout(out, n,
                                                    to_stacked=False)
            else:
                variables = load_orbax_variables(cfg.model.pretrained_path,
                                                 variables)
        else:
            variables = load_tuber_pth(cfg, variables)
    return variables


def _orbax_has_encoder_stack(path: str) -> bool:
    """Whether an orbax checkpoint stores the pipeline-parallel stacked
    encoder layout ('params/transformer/encoder_stack')."""
    import orbax.checkpoint as ocp

    try:
        meta = ocp.PyTreeCheckpointer().metadata(os.path.abspath(path))
        tree = meta.item_metadata.tree
        return "encoder_stack" in tree["params"].get("transformer", {})
    except (FileNotFoundError, ValueError, AttributeError, KeyError,
            TypeError) as exc:
        # metadata genuinely absent/unreadable (pre-metadata checkpoint) —
        # treat as sequential but say so, since a wrong guess here means a
        # silent partial restore downstream
        print(f"warning: could not read orbax metadata for {path!r} "
              f"({type(exc).__name__}: {exc}); assuming sequential "
              "encoder layout")
        return False


def load_orbax_variables(path: str, variables: Dict[str, Any]
                         ) -> Dict[str, Any]:
    """Model weights (params + batch_stats) from an orbax training
    checkpoint directory, ignoring optimizer/schedule state."""
    import orbax.checkpoint as ocp

    import jax

    # partial restore: without an item orbax materializes the whole tree —
    # including the AdamW opt_state, ~2x the model size — just to be
    # thrown away here; transforms={} + identity restore_args reads only
    # the requested subtree from disk
    item = {"params": variables["params"],
            "batch_stats": variables["batch_stats"]}
    restore_args = jax.tree.map(lambda _: ocp.RestoreArgs(), item)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=item,
                             transforms={}, restore_args=restore_args)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}
