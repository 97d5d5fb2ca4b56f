"""Optimizer: AdamW with the reference's per-group learning rates + freezing.

Reference param groups (train_tuber_ava.py:41-55): backbone params train at
LR_BACKBONE, everything else at LR (the 'class_embed'/'query_embed' groups
there also use LR). torch AdamW couples weight decay to the group lr
(update = -lr_g * (adam + wd * p)), so the per-group lr becomes a single
per-parameter *update scale factor* applied after the AdamW chain — exactly
equivalent.

Freezing (reference):
  * whole backbone when LR_BACKBONE <= 0 (backbone_builder.py:38-40);
  * stem + layer1 + layer2 when the pretrained .mat is loaded with
    tune_point=4 (ir_CSN_152.py:251-303);
frozen params get zeroed updates via optax.masked (their BN statistics still
update in train mode, like torch).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def stop_grad_stage(cfg) -> int:
    """Deepest fully-frozen CSN boundary: -1 none, 0 after the stem,
    s after layer s, 5 after the whole trunk.  Must mirror param_labels —
    the model inserts lax.stop_gradient there so the backward never runs
    through frozen stages (the reference gets this for free from torch
    requires_grad=False pruning, ir_CSN_152.py:321-333)."""
    if cfg.train.lr_backbone <= 0:
        return 5
    if cfg.model.pretrained and cfg.model.tune_point >= 2:
        return cfg.model.tune_point - 2
    return -1


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_labels(params, cfg) -> Dict[str, Any]:
    """Label each param: 'frozen' | 'backbone' | 'main'."""
    lr_backbone = cfg.train.lr_backbone
    freeze_stem = cfg.model.pretrained and cfg.model.tune_point >= 2

    def label(path, _):
        p = _path_str(path)
        if p.startswith("backbone/"):
            if lr_backbone <= 0:
                return "frozen"
            sub = p.split("/", 1)[1]
            if freeze_stem:
                tp = cfg.model.tune_point
                if sub.startswith(("conv1", "bn1")) and tp > 1:
                    return "frozen"
                for s in range(1, 5):
                    if sub.startswith(f"layer{s}_") and tp > s + 1:
                        return "frozen"
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, params, steps_per_epoch: int):
    from tubelet_transformer_tpu.train.schedule import build_schedule

    sched = build_schedule(cfg, steps_per_epoch)
    labels = param_labels(params, cfg)
    backbone_factor = (cfg.train.lr_backbone / cfg.train.lr
                       if cfg.train.lr > 0 else 0.0)

    adamw = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        # torch AdamW decays *all* params — no bias/norm exemption; replicate.
        optax.add_decayed_weights(cfg.train.w_decay),
        optax.scale_by_learning_rate(sched),
    )
    tx = optax.chain(
        # Zero frozen-param grads *before* the global-norm clip: torch frozen
        # params have no grads, so they don't contribute to the clip norm.
        optax.multi_transform(
            {"main": optax.identity(), "backbone": optax.identity(),
             "frozen": optax.set_to_zero()},
            labels),
        optax.clip_by_global_norm(cfg.loss.clips_max_norm)
        if cfg.loss.clips_max_norm > 0 else optax.identity(),
        adamw,
        optax.multi_transform(
            {"main": optax.identity(),
             "backbone": optax.scale(backbone_factor),
             "frozen": optax.set_to_zero()},
            labels),
    )
    return tx, sched
