"""Set criteria (Hungarian-matched DETR losses) with static shapes.

Reimplements the reference ``models/criterion.py`` semantics on padded
targets so the whole loss lives inside one jit:

  * ``SetCriterionAVA`` (criterion.py:11-206): 3-way binary-actorness CE with
    class weights [1, 1, eos_coef]; multi-label sigmoid BCE with per-query
    weight ``weight`` on matched queries; L1 + GIoU box losses / num_boxes.
  * ``SetCriterion`` (criterion.py:209-410, JHMDB/UCF): softmax CE with
    no-object class; (B, 2) clip-level visibility CE; key-frame query gather
    from the Q*T tubelet-query layout before matching.

Targets are fixed-shape: boxes (B, M, 4) normalized cxcywh, labels
(B, M, C) multi-hot or (B, M) int ids, valid (B, M) bool. Aux (per-decoder-
layer) losses fold the layer axis into the batch and share one matcher call.

All reductions reproduce torch semantics: weighted CE divides by the sum of
the applied class weights; weighted BCE is a plain mean of (w * elem).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.ops import box_ops, matcher


class TargetsAVA(NamedTuple):
    boxes: jnp.ndarray   # (B, M, 4) cxcywh normalized
    labels: jnp.ndarray  # (B, M, C) multi-hot float
    valid: jnp.ndarray   # (B, M) bool


class TargetsUCF(NamedTuple):
    boxes: jnp.ndarray    # (B, M, 4)
    labels: jnp.ndarray   # (B, M) int class ids
    valid: jnp.ndarray    # (B, M) bool
    vis: jnp.ndarray      # (B,) int {0, 1} clip-level visibility
    key_pos: jnp.ndarray  # (B,) int key-frame index in [0, T)


def _stable_bce_from_logits(logits, targets):
    """binary_cross_entropy(sigmoid(x), t) without intermediate sigmoid."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _weighted_ce(logits, target_idx, class_weights):
    """torch F.cross_entropy with per-class weights: sum(w*nll)/sum(w)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_idx[..., None], axis=-1)[..., 0]
    w = class_weights[target_idx]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def match_ava(pred_boxes, pred_logits_b, targets: TargetsAVA,
              cost_class: float, cost_bbox: float, cost_giou: float):
    """AVA matching: class cost = -P(actor) from the binary head
    (models/detr/matcher.py:71-72)."""
    # Matching is a non-differentiable discrete assignment (reference runs
    # it under no_grad): stop gradients so AD never sees the solver loops.
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    pred_logits_b = jax.lax.stop_gradient(pred_logits_b)
    p_actor = jax.nn.softmax(pred_logits_b, axis=-1)[..., 1]     # (B, Q)
    m = targets.boxes.shape[1]
    class_cost = -jnp.broadcast_to(
        p_actor[..., None], p_actor.shape + (m,))
    cost = matcher.compute_cost_matrix(
        pred_boxes, class_cost, targets.boxes, targets.valid,
        cost_class, cost_bbox, cost_giou)
    return matcher.match(cost, targets.valid)


def match_ucf(pred_boxes, pred_logits, targets: TargetsUCF,
              cost_class: float, cost_bbox: float, cost_giou: float):
    """UCF/JHMDB matching: class cost = -softmax(logits)[tgt class]
    (models/detr/matcher_ucf.py:73-74)."""
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    pred_logits = jax.lax.stop_gradient(pred_logits)
    prob = jax.nn.softmax(pred_logits, axis=-1)                   # (B, Q, C+1)
    cls = jnp.clip(targets.labels, 0, prob.shape[-1] - 1)         # (B, M)
    class_cost = -jnp.take_along_axis(
        prob, cls[:, None, :].repeat(prob.shape[1], 1), axis=-1)  # (B, Q, M)
    cost = matcher.compute_cost_matrix(
        pred_boxes, class_cost, targets.boxes, targets.valid,
        cost_class, cost_bbox, cost_giou)
    return matcher.match(cost, targets.valid)


def _gather_matched(arr, tgt_for_query):
    """arr (B, M, ...) gathered by tgt_for_query (B, Q) (clipped); pair with
    mask = tgt_for_query >= 0."""
    idx = jnp.clip(tgt_for_query, 0)
    return jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1)


def ava_layer_losses(
    pred_logits, pred_boxes, pred_logits_b, targets: TargetsAVA,
    tgt_for_query, num_boxes, *, weight: float, eos_coef: float,
    evaluation: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Losses for one decoder layer (criterion.py:42-117)."""
    b, q, c = pred_logits.shape
    matched = tgt_for_query >= 0                                  # (B, Q)

    # Binary actorness CE: target 1 matched / 2 unmatched, weights [1,1,eos].
    tgt_b = jnp.where(matched, 1, 2)
    cw = jnp.array([1.0, 1.0, eos_coef], jnp.float32)
    loss_ce_b = _weighted_ce(pred_logits_b, tgt_b, cw)

    # Multi-label BCE with per-query weight on matched queries.
    tgt_cls = _gather_matched(targets.labels, tgt_for_query)      # (B, Q, C)
    tgt_cls = jnp.where(matched[..., None], tgt_cls, 0.0)
    bce = _stable_bce_from_logits(pred_logits, tgt_cls)
    if evaluation:
        loss_ce = jnp.mean(bce)
    else:
        w = jnp.where(matched, weight, 1.0)[..., None]
        loss_ce = jnp.mean(w * bce)

    # Box L1 + GIoU over matched pairs, normalized by total target count.
    tgt_box = _gather_matched(targets.boxes, tgt_for_query)       # (B, Q, 4)
    l1 = jnp.sum(jnp.abs(pred_boxes - tgt_box), axis=-1)
    giou = box_ops.elementwise_giou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_box))
    mf = matched.astype(jnp.float32)
    loss_bbox = jnp.sum(l1 * mf) / num_boxes
    loss_giou = jnp.sum((1.0 - giou) * mf) / num_boxes

    # class_error analog (logging only): exact multi-hot top-k match rate of
    # matched queries (utils/misc.py:498-519 computes this on CPU; here a
    # jit-safe equivalent: a query counts as correct if its top-k logits are
    # exactly the k positive labels).
    k_pos = jnp.sum(tgt_cls > 0.5, axis=-1)                       # (B, Q)
    order = jnp.argsort(-pred_logits, axis=-1)
    rank = jnp.argsort(order, axis=-1)                            # rank per class
    in_topk = rank < k_pos[..., None]
    correct = jnp.all((tgt_cls > 0.5) == in_topk, axis=-1) & (k_pos > 0)
    n_match = jnp.maximum(jnp.sum(mf), 1.0)
    class_error = 100.0 * (1.0 - jnp.sum(correct * mf) / n_match)

    return {"loss_ce": loss_ce, "loss_ce_b": loss_ce_b,
            "loss_bbox": loss_bbox, "loss_giou": loss_giou,
            "class_error": class_error}


def criterion_ava(
    outputs: Dict[str, jnp.ndarray], targets: TargetsAVA, *,
    cost_class: float, cost_bbox: float, cost_giou: float,
    weight: float, eos_coef: float, aux_loss: bool = True,
    evaluation: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full AVA criterion over the last layer (+ stacked aux layers).

    Returns the reference's loss dict: loss_ce / loss_ce_b / loss_bbox /
    loss_giou / class_error plus ``_<i>``-suffixed aux entries.
    """
    num_boxes = jnp.maximum(
        jnp.sum(targets.valid.astype(jnp.float32)), 1.0)

    if aux_loss:
        logits = outputs["aux_logits"]      # (L, B, Q, C)
        boxes = outputs["aux_boxes"]
        logits_b = outputs["aux_logits_b"]
    else:
        logits = outputs["pred_logits"][None]
        boxes = outputs["pred_boxes"][None]
        logits_b = outputs["pred_logits_b"][None]
    l, b, q, _ = logits.shape

    # Fold layers into batch: one matcher call for all layers.
    def fold(x):
        return x.reshape((l * b,) + x.shape[2:])

    tgts_rep = TargetsAVA(
        boxes=jnp.tile(targets.boxes, (l, 1, 1)),
        labels=jnp.tile(targets.labels, (l, 1, 1)),
        valid=jnp.tile(targets.valid, (l, 1)))
    tfq, _ = match_ava(fold(boxes), fold(logits_b), tgts_rep,
                       cost_class, cost_bbox, cost_giou)
    tfq = tfq.reshape(l, b, q)

    per_layer = jax.vmap(
        lambda lg, bx, lb, t: ava_layer_losses(
            lg, bx, lb, targets, t, num_boxes,
            weight=weight, eos_coef=eos_coef, evaluation=evaluation)
    )(logits, boxes, logits_b, tfq)

    losses = {k: v[-1] for k, v in per_layer.items()}
    if aux_loss:
        for i in range(l - 1):
            for k in ("loss_ce", "loss_ce_b", "loss_bbox", "loss_giou"):
                losses[f"{k}_{i}"] = per_layer[k][i]
    return losses


def ucf_layer_losses(
    pred_logits, pred_boxes, pred_logits_b, targets: TargetsUCF,
    tgt_for_query, num_boxes, *, eos_coef: float, num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """Losses for one decoder layer of the softmax (JHMDB/UCF) criterion
    (criterion.py:241-319). ``pred_*`` are already key-frame-gathered (B,Q,·);
    ``pred_logits_b`` is the clip-level (B, 2) visibility head."""
    matched = tgt_for_query >= 0

    # Visibility CE over (B, 2) — unweighted (criterion.py:251-253).
    logp_b = jax.nn.log_softmax(pred_logits_b, axis=-1)
    loss_ce_b = -jnp.mean(
        jnp.take_along_axis(logp_b, targets.vis[:, None], axis=-1))

    # Softmax CE with no-object class and eos weight.
    tgt_ids = _gather_matched(targets.labels[..., None],
                              tgt_for_query)[..., 0]              # (B, Q)
    tgt_full = jnp.where(matched, tgt_ids, num_classes)
    cw = jnp.ones(num_classes + 1, jnp.float32).at[-1].set(eos_coef)
    loss_ce = _weighted_ce(pred_logits, tgt_full, cw)

    # Box losses over matched pairs (dummy 0 when num_boxes == 0,
    # criterion.py:308-318).
    tgt_box = _gather_matched(targets.boxes, tgt_for_query)
    l1 = jnp.sum(jnp.abs(pred_boxes - tgt_box), axis=-1)
    giou = box_ops.elementwise_giou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_box))
    mf = matched.astype(jnp.float32)
    has_boxes = num_boxes > 0
    denom = jnp.maximum(num_boxes, 1.0)
    loss_bbox = jnp.where(has_boxes, jnp.sum(l1 * mf) / denom, 0.0)
    loss_giou = jnp.where(has_boxes, jnp.sum((1.0 - giou) * mf) / denom, 0.0)

    # top-1 accuracy of matched queries (logging analog of misc.accuracy).
    pred_top1 = jnp.argmax(pred_logits, axis=-1)
    correct = (pred_top1 == tgt_full) & matched
    n_match = jnp.maximum(jnp.sum(mf), 1.0)
    class_error = 100.0 * (1.0 - jnp.sum(correct) / n_match)

    return {"loss_ce": loss_ce, "loss_ce_b": loss_ce_b,
            "loss_bbox": loss_bbox, "loss_giou": loss_giou,
            "class_error": class_error}


def gather_key_frame_queries(x: jnp.ndarray, key_pos: jnp.ndarray,
                             num_queries: int) -> jnp.ndarray:
    """Select the Q queries of the key frame from the (B, Q*T, ...) tubelet
    layout (criterion.py:378-380): rows key_pos*Q .. key_pos*Q + Q - 1."""
    b = x.shape[0]
    base = key_pos[:, None] * num_queries + jnp.arange(num_queries)[None]
    return jnp.take_along_axis(
        x, base.reshape(b, num_queries, *([1] * (x.ndim - 2))), axis=1)


def criterion_ucf(
    outputs: Dict[str, jnp.ndarray], targets: TargetsUCF, *,
    cost_class: float, cost_bbox: float, cost_giou: float,
    eos_coef: float, num_classes: int, num_queries: int,
    aux_loss: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full JHMDB/UCF criterion with key-frame query gather."""
    if aux_loss:
        logits = outputs["aux_logits"]
        boxes = outputs["aux_boxes"]
        logits_b = outputs["aux_logits_b"]   # (L, B, 2)
    else:
        logits = outputs["pred_logits"][None]
        boxes = outputs["pred_boxes"][None]
        logits_b = outputs["pred_logits_b"][None]
    l, b = logits.shape[:2]

    gather = jax.vmap(
        lambda x: gather_key_frame_queries(x, targets.key_pos, num_queries))
    logits_k = gather(logits)                # (L, B, Q, C+1)
    boxes_k = gather(boxes)

    def fold(x):
        return x.reshape((l * b,) + x.shape[2:])

    tgts_rep = TargetsUCF(
        boxes=jnp.tile(targets.boxes, (l, 1, 1)),
        labels=jnp.tile(targets.labels, (l, 1)),
        valid=jnp.tile(targets.valid, (l, 1)),
        vis=jnp.tile(targets.vis, (l,)),
        key_pos=jnp.tile(targets.key_pos, (l,)))
    tfq, _ = match_ucf(fold(boxes_k), fold(logits_k), tgts_rep,
                       cost_class, cost_bbox, cost_giou)
    tfq = tfq.reshape(l, b, num_queries)

    per_layer = jax.vmap(
        lambda lg, bx, lb, t: ucf_layer_losses(
            lg, bx, lb, targets, t, jnp.sum(targets.valid.astype(jnp.float32)),
            eos_coef=eos_coef, num_classes=num_classes)
    )(logits_k, boxes_k, logits_b, tfq)

    losses = {k: v[-1] for k, v in per_layer.items()}
    if aux_loss:
        for i in range(l - 1):
            for k in ("loss_ce", "loss_ce_b", "loss_bbox", "loss_giou"):
                losses[f"{k}_{i}"] = per_layer[k][i]
    return losses


def build_weight_dict(cfg, epoch: int = 0) -> Dict[str, float]:
    """Loss weighting incl. the post-WEIGHT_CHANGE loss_ce swap
    (tuber_ava.py:185-196; video_action_recognition.py:145-146 — only the
    last layer's loss_ce is swapped, aux keep the original weight)."""
    wd = {
        "loss_ce": cfg.loss.dice_cof,
        "loss_bbox": cfg.loss.bbox_cof,
        "loss_giou": cfg.loss.giou_cof,
        "loss_ce_b": 1.0,
    }
    if cfg.train.aux_loss:
        base = list(wd)
        for i in range(cfg.model.dec_layers - 1):
            for k in base:
                wd[f"{k}_{i}"] = wd[k]
    if epoch > cfg.loss.weight_change:
        wd["loss_ce"] = cfg.loss.loss_change_cof
    return wd


def total_loss(loss_dict: Dict[str, jnp.ndarray],
               weight_dict: Dict[str, float]) -> jnp.ndarray:
    return sum(loss_dict[k] * w for k, w in weight_dict.items()
               if k in loss_dict)
