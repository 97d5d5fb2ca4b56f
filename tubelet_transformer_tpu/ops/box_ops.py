"""Box utilities in jnp (single canonical copy).

Semantics match the reference's ``utils/box_ops.py`` (itself DETR's), which the
reference duplicates three times (utils/, models/detr/util/, models/transformer/util/).
Unlike the reference, everything here is jit-safe: no asserts on traced values —
degenerate boxes are the caller's responsibility (padded box slots are masked
downstream instead of asserted away).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x0, y0, x1, y1]."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x0, y0, x1, y1] -> [cx, cy, w, h]."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M) iou, union."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) of xyxy boxes -> (N, M).

    Matches reference utils/box_ops.py:35-63 numerically; the reference's
    degenerate-box asserts are dropped (jit-incompatible) — padded slots must
    be masked by the caller.
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-12)


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned (..., 4) xyxy boxes -> (...).

    Equivalent to ``diag(generalized_box_iou(a, b))`` (criterion.py:113-115)
    without materializing the N x N matrix.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-12)

    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-12)


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = -jnp.inf,
) -> jnp.ndarray:
    """Greedy NMS with static shapes, safe under jit/vmap on TPU.

    On-device counterpart of the host library's ``eval/np_box.py:
    non_max_suppression`` (reference semantics at
    ``evaluates/utils/np_box_list_ops.py:161-233``): highest-score-first
    selection, suppress IoU strictly greater than ``iou_threshold``, drop
    scores <= ``score_threshold``.

    Args:
      boxes: (n, 4) xyxy. scores: (n,). valid: (n,) bool padding mask.
      max_outputs: static number of selection rounds (<= n).

    Returns:
      (n,) bool keep mask (selected boxes). Selection order is recoverable by
      sorting kept scores descending. No data-dependent shapes anywhere —
      a fixed ``max_outputs``-step ``lax.fori_loop`` over a precomputed
      (n, n) IoU matrix, so XLA compiles one program per (n, max_outputs).
    """
    from jax import lax

    n = boxes.shape[0]
    iou, _ = box_iou(boxes, boxes)
    alive = valid & (scores > score_threshold)
    neg_inf = jnp.array(-jnp.inf, scores.dtype)

    def body(_, state):
        alive, keep = state
        masked = jnp.where(alive, scores, neg_inf)
        best = jnp.argmax(masked)
        any_alive = alive.any()
        keep = keep.at[best].set(any_alive | keep[best])
        # the winner leaves the pool; so does everything it overlaps too much
        suppress = (iou[best] > iou_threshold) | (jnp.arange(n) == best)
        alive = alive & jnp.where(any_alive, ~suppress, True)
        return alive, keep

    _, keep = lax.fori_loop(
        0, min(max_outputs, n), body, (alive, jnp.zeros(n, dtype=bool))
    )
    return keep
