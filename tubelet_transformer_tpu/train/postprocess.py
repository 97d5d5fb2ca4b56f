"""On-device postprocessing of model outputs into detection arrays.

Mirrors the reference's ``PostProcessAVA`` / ``PostProcess``
(models/criterion.py:413-482) but stays on device and returns arrays —
host transfer happens once per eval step, not per tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.ops import box_ops


def postprocess_ava(outputs, target_sizes: jnp.ndarray,
                    binary_gate: float = 0.8):
    """AVA postprocess (criterion.py:447-482).

    Args:
      outputs: model output dict (pred_logits (B,Q,C), pred_boxes,
        pred_logits_b (B,Q,3)).
      target_sizes: (B, 2) [height, width] of the *original* images.

    Returns:
      scores (B, Q, C): sigmoid(action logits) * P(actor), hard-gated at
        P(actor) > 0.8; boxes (B, Q, 4) absolute xyxy; binary (B, Q, 1).
    """
    logits = outputs["pred_logits"]
    boxes = outputs["pred_boxes"]
    logits_b = outputs["pred_logits_b"]

    prob_binary = jax.nn.softmax(logits_b, axis=-1)[..., 1:2]
    # binary_gate: 0.8 is the reference's offline-eval value; serving
    # passes its own actor threshold so sub-0.8 detections keep scores
    prob_gated = jnp.where(prob_binary > binary_gate, prob_binary, 0.0)
    scores = jax.nn.sigmoid(logits) * prob_gated

    xyxy = box_ops.box_cxcywh_to_xyxy(boxes)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1)[:, None, :]
    return scores, xyxy * scale, prob_binary


def postprocess_softmax(outputs, target_sizes: jnp.ndarray):
    """JHMDB/UCF postprocess (criterion.py:413-445): full softmax scores,
    scaled boxes, and the clip-level visibility probability."""
    logits = outputs["pred_logits"]
    boxes = outputs["pred_boxes"]
    logits_b = outputs["pred_logits_b"]

    scores = jax.nn.softmax(logits, axis=-1)
    xyxy = box_ops.box_cxcywh_to_xyxy(boxes)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1)[:, None, :]
    binary = jax.nn.softmax(logits_b, axis=-1)[..., 1:]
    return scores, xyxy * scale, binary
