"""Segmentation heads and mask losses (DETR panoptic surface).

Counterparts of the reference's ``models/detr/segmentation.py`` — vestigial
there (only ``dice_loss``/``sigmoid_focal_loss`` are imported, by the unused
``SetCriterion*.loss_masks`` at ``models/criterion.py:119-147``), but part of
the component surface, so rebuilt here TPU-first and made *live*:

* ``dice_loss`` / ``sigmoid_focal_loss`` — reference
  ``segmentation.py:172-215``; jnp, with an optional validity mask so padded
  (static-shape) query rows contribute zero — the TPU replacement for the
  reference's dynamic ``src_masks[src_idx]`` gather.
* ``MHAttentionMap`` — reference ``segmentation.py:140-169``: per-head
  query/feature attention maps, softmax over (heads, H, W) jointly (the
  reference flattens heads into the softmax axis — reproduced exactly).
* ``MaskHeadSmallConv`` — reference ``segmentation.py:69-137``: FPN-style
  conv head with GroupNorm(8); channels-last 2-D convs (NHWC) for TPU.
* ``loss_masks`` — padded equivalent of ``criterion.py:119-147``.
* ``postprocess_masks`` — the used core of ``PostProcessSegm``
  (``segmentation.py:218-238``): bilinear upsample + sigmoid threshold on
  device; per-image crop/resize stays host-side like the reference's.

``PostProcessPanoptic`` (``segmentation.py:241-363``) is COCO-panoptic
plumbing around ``panopticapi`` (PNG id maps); the reference guards its import
and never constructs it — out of scope, documented in PARITY.md.

All modules keep torch-compatible numerics so converted weights match
(see tests/test_segmentation.py oracle tests).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Losses (reference segmentation.py:172-215)
# ---------------------------------------------------------------------------

def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_boxes,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DICE loss over per-row binary masks.

    inputs: (N, ...) logits; targets: same shape in {0,1}; valid: optional
    (N,) row mask — padded rows (TPU static shapes) contribute 0.
    """
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    probs = probs.reshape(probs.shape[0], -1)
    tgt = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs * tgt, axis=1)
    denominator = jnp.sum(probs, axis=-1) + jnp.sum(tgt, axis=-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    if valid is not None:
        loss = loss * valid.astype(loss.dtype)
    return jnp.sum(loss) / num_boxes


def sigmoid_focal_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_boxes,
                       alpha: float = 0.25, gamma: float = 2.0,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RetinaNet focal loss, mean over mask pixels, sum over rows / num_boxes."""
    x = inputs.astype(jnp.float32).reshape(inputs.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    prob = jax.nn.sigmoid(x)
    # binary_cross_entropy_with_logits, elementwise, numerically stable
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = prob * t + (1.0 - prob) * (1.0 - t)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
        loss = alpha_t * loss
    loss = jnp.mean(loss, axis=1)
    if valid is not None:
        loss = loss * valid.astype(loss.dtype)
    return jnp.sum(loss) / num_boxes


def loss_masks(pred_masks: jnp.ndarray, target_masks: jnp.ndarray,
               row_valid: jnp.ndarray, num_boxes) -> dict:
    """Padded mask criterion (reference criterion.py:119-147).

    pred_masks: (N, h, w) logits already gathered to match rows (the engine's
    matcher emits a permutation, so the gather is a static ``take``);
    target_masks: (N, H, W); row_valid: (N,) — False rows are padding.
    Predictions are bilinearly resized to the target size like the
    reference's ``interpolate(..., mode="bilinear", align_corners=False)``.
    """
    n, th, tw = target_masks.shape
    src = jax.image.resize(pred_masks.astype(jnp.float32), (n, th, tw),
                           method="linear", antialias=False)
    return {
        "loss_mask": sigmoid_focal_loss(src, target_masks, num_boxes,
                                        valid=row_valid),
        "loss_dice": dice_loss(src, target_masks, num_boxes, valid=row_valid),
    }


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

class MHAttentionMap(nn.Module):
    """Per-head 2-D attention maps (reference segmentation.py:140-169).

    q: (B, Q, E); k: (B, H, W, E) channels-last feature map. Returns
    (B, Q, heads, H, W) softmax weights. The reference's conv2d with the
    k_linear weight is a 1x1 conv == a Dense over the channel axis here.
    Softmax is over the flattened (heads, H, W) axis — the reference
    flattens from dim 2, folding heads into the normalization. fp32 softmax.
    """

    query_dim: int
    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dt = self.dtype
        q_lin = nn.Dense(self.hidden_dim, dtype=dt, name="q_linear")
        k_lin = nn.Dense(self.hidden_dim, dtype=dt, name="k_linear")
        bq, qn, _ = q.shape
        _, h, w, _ = k.shape
        nh = self.num_heads
        hd = self.hidden_dim // nh

        qp = q_lin(q.astype(dt)).reshape(bq, qn, nh, hd)
        kp = k_lin(k.astype(dt)).reshape(bq, h, w, nh, hd)
        norm = float(hd) ** -0.5
        weights = jnp.einsum("bqnc,bhwnc->bqnhw", qp * norm, kp)

        weights = weights.astype(jnp.float32)
        if mask is not None:  # (B, H, W), True = padding
            from tubelet_transformer_tpu.models.layers import (
                _large_negative,
            )

            neg = _large_negative()
            weights = jnp.where(mask[:, None, None, :, :], neg, weights)
        flat = weights.reshape(bq, qn, -1)
        flat = jax.nn.softmax(flat, axis=-1)
        return flat.reshape(bq, qn, nh, h, w).astype(dt)


def _nearest_resize_torch(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on (N, H, W, C)."""
    from tubelet_transformer_tpu.models.tuber import nearest_resize_mask

    return nearest_resize_mask(x, int(size[0]), int(size[1]))


class MaskHeadSmallConv(nn.Module):
    """FPN-style mask head (reference segmentation.py:69-137), NHWC.

    ``dim`` is hidden_dim + num_heads (projected memory concat attention
    maps); ``fpn_dims`` are the backbone pyramid channel counts, finest
    last; ``context_dim`` is the transformer hidden dim.
    """

    dim: int
    fpn_dims: Sequence[int]
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bbox_mask: jnp.ndarray,
                 fpns: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """x: (B, H, W, dim_ctx); bbox_mask: (B, Q, heads, H, W);
        fpns: coarse→fine (B, Hi, Wi, Ci). Returns (B*Q, H', W', 1) logits."""
        dt = self.dtype
        cd = self.context_dim
        inter = [self.dim, cd // 2, cd // 4, cd // 8, cd // 16, cd // 64]

        def conv(ch, name):
            return nn.Conv(ch, (3, 3), padding=1, dtype=dt, name=name)

        def gn(name):
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt,
                                name=name)

        b, q, nh, h, w = bbox_mask.shape
        # expand memory per query and concat the attention maps as channels
        xe = jnp.repeat(x.astype(dt), q, axis=0)  # (B*Q, H, W, ctx)
        am = bbox_mask.astype(dt).reshape(b * q, nh, h, w).transpose(0, 2, 3, 1)
        x = jnp.concatenate([xe, am], axis=-1)

        x = nn.relu(gn("gn1")(conv(self.dim, "lay1")(x)))
        x = nn.relu(gn("gn2")(conv(inter[1], "lay2")(x)))

        if not (len(self.fpn_dims) == len(fpns) == 3):
            raise ValueError(
                f"MaskHeadSmallConv expects exactly 3 FPN levels, got "
                f"{len(self.fpn_dims)} dims / {len(fpns)} features")
        for i, ich in enumerate(inter[2:5]):
            cur = nn.Conv(inter[i + 1], (1, 1), dtype=dt,
                          name=f"adapter{i + 1}")(fpns[i].astype(dt))
            if cur.shape[0] != x.shape[0]:
                cur = jnp.repeat(cur, x.shape[0] // cur.shape[0], axis=0)
            x = cur + _nearest_resize_torch(x, cur.shape[1:3])
            x = nn.relu(gn(f"gn{i + 3}")(conv(ich, f"lay{i + 3}")(x)))

        return nn.Conv(1, (3, 3), padding=1, dtype=dt, name="out_lay")(x)


# ---------------------------------------------------------------------------
# Postprocess (used core of PostProcessSegm, segmentation.py:218-238)
# ---------------------------------------------------------------------------

def postprocess_masks(pred_masks: jnp.ndarray, size,
                      threshold: float = 0.5) -> jnp.ndarray:
    """(B, Q, h, w) logits -> (B, Q, H, W) bool at the padded canvas size.

    Bilinear (align_corners=False) upsample + sigmoid threshold, on device
    with static shapes. Per-image crop to unpadded size and resize to the
    original resolution — the tail of the reference's PostProcessSegm — is
    host-side bookkeeping the caller does with the sizes it tracked (same
    split as the reference: tensor work on the accelerator, PIL-ish resizes
    on host).
    """
    b, q, h, w = pred_masks.shape
    up = jax.image.resize(pred_masks.astype(jnp.float32),
                          (b, q, size[0], size[1]),
                          method="linear", antialias=False)
    return jax.nn.sigmoid(up) > threshold
