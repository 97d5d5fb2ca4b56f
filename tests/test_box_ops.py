"""Parity tests: jnp box ops vs the reference's torch box ops."""

import numpy as np
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.ops import box_ops


def _rand_boxes(rng, n):
    cx = rng.uniform(0.2, 0.8, n)
    cy = rng.uniform(0.2, 0.8, n)
    w = rng.uniform(0.05, 0.4, n)
    h = rng.uniform(0.05, 0.4, n)
    return np.stack([cx, cy, w, h], axis=1).astype(np.float32)


def test_cxcywh_xyxy_roundtrip(rng):
    b = _rand_boxes(rng, 17)
    xyxy = np.asarray(box_ops.box_cxcywh_to_xyxy(b))
    back = np.asarray(box_ops.box_xyxy_to_cxcywh(xyxy))
    np.testing.assert_allclose(back, b, rtol=1e-6, atol=1e-6)


def test_conversion_matches_reference(rng):
    ref = load_ref("utils.box_ops")
    b = _rand_boxes(rng, 9)
    ours = np.asarray(box_ops.box_cxcywh_to_xyxy(b))
    theirs = ref.box_cxcywh_to_xyxy(torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_iou_giou_match_reference(rng):
    ref = load_ref("utils.box_ops")
    a = np.asarray(box_ops.box_cxcywh_to_xyxy(_rand_boxes(rng, 12)))
    b = np.asarray(box_ops.box_cxcywh_to_xyxy(_rand_boxes(rng, 7)))

    iou_ours, _ = box_ops.box_iou(a, b)
    iou_ref, _ = ref.box_iou(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(iou_ours), iou_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    giou_ours = np.asarray(box_ops.generalized_box_iou(a, b))
    giou_ref = ref.generalized_box_iou(
        torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(giou_ours, giou_ref, rtol=1e-5, atol=1e-6)


def test_elementwise_giou_equals_diag(rng):
    a = np.asarray(box_ops.box_cxcywh_to_xyxy(_rand_boxes(rng, 10)))
    b = np.asarray(box_ops.box_cxcywh_to_xyxy(_rand_boxes(rng, 10)))
    full = np.asarray(box_ops.generalized_box_iou(a, b))
    elem = np.asarray(box_ops.elementwise_giou(a, b))
    np.testing.assert_allclose(elem, np.diag(full), rtol=1e-5, atol=1e-6)
