"""Parity: padded jit criterion vs the reference SetCriterionAVA / SetCriterion."""

import numpy as np
import pytest
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.train import criterion as crit
from tubelet_transformer_tpu.train.postprocess import (
    postprocess_ava,
    postprocess_softmax,
)

B, Q, C, M = 3, 6, 7, 5          # batch, queries, classes, max boxes
L = 3                            # decoder layers (incl. final)
COST_CLASS, COST_BBOX, COST_GIOU = 12.0, 5.0, 2.0
EOS, WEIGHT = 0.1, 10.0


def _rand_boxes_cxcywh(rng, n):
    cx = rng.uniform(0.3, 0.7, n)
    cy = rng.uniform(0.3, 0.7, n)
    w = rng.uniform(0.1, 0.3, n)
    h = rng.uniform(0.1, 0.3, n)
    return np.stack([cx, cy, w, h], 1).astype(np.float32)


def _make_ava_case(rng):
    n_per = rng.integers(1, M + 1, B)
    logits = rng.normal(0, 1, (L, B, Q, C)).astype(np.float32)
    boxes = (0.25 + 0.5 / (1 + np.exp(-rng.normal(0, 1, (L, B, Q, 4))))).astype(
        np.float32) * 0.8
    logits_b = rng.normal(0, 1, (L, B, Q, 3)).astype(np.float32)

    ref_targets = []
    pad_boxes = np.zeros((B, M, 4), np.float32)
    pad_labels = np.zeros((B, M, C), np.float32)
    valid = np.zeros((B, M), bool)
    for b in range(B):
        n = int(n_per[b])
        bx = _rand_boxes_cxcywh(rng, n)
        lab = (rng.uniform(0, 1, (n, C)) < 0.3).astype(np.float32)
        lab[np.arange(n), rng.integers(0, C, n)] = 1.0  # at least one class
        tcol = np.full((n, 1), 7.0, np.float32)          # time col (stripped)
        ref_targets.append({
            "boxes": torch.from_numpy(np.concatenate([tcol, bx], 1)),
            "labels": torch.from_numpy(lab),
        })
        pad_boxes[b, :n] = bx
        pad_labels[b, :n] = lab
        valid[b, :n] = True

    outputs = {
        "pred_logits": logits[-1], "pred_boxes": boxes[-1],
        "pred_logits_b": logits_b[-1],
        "aux_logits": logits, "aux_boxes": boxes, "aux_logits_b": logits_b,
    }
    tgts = crit.TargetsAVA(boxes=pad_boxes, labels=pad_labels, valid=valid)
    return outputs, tgts, ref_targets, (logits, boxes, logits_b)


def _ref_criterion_ava():
    ref_c = load_ref("models.criterion")
    ref_m = load_ref("models.detr.matcher")
    m = ref_m.HungarianMatcher(cost_class=COST_CLASS, cost_bbox=COST_BBOX,
                               cost_giou=COST_GIOU)
    wd = {"loss_ce": 12.0, "loss_bbox": 5.0, "loss_giou": 2.0, "loss_ce_b": 1.0}
    return ref_c.SetCriterionAVA(
        WEIGHT, C, num_queries=Q, matcher=m, weight_dict=wd, eos_coef=EOS,
        losses=["labels", "boxes"], data_file="ava", evaluation=False)


def test_criterion_ava_matches_reference(rng):
    outputs, tgts, ref_targets, (logits, boxes, logits_b) = _make_ava_case(rng)

    ref = _ref_criterion_ava()
    ref_out = {
        "pred_logits": torch.from_numpy(logits[-1]),
        "pred_boxes": torch.from_numpy(boxes[-1]),
        "pred_logits_b": torch.from_numpy(logits_b[-1]),
        "aux_outputs": [
            {"pred_logits": torch.from_numpy(logits[i]),
             "pred_boxes": torch.from_numpy(boxes[i]),
             "pred_logits_b": torch.from_numpy(logits_b[i])}
            for i in range(L - 1)
        ],
    }
    with torch.no_grad():
        ref_losses = {k: float(v) for k, v in ref(ref_out, ref_targets).items()}

    ours = crit.criterion_ava(
        outputs, tgts, cost_class=COST_CLASS, cost_bbox=COST_BBOX,
        cost_giou=COST_GIOU, weight=WEIGHT, eos_coef=EOS, aux_loss=True)
    ours = {k: float(v) for k, v in ours.items()}

    for k in ["loss_ce", "loss_ce_b", "loss_bbox", "loss_giou",
              "loss_ce_0", "loss_ce_b_0", "loss_bbox_0", "loss_giou_0",
              "loss_ce_1", "loss_bbox_1"]:
        assert k in ref_losses, k
        np.testing.assert_allclose(ours[k], ref_losses[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_criterion_ucf_matches_reference(rng):
    T = 4  # temporal query groups
    n_cls = 5
    n_per = np.ones(B, np.int64)  # JHMDB: one person per frame
    key_pos = rng.integers(0, T, B)

    logits = rng.normal(0, 1, (L, B, Q * T, n_cls + 1)).astype(np.float32)
    boxes = (0.3 + 0.4 / (1 + np.exp(-rng.normal(0, 1, (L, B, Q * T, 4))))
             ).astype(np.float32)
    logits_b = rng.normal(0, 1, (L, B, 2)).astype(np.float32)
    vis = rng.integers(0, 2, B)

    ref_targets, pad_boxes = [], np.zeros((B, M, 4), np.float32)
    pad_labels = np.zeros((B, M), np.int32)
    valid = np.zeros((B, M), bool)
    for b in range(B):
        n = int(n_per[b])
        bx = _rand_boxes_cxcywh(rng, n)
        lab = rng.integers(0, n_cls, n)
        tcol = np.full((n, 1), float(key_pos[b]), np.float32)
        ref_targets.append({
            "boxes": torch.from_numpy(np.concatenate([tcol, bx], 1)),
            "labels": torch.from_numpy(lab.astype(np.int64)),
            "vis": torch.tensor([int(vis[b])]),
            "key_pos": torch.tensor(int(key_pos[b])),
        })
        pad_boxes[b, :n] = bx
        pad_labels[b, :n] = lab
        valid[b, :n] = True

    ref_c = load_ref("models.criterion")
    ref_m = load_ref("models.detr.matcher_ucf")
    m = ref_m.HungarianMatcher(cost_class=1.0, cost_bbox=COST_BBOX,
                               cost_giou=COST_GIOU)
    wd = {"loss_ce": 12.0, "loss_bbox": 5.0, "loss_giou": 2.0, "loss_ce_b": 1.0}
    ref = ref_c.SetCriterion(WEIGHT, n_cls, num_queries=Q, matcher=m,
                             weight_dict=wd, eos_coef=EOS,
                             losses=["labels", "boxes"], data_file="jhmdb",
                             evaluation=False)
    ref_out = {
        "pred_logits": torch.from_numpy(logits[-1]),
        "pred_boxes": torch.from_numpy(boxes[-1]),
        "pred_logits_b": torch.from_numpy(logits_b[-1]),
        "aux_outputs": [
            {"pred_logits": torch.from_numpy(logits[i]),
             "pred_boxes": torch.from_numpy(boxes[i]),
             "pred_logits_b": torch.from_numpy(logits_b[i])}
            for i in range(L - 1)
        ],
    }
    with torch.no_grad():
        ref_losses = {k: float(v) for k, v in ref(ref_out, ref_targets).items()}

    outputs = {
        "pred_logits": logits[-1], "pred_boxes": boxes[-1],
        "pred_logits_b": logits_b[-1],
        "aux_logits": logits, "aux_boxes": boxes, "aux_logits_b": logits_b,
    }
    tgts = crit.TargetsUCF(boxes=pad_boxes, labels=pad_labels, valid=valid,
                           vis=vis.astype(np.int32),
                           key_pos=key_pos.astype(np.int32))
    ours = crit.criterion_ucf(
        outputs, tgts, cost_class=1.0, cost_bbox=COST_BBOX,
        cost_giou=COST_GIOU, eos_coef=EOS, num_classes=n_cls,
        num_queries=Q, aux_loss=True)
    ours = {k: float(v) for k, v in ours.items()}

    for k in ["loss_ce", "loss_ce_b", "loss_bbox", "loss_giou",
              "loss_ce_0", "loss_bbox_0", "loss_giou_0"]:
        np.testing.assert_allclose(ours[k], ref_losses[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_postprocess_matches_reference(rng):
    ref_c = load_ref("models.criterion")
    logits = rng.normal(0, 2, (B, Q, C)).astype(np.float32)
    boxes = (0.3 + 0.4 / (1 + np.exp(-rng.normal(0, 1, (B, Q, 4))))
             ).astype(np.float32)
    logits_b = rng.normal(0, 2, (B, Q, 3)).astype(np.float32)
    sizes = np.array([[240, 320]] * B, np.float32)

    outputs = {"pred_logits": logits, "pred_boxes": boxes,
               "pred_logits_b": logits_b}
    t_out = {k: torch.from_numpy(v) for k, v in outputs.items()}

    with torch.no_grad():
        r_scores, r_boxes, r_b = ref_c.PostProcessAVA()(
            t_out, torch.from_numpy(sizes))
    scores, bxs, binr = postprocess_ava(outputs, sizes)
    np.testing.assert_allclose(np.asarray(scores), r_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bxs), r_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(binr), r_b, rtol=1e-4, atol=1e-5)

    with torch.no_grad():
        r_scores, r_boxes, r_b = ref_c.PostProcess()(
            t_out, torch.from_numpy(sizes))
    scores, bxs, binr = postprocess_softmax(outputs, sizes)
    np.testing.assert_allclose(np.asarray(scores), r_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bxs), r_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(binr), r_b, rtol=1e-4, atol=1e-5)
