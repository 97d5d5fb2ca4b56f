"""Oracle parity for the segmentation heads/losses vs the reference torch code
(models/detr/segmentation.py)."""

import jax.numpy as jnp
import numpy as np
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.models import segmentation as seg
from tubelet_transformer_tpu.train import torch_convert as tc


def _sd(mod, prefix="x"):
    return {f"{prefix}.{k}": v for k, v in mod.state_dict().items()}


def test_dice_and_focal_losses_match_reference(rng):
    ref = load_ref("models.detr.segmentation")
    n, l = 7, 45
    logits = rng.normal(0, 2, (n, l)).astype(np.float32)
    targets = (rng.uniform(size=(n, l)) > 0.6).astype(np.float32)
    for num_boxes in (1.0, 4.5, 7.0):
        ref_dice = ref.dice_loss(torch.from_numpy(logits),
                                 torch.from_numpy(targets), num_boxes)
        ref_focal = ref.sigmoid_focal_loss(torch.from_numpy(logits),
                                           torch.from_numpy(targets), num_boxes)
        np.testing.assert_allclose(
            np.asarray(seg.dice_loss(logits, targets, num_boxes)),
            ref_dice.item(), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(seg.sigmoid_focal_loss(logits, targets, num_boxes)),
            ref_focal.item(), rtol=1e-5)


def test_losses_padded_rows_match_unpadded_reference(rng):
    """Padded (static-shape) rows with valid=False must reproduce the
    reference on the live subset — the TPU replacement for dynamic gathers."""
    ref = load_ref("models.detr.segmentation")
    live, pad, l = 5, 3, 30
    logits = rng.normal(0, 1, (live + pad, l)).astype(np.float32)
    targets = (rng.uniform(size=(live + pad, l)) > 0.5).astype(np.float32)
    valid = np.array([True] * live + [False] * pad)
    num_boxes = float(live)

    ours_d = seg.dice_loss(logits, targets, num_boxes, valid=valid)
    ours_f = seg.sigmoid_focal_loss(logits, targets, num_boxes, valid=valid)
    ref_d = ref.dice_loss(torch.from_numpy(logits[:live]),
                          torch.from_numpy(targets[:live]), num_boxes)
    ref_f = ref.sigmoid_focal_loss(torch.from_numpy(logits[:live]),
                                   torch.from_numpy(targets[:live]), num_boxes)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d.item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_f), ref_f.item(), rtol=1e-5)


def test_mh_attention_map_matches_reference(rng):
    ref = load_ref("models.detr.segmentation")
    torch.manual_seed(0)
    e, nh, b, q, h, w = 64, 4, 2, 5, 6, 9
    m = ref.MHAttentionMap(e, e, nh, dropout=0.0)
    m.eval()

    qx = rng.normal(0, 1, (b, q, e)).astype(np.float32)
    kx = rng.normal(0, 1, (b, e, h, w)).astype(np.float32)
    mask = np.zeros((b, h, w), bool)
    mask[1, :, 6:] = True

    with torch.no_grad():
        theirs = m(torch.from_numpy(qx), torch.from_numpy(kx),
                   mask=torch.from_numpy(mask))

    ours = seg.MHAttentionMap(e, e, nh).apply(
        {"params": tc.mh_attention_map_params(_sd(m), "x")},
        qx, kx.transpose(0, 2, 3, 1), mask)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_mask_head_matches_reference(rng):
    ref = load_ref("models.detr.segmentation")
    torch.manual_seed(1)
    cd, nh = 128, 8          # context dim, heads
    dim = cd + nh
    fpn_dims = [48, 24, 16]  # coarse -> fine channel counts
    b, q, h, w = 2, 3, 4, 6
    m = ref.MaskHeadSmallConv(dim, fpn_dims, cd)
    m.eval()

    x = rng.normal(0, 1, (b, cd, h, w)).astype(np.float32)
    bbox_mask = rng.uniform(0, 1, (b, q, nh, h, w)).astype(np.float32)
    fpns = [rng.normal(0, 1, (b, c, h * 2 ** (i + 1), w * 2 ** (i + 1)))
            .astype(np.float32) for i, c in enumerate(fpn_dims)]

    with torch.no_grad():
        theirs = m(torch.from_numpy(x), torch.from_numpy(bbox_mask),
                   [torch.from_numpy(f) for f in fpns])

    ours = seg.MaskHeadSmallConv(dim, fpn_dims, cd).apply(
        {"params": tc.mask_head_params(_sd(m), "x")},
        x.transpose(0, 2, 3, 1), bbox_mask,
        [f.transpose(0, 2, 3, 1) for f in fpns])
    np.testing.assert_allclose(np.asarray(ours)[..., 0],
                               theirs.numpy()[:, 0],
                               rtol=1e-3, atol=1e-4)


def test_loss_masks_matches_reference_composition(rng):
    """Our padded loss_masks == reference interpolate + dice/focal on the
    matched rows (criterion.py:119-147 semantics)."""
    ref = load_ref("models.detr.segmentation")
    live, pad = 4, 2
    n = live + pad
    pred = rng.normal(0, 1, (n, 8, 12)).astype(np.float32)
    tgt = (rng.uniform(size=(n, 16, 24)) > 0.5).astype(np.float32)
    valid = np.array([True] * live + [False] * pad)
    num_boxes = float(live)

    ours = seg.loss_masks(pred, tgt, valid, num_boxes)

    src = torch.nn.functional.interpolate(
        torch.from_numpy(pred[:live])[:, None], size=(16, 24),
        mode="bilinear", align_corners=False)[:, 0].flatten(1)
    t = torch.from_numpy(tgt[:live]).flatten(1)
    np.testing.assert_allclose(np.asarray(ours["loss_mask"]),
                               ref.sigmoid_focal_loss(src, t, num_boxes).item(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["loss_dice"]),
                               ref.dice_loss(src, t, num_boxes).item(),
                               rtol=1e-4)


def test_postprocess_masks_matches_torch_bilinear(rng):
    pred = rng.normal(0, 1.5, (2, 3, 8, 12)).astype(np.float32)
    ours = seg.postprocess_masks(pred, (16, 24), threshold=0.5)
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(pred), size=(16, 24), mode="bilinear",
        align_corners=False).sigmoid() > 0.5
    assert (np.asarray(ours) == theirs.numpy()).mean() > 0.995  # ties at edges
