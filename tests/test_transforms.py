"""Parity of box-aware video transforms vs the reference pipeline."""

import numpy as np
import torch
from PIL import Image

from ref_loader import load_ref
from tubelet_transformer_tpu.data import transforms as T


def _clip_and_target(rng, t=3, h=60, w=90, n=4):
    clip = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
    x1 = rng.uniform(0, w * 0.5, n)
    y1 = rng.uniform(0, h * 0.5, n)
    bw = rng.uniform(8, w * 0.4, n)
    bh = rng.uniform(8, h * 0.4, n)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
    labels = rng.integers(0, 5, (n,)).astype(np.float32)
    return clip, boxes, labels


def _ref_target(boxes, labels, key_pos=1):
    tcol = np.full((len(boxes), 1), float(key_pos), np.float32)
    b5 = np.concatenate([tcol, boxes], 1)
    raw = np.concatenate([np.zeros((len(boxes), 1), np.float32), b5], 1)
    return {
        "boxes": torch.from_numpy(b5.copy()),
        "raw_boxes": torch.from_numpy(raw.copy()),
        "labels": torch.from_numpy(labels.copy()),
        "size": torch.tensor([boxes.shape[0]]),
    }


def _pil(clip):
    return [Image.fromarray(f) for f in clip]


def test_crop_matches_reference(rng):
    vt = load_ref("datasets.video_transforms")
    clip, boxes, labels = _clip_and_target(rng)
    region = (7, 11, 40, 60)  # i, j, h, w

    ref_imgs, ref_t = vt.crop(_pil(clip), _ref_target(boxes, labels), region)
    our_clip, our_boxes, our_labels = T.crop_clip(
        clip, boxes.copy(), labels.copy(), region)

    np.testing.assert_array_equal(our_clip[0], np.asarray(ref_imgs[0]))
    np.testing.assert_allclose(our_boxes,
                               ref_t["boxes"][:, 1:].numpy(), atol=1e-5)
    np.testing.assert_array_equal(our_labels, ref_t["labels"].numpy())


def test_hflip_matches_reference(rng):
    vt = load_ref("datasets.video_transforms")
    clip, boxes, labels = _clip_and_target(rng)
    ref_imgs, ref_t = vt.hflip(_pil(clip), _ref_target(boxes, labels))
    our_clip, our_boxes = T.hflip_clip(clip, boxes.copy())
    np.testing.assert_array_equal(our_clip[1], np.asarray(ref_imgs[1]))
    np.testing.assert_allclose(our_boxes, ref_t["boxes"][:, 1:].numpy(),
                               atol=1e-5)


def test_resize_custom_matches_reference(rng):
    vt = load_ref("datasets.video_transforms")
    clip, boxes, labels = _clip_and_target(rng, h=64, w=96)
    ref_imgs, ref_t = vt.Resize_Custom(48)(_pil(clip),
                                           _ref_target(boxes, labels))
    our_clip, our_boxes, our_labels = T.resize_custom(
        clip, boxes.copy(), labels.copy(), 48)
    assert our_clip.shape[1:3] == (np.asarray(ref_imgs[0]).shape[:2])
    np.testing.assert_allclose(our_boxes, ref_t["boxes"][:, 1:].numpy(),
                               atol=1e-5)


def test_normalize_matches_reference(rng):
    vt = load_ref("datasets.video_transforms")
    clip, boxes, labels = _clip_and_target(rng)
    norm = vt.Compose([vt.ToTensor(),
                       vt.Normalize([0.485, 0.456, 0.406],
                                    [0.229, 0.224, 0.225])])
    ref_imgs, ref_t = norm(_pil(clip), _ref_target(boxes, labels))
    our_clip, our_boxes = T.normalize_clip(clip, boxes.copy())
    np.testing.assert_allclose(
        our_clip[0], ref_imgs[0].numpy().transpose(1, 2, 0),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(our_boxes, ref_t["boxes"][:, 1:].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_color_jitter_matches_reference(rng):
    import random as py_random

    vt = load_ref("datasets.video_transforms")
    clip, boxes, labels = _clip_and_target(rng)

    class FixedRng:
        """Drives both pipelines with identical jitter draws."""

        def __init__(self, vals):
            self.vals = list(vals)

        def integers(self, lo, hi):
            return self.vals.pop(0)

    draws = [5, -12, 7]
    py_random.seed(0)
    orig_randint = py_random.randint
    seq = list(draws)
    py_random.randint = lambda a, b: seq.pop(0)
    try:
        ref_clip, _ = vt.ColorJitter()(_pil(clip), {})
    finally:
        py_random.randint = orig_randint

    ours = T.color_jitter_hsv(clip, FixedRng(draws))
    np.testing.assert_array_equal(ours, ref_clip)
