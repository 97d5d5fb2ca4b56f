"""Oracle tests: eval/np_box.py vs the reference's vendored TF-OD numpy box /
mask libraries (evaluates/utils/{np_box_ops,np_box_list,np_box_list_ops,
np_mask_ops}.py), plus the jit NMS counterpart in ops/box_ops.nms_padded."""

import numpy as np
import pytest

from ref_loader import load_ref
from tubelet_transformer_tpu.eval import np_box

RNG = np.random.default_rng(7)


def _boxes(n, size=100.0, rng=RNG):
    ymin = rng.uniform(0, size * 0.6, n)
    xmin = rng.uniform(0, size * 0.6, n)
    h = rng.uniform(5, size * 0.4, n)
    w = rng.uniform(5, size * 0.4, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], axis=1)


def _unique_scores(n, rng=RNG):
    # distinct scores: the reference's argsort tie order is unspecified
    return rng.permutation(np.linspace(0.01, 0.99, n))


@pytest.fixture(scope="module")
def ref():
    box_ops = load_ref("evaluates.utils.np_box_ops")
    box_list = load_ref("evaluates.utils.np_box_list")
    list_ops = load_ref("evaluates.utils.np_box_list_ops")
    mask_ops = load_ref("evaluates.utils.np_mask_ops")
    return box_ops, box_list, list_ops, mask_ops


def test_pairwise_measures_match(ref):
    box_ops = ref[0]
    a, b = _boxes(13), _boxes(9)
    np.testing.assert_allclose(np_box.area(a), box_ops.area(a))
    np.testing.assert_allclose(np_box.intersection(a, b), box_ops.intersection(a, b))
    np.testing.assert_allclose(np_box.iou(a, b), box_ops.iou(a, b))
    np.testing.assert_allclose(np_box.ioa(a, b), box_ops.ioa(a, b))


@pytest.mark.parametrize("iou_thresh,score_thresh,max_out", [
    (0.5, -10.0, 10000),
    (0.3, 0.25, 10000),
    (0.7, -10.0, 3),
    (1.0, 0.5, 4),      # short-circuit path: top-k only
    (0.0, 0.99, 5),     # score filter removes everything
])
def test_nms_matches_reference(ref, iou_thresh, score_thresh, max_out):
    _, box_list, list_ops, _ = ref
    n = 40
    # clustered boxes (jittered copies of 8 anchors) so NMS actually suppresses
    base = _boxes(8)
    boxes = base[RNG.integers(0, 8, n)] + RNG.normal(0, 2.5, (n, 4))
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1.0)
    scores = _unique_scores(n)

    bl = box_list.BoxList(boxes)
    bl.add_field("scores", scores)
    ref_out = list_ops.non_max_suppression(
        bl, max_output_size=max_out, iou_threshold=iou_thresh,
        score_threshold=score_thresh)

    keep = np_box.non_max_suppression(
        boxes, scores, max_output_size=max_out, iou_threshold=iou_thresh,
        score_threshold=score_thresh)
    np.testing.assert_allclose(boxes[keep], ref_out.get())
    np.testing.assert_allclose(scores[keep], ref_out.get_field("scores"))


def test_multiclass_nms_matches_reference(ref):
    _, box_list, list_ops, _ = ref
    n, c = 30, 4
    boxes = _boxes(n)
    scores = RNG.permutation(np.linspace(0.01, 0.99, n * c)).reshape(n, c)

    bl = box_list.BoxList(boxes)
    bl.add_field("scores", scores)
    ref_out = list_ops.multi_class_non_max_suppression(
        bl, score_thresh=0.3, iou_thresh=0.5, max_output_size=6)

    b, s, cls = np_box.multi_class_non_max_suppression(
        boxes, scores, score_thresh=0.3, iou_thresh=0.5, max_output_size=6)
    np.testing.assert_allclose(b, ref_out.get())
    np.testing.assert_allclose(s, ref_out.get_field("scores"))
    np.testing.assert_allclose(cls.astype(float), ref_out.get_field("classes"))


def test_window_ops_match_reference(ref):
    _, box_list, list_ops, _ = ref
    boxes = _boxes(25)
    window = np.array([10.0, 10.0, 80.0, 90.0])

    ours_clip, _ = np_box.clip_to_window(boxes, window)
    np.testing.assert_allclose(
        ours_clip, list_ops.clip_to_window(box_list.BoxList(boxes), window).get())

    ours_pruned, ours_idx = np_box.prune_outside_window(boxes, window)
    ref_pruned, ref_idx = list_ops.prune_outside_window(
        box_list.BoxList(boxes), window)
    np.testing.assert_allclose(ours_pruned, ref_pruned.get())
    np.testing.assert_array_equal(ours_idx, ref_idx)

    np.testing.assert_allclose(
        np_box.change_coordinate_frame(boxes, window),
        list_ops.change_coordinate_frame(box_list.BoxList(boxes), window).get())

    np.testing.assert_allclose(
        np_box.scale(boxes, 0.5, 2.0),
        list_ops.scale(box_list.BoxList(boxes), 0.5, 2.0).get())


def test_prune_non_overlapping_matches_reference(ref):
    _, box_list, list_ops, _ = ref
    a, b = _boxes(20), _boxes(6)
    keep = np_box.prune_non_overlapping_boxes(a, b, minoverlap=0.3)
    ref_out = list_ops.prune_non_overlapping_boxes(
        box_list.BoxList(a), box_list.BoxList(b), minoverlap=0.3)
    np.testing.assert_allclose(a[keep], ref_out.get())


def test_mask_ops_match_reference(ref):
    mask_ops = ref[3]
    m1 = (RNG.uniform(size=(7, 24, 32)) < 0.35).astype(np.uint8)
    m2 = (RNG.uniform(size=(5, 24, 32)) < 0.35).astype(np.uint8)
    np.testing.assert_allclose(np_box.mask_area(m1), mask_ops.area(m1))
    np.testing.assert_allclose(np_box.mask_intersection(m1, m2),
                               mask_ops.intersection(m1, m2))
    np.testing.assert_allclose(np_box.mask_iou(m1, m2), mask_ops.iou(m1, m2))
    np.testing.assert_allclose(np_box.mask_ioa(m1, m2), mask_ops.ioa(m1, m2))
    with pytest.raises(ValueError):
        np_box.mask_area(m1.astype(np.float32))


def test_nms_padded_matches_host_nms():
    """ops/box_ops.nms_padded (jit, static shapes, padded) == host NMS."""
    import jax
    import jax.numpy as jnp
    from tubelet_transformer_tpu.ops import box_ops

    n, n_valid = 24, 17
    yx = _boxes(n_valid)
    # jit variant takes xyxy; host lib is axis-order agnostic as long as both
    # calls see the same layout — feed xyxy to both
    boxes = yx[:, [1, 0, 3, 2]]
    scores = _unique_scores(n_valid)
    keep_host = np_box.non_max_suppression(
        boxes, scores, max_output_size=n, iou_threshold=0.4,
        score_threshold=0.1)

    pad_boxes = np.zeros((n, 4)); pad_boxes[:n_valid] = boxes
    pad_scores = np.zeros(n); pad_scores[:n_valid] = scores
    valid = np.arange(n) < n_valid
    keep = jax.jit(box_ops.nms_padded, static_argnums=(3,))(
        jnp.asarray(pad_boxes), jnp.asarray(pad_scores), jnp.asarray(valid),
        n, 0.4, 0.1)
    got = np.flatnonzero(np.asarray(keep))
    np.testing.assert_array_equal(np.sort(keep_host), got)

    # max_outputs truncation keeps the top-scoring selections
    keep3 = jax.jit(box_ops.nms_padded, static_argnums=(3,))(
        jnp.asarray(pad_boxes), jnp.asarray(pad_scores), jnp.asarray(valid),
        3, 0.4, 0.1)
    got3 = np.flatnonzero(np.asarray(keep3))
    order = keep_host[np.argsort(scores[keep_host])[::-1]][:3]
    np.testing.assert_array_equal(np.sort(order), got3)
