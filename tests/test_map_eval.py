"""Golden test: our numpy mAP evaluator vs the reference's vendored TF-OD
evaluator, driven through the reference txt dump format."""

import numpy as np
import pytest

from ref_loader import load_ref
from tubelet_transformer_tpu.eval.ava_eval import (
    AVADetectionEvaluator,
    dump_detections_txt,
)

C = 5  # classes


def _labelmap(tmp_path):
    p = tmp_path / "labels.pbtxt"
    lines = []
    for i in range(1, C + 1):
        lines += ["item {", f'  name: "class_{i}"', f"  id: {i}", "}"]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _rand_box(rng, size=200):
    x1, y1 = rng.uniform(0, size * 0.6, 2)
    w, h = rng.uniform(20, size * 0.4, 2)
    return [x1, y1, x1 + w, y1 + h]


def _make_files(tmp_path, rng, n_images=12, q=4):
    gt_rows, det_rows = [], []
    for img in range(n_images):
        key = f"vid{img % 3},{1000 + img}"
        n_gt = rng.integers(1, 4)
        for _ in range(n_gt):
            labels = (rng.uniform(0, 1, C) < 0.4).astype(float)
            labels[rng.integers(0, C)] = 1.0
            gt_rows.append((key, [0, 0] + _rand_box(rng) + labels.tolist()))
        for _ in range(q):
            scores = rng.uniform(0, 1, C)
            binary = rng.uniform(0, 1)
            det_rows.append((key, _rand_box(rng) + scores.tolist() + [binary]))
    gt_path = str(tmp_path / "GT_0.txt")
    det_path = str(tmp_path / "det_0.txt")
    dump_detections_txt(gt_path, gt_rows)
    dump_detections_txt(det_path, det_rows)
    return gt_path, det_path


def test_detection_gt_order_independent(rng):
    """Regression (round-2 bug): the live eval loop adds each image's
    detections BEFORE its ground truth; eager TP assignment saw an empty
    GT table and marked every live detection FP (live mAP silently 0).
    The evaluator must give identical results for either insertion order."""
    from tubelet_transformer_tpu.eval.map_eval import PascalMAPEvaluator

    imgs = []
    for k in range(6):
        gt = np.array([_rand_box(rng) for _ in range(2)])
        det = np.concatenate([gt + rng.normal(0, 3, gt.shape),
                              np.array([_rand_box(rng)])])
        scores = rng.uniform(0.1, 1, (3, 3))
        imgs.append((f"im{k}", det, scores, gt))

    ev_gt_first = PascalMAPEvaluator([1, 2, 3], 0.5)
    ev_det_first = PascalMAPEvaluator([1, 2, 3], 0.5)
    for key, det, scores, gt in imgs:
        ev_gt_first.add_ground_truth(key, gt, np.array([1, 2]))
        ev_gt_first.add_detections_matrix(key, det, scores)
        ev_det_first.add_detections_matrix(key, det, scores)  # live order
        ev_det_first.add_ground_truth(key, gt, np.array([1, 2]))
    m1, aps1 = ev_gt_first.evaluate()
    m2, aps2 = ev_det_first.evaluate()
    assert m1 > 0, "fixture must produce at least one TP"
    np.testing.assert_allclose(m1, m2)
    for c in aps1:
        np.testing.assert_allclose(aps1[c], aps2[c])
    # row API too
    ev3 = PascalMAPEvaluator([1, 2, 3], 0.5)
    for key, det, scores, gt in imgs:
        ev3.add_detections(key, det, np.array([1, 2, 3]), scores[:, 0])
        ev3.add_ground_truth(key, gt, np.array([1, 2]))
    m3, _ = ev3.evaluate()
    ev4 = PascalMAPEvaluator([1, 2, 3], 0.5)
    for key, det, scores, gt in imgs:
        ev4.add_ground_truth(key, gt, np.array([1, 2]))
        ev4.add_detections(key, det, np.array([1, 2, 3]), scores[:, 0])
    m4, _ = ev4.evaluate()
    np.testing.assert_allclose(m3, m4)


@pytest.mark.parametrize("size_min,size_max", [
    (0.0, 555.0 * 555.0),       # the reference default window
    (0.0, 2500.0),              # small-box band
    (2500.0, 555.0 * 555.0),    # large-box band
])
def test_person_ap_size_bands_match_reference(tmp_path, rng, size_min,
                                              size_max):
    """Size-banded person AP vs STDetectionEvaluaterSinglePerson's
    threshold_size_min/max family (evaluate_ava.py:186-316)."""
    np.float = np.float64
    np.NAN = np.nan
    label_path = _labelmap(tmp_path)

    # boxes spanning both bands; binary score in the last column
    gt_rows, det_rows, ours_gt, ours_det = [], [], {}, {}
    for img in range(10):
        key = f"vid{img % 2},{1000 + img}"
        gt, det = ours_gt.setdefault(key, []), ours_det.setdefault(key, [])
        for _ in range(int(rng.integers(1, 4))):
            x1, y1 = rng.uniform(0, 100, 2)
            side = rng.choice([20.0, 120.0])  # ~400 px^2 vs ~14400 px^2
            box = [x1, y1, x1 + side, y1 + side * rng.uniform(0.8, 1.2)]
            gt_rows.append((key, [0, 0] + box + [1.0]))
            gt.append(box)
        for _ in range(4):
            x1, y1 = rng.uniform(0, 100, 2)
            side = rng.choice([20.0, 120.0])
            box = [x1, y1, x1 + side, y1 + side * rng.uniform(0.8, 1.2)]
            binary = float(rng.uniform(-0.1, 1.0))  # some dropped (<=0)
            det_rows.append((key, box + [0.0] * C + [binary]))
            det.append(box + [binary])
    gt_path = str(tmp_path / "GT_0.txt")
    det_path = str(tmp_path / "det_0.txt")
    dump_detections_txt(gt_path, gt_rows)
    dump_detections_txt(det_path, det_rows)

    ref_mod = load_ref("evaluates.evaluate_ava")
    ref = ref_mod.STDetectionEvaluaterSinglePerson(
        label_path, tiou_thresholds=[0.5],
        threshold_size_min=size_min, threshold_size_max=size_max)
    ref.load_GT_from_path([gt_path])
    ref.load_detection_from_path([det_path])
    ref_map, _ = ref.evaluate()

    from tubelet_transformer_tpu.eval.ava_eval import (
        PersonDetectionEvaluator,
    )

    ours = PersonDetectionEvaluator(iou_thresholds=(0.5,),
                                    size_min=size_min, size_max=size_max)
    for key in ours_gt:
        k = key  # reference keys keep the comma; ours are fed identically
        if ours_gt[key]:
            ours.add_ground_truth(k, np.asarray(ours_gt[key], float))
        if ours_det[key]:
            d = np.asarray(ours_det[key], float)
            ours.add_detections(k, d[:, :4], d[:, 4])
    our_ap = ours.evaluate()[0]
    np.testing.assert_allclose(our_ap, ref_map[0], rtol=1e-8, atol=1e-10)


def test_map_matches_reference_evaluator(tmp_path, rng):
    # reference metrics.py uses aliases removed in numpy 2 (np.float/np.NAN)
    np.float = np.float64
    np.NAN = np.nan
    gt_path, det_path = _make_files(tmp_path, rng)
    label_path = _labelmap(tmp_path)

    ref_mod = load_ref("evaluates.evaluate_ava")
    ref = ref_mod.STDetectionEvaluater(label_path, tiou_thresholds=[0.5],
                                       class_num=C)
    ref.load_GT_from_path([gt_path])
    ref.load_detection_from_path([det_path])
    ref_map, ref_result = ref.evaluate()

    ours = AVADetectionEvaluator(label_path=label_path, class_num=C,
                                 iou_thresholds=(0.5,))
    ours.load_gt_from_files([gt_path])
    ours.load_detections_from_files([det_path])
    our_map, our_result = ours.evaluate()

    np.testing.assert_allclose(our_map[0], ref_map[0], rtol=1e-8, atol=1e-10)
    # per-class APs too
    for c in range(1, C + 1):
        ref_keys = [k for k in ref_result
                    if k.startswith("PascalBoxes_PerformanceByCategory")
                    and k.endswith(f"class_{c}")]
        assert len(ref_keys) == 1
        ref_ap = ref_result[ref_keys[0]]
        our_ap = our_result[f"PascalBoxes_PerformanceByCategory/AP@0.5IOU/{c}"]
        if np.isnan(ref_ap):
            assert np.isnan(our_ap)
        else:
            np.testing.assert_allclose(our_ap, ref_ap, rtol=1e-8, atol=1e-10)
