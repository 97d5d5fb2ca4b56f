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
