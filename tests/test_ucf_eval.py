"""Golden test: UCF evaluator vs the reference STDetectionEvaluaterUCF."""

import numpy as np

from ref_loader import load_ref
from tubelet_transformer_tpu.eval.ava_eval import dump_detections_txt
from tubelet_transformer_tpu.eval.ucf_eval import UCFDetectionEvaluator

C = 24


def _rand_box(rng, size=200, tiny=False):
    if tiny:
        x1, y1 = rng.uniform(0, size, 2)
        return [x1, y1, x1 + 2, y1 + 2]
    x1, y1 = rng.uniform(0, size * 0.5, 2)
    w, h = rng.uniform(20, size * 0.4, 2)
    return [x1, y1, x1 + w, y1 + h]


def test_ucf_matches_reference(tmp_path, rng):
    np.float = np.float64
    np.NAN = np.nan

    gt_rows, det_rows = [], []
    for img in range(15):
        key = f"vid{img % 4}-{img}"
        # one GT box per frame (JHMDB-style); every ~5th is a tiny exclusion
        tiny = (img % 5 == 4)
        labels = np.zeros(C)
        labels[img % C] = 1.0
        gt_rows.append((key, [0, 0] + _rand_box(rng, tiny=tiny)
                        + labels.tolist()))
        for _ in range(3):
            scores = rng.uniform(0, 1, C + 1)  # incl. no-object col
            det_rows.append((key, _rand_box(rng) + scores.tolist()))
    gt_path, det_path = str(tmp_path / "GT_0.txt"), str(tmp_path / "0.txt")
    dump_detections_txt(gt_path, gt_rows)
    dump_detections_txt(det_path, det_rows)

    ref_mod = load_ref("evaluates.evaluate_ucf")
    ref = ref_mod.STDetectionEvaluaterUCF(tiou_thresholds=[0.5], class_num=C)
    ref.load_GT_from_path([gt_path])
    ref.load_detection_from_path([det_path])
    ref_map, _ = ref.evaluate()

    ours = UCFDetectionEvaluator(class_num=C, iou_thresholds=(0.5,))
    # feed through the array API using the same rows
    per_key_gt = {}
    for key, vals in gt_rows:
        per_key_gt.setdefault(key, []).append(vals)
    for key, rows in per_key_gt.items():
        boxes = np.asarray([r[2:6] for r in rows], float)
        onehot = np.asarray([r[6:] for r in rows], float)
        ours.add_ground_truth(key, boxes, onehot)
    per_key_det = {}
    for key, vals in det_rows:
        per_key_det.setdefault(key, []).append(vals)
    for key, rows in per_key_det.items():
        boxes = np.asarray([r[0:4] for r in rows], float)
        sm = np.asarray([r[4:] for r in rows], float)
        ours.add_detections(key, boxes, sm)
    our_map, _ = ours.evaluate()

    if np.isnan(ref_map[0]):
        assert np.isnan(our_map[0])
    else:
        np.testing.assert_allclose(our_map[0], ref_map[0], rtol=1e-8)
