"""Training-curve plotting from the MetricsWriter JSONL."""

import json
import os

from tubelet_transformer_tpu.plots import load_metrics, plot_training


def _write_jsonl(path):
    rows = []
    for step in range(5):
        rows.append({"tag": "train/total_loss", "value": 10.0 / (step + 1),
                     "step": step, "ts": 0.0})
        rows.append({"tag": "learning_rate", "value": 1e-4, "step": step,
                     "ts": 0.0})
    rows.append({"tag": "val/val_mAP_epoch", "value": 0.3, "step": 0,
                 "ts": 0.0})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_load_and_plot(tmp_path):
    jl = tmp_path / "metrics.jsonl"
    _write_jsonl(jl)
    series = load_metrics(str(jl))
    assert series["train/total_loss"][0] == list(range(5))
    out = plot_training(str(jl), str(tmp_path / "curves.png"))
    assert os.path.getsize(out) > 1000

    # experiment-dir resolution (tb_log/metrics.jsonl)
    d = tmp_path / "exp" / "tb_log"
    d.mkdir(parents=True)
    _write_jsonl(d / "metrics.jsonl")
    assert "learning_rate" in load_metrics(str(tmp_path / "exp"))


def test_precision_recall_plot(tmp_path):
    """PR curves from the validate txt dump format end to end."""
    import numpy as np

    from tubelet_transformer_tpu.eval.ava_eval import (
        AVADetectionEvaluator, dump_detections_txt)
    from tubelet_transformer_tpu.plots import plot_precision_recall

    class_num = 5
    # GT rows: key [b, key_pos, x1, y1, x2, y2, multihot...]
    hot1 = [0.0] * class_num
    hot1[0] = 1.0      # class id 1
    hot2 = [0.0] * class_num
    hot2[2] = 1.0      # class id 3
    gt = tmp_path / "GT_0.txt"
    dump_detections_txt(str(gt), [
        ("vid,0001", [0, 0, 10, 10, 50, 50] + hot1),
        ("vid,0001", [0, 0, 60, 60, 90, 90] + hot2),
    ])
    # det rows: key [x1, y1, x2, y2, scores..., binary]
    s1 = [0.0] * class_num
    s1[0] = 0.9        # hits GT class 1
    s2 = [0.0] * class_num
    s2[2] = 0.7        # hits GT class 3
    s3 = [0.0] * class_num
    s3[0] = 0.4        # false positive for class 1
    det = tmp_path / "0.txt"
    dump_detections_txt(str(det), [
        ("vid,0001", [11, 11, 49, 49] + s1 + [0.9]),
        ("vid,0001", [61, 61, 89, 89] + s2 + [0.9]),
        ("vid,0001", [200, 200, 240, 240] + s3 + [0.4]),
    ])

    # curves agree with evaluate() APs
    ev = AVADetectionEvaluator(class_num=class_num)
    ev.load_gt_from_files([str(gt)])
    ev.load_detections_from_files([str(det)])
    maps, result = ev.evaluate()
    curves = ev.precision_recall_curves()
    assert curves[1][2] == result[
        "PascalBoxes_PerformanceByCategory/AP@0.5IOU/1"] == 1.0
    assert curves[3][2] == 1.0
    p, r = curves[1][0], curves[1][1]
    assert r[-1] == 1.0 and p[0] == 1.0

    out = plot_precision_recall([str(gt)], [str(det)],
                                str(tmp_path / "pr.png"),
                                class_num=class_num)
    assert os.path.getsize(out) > 1000
    mean = float(np.nanmean([ap for _, _, ap in curves.values()]))
    assert mean == 1.0
