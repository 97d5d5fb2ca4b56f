"""Tube linking + spatio-temporal IoU + video-mAP."""

import numpy as np

from tubelet_transformer_tpu.eval.video_map import (
    Tube,
    VideoMAPEvaluator,
    link_tubes,
    st_iou,
)


def _moving_box(f, speed=2.0):
    x = 10 + speed * f
    return np.array([x, 20, x + 30, 60], float)


def test_link_tubes_follows_moving_box():
    frame_dets = {f: (np.stack([_moving_box(f)]), np.array([0.9]))
                  for f in range(10)}
    tubes = link_tubes(frame_dets)
    assert len(tubes) == 1
    assert tubes[0].frames == list(range(10))
    assert abs(tubes[0].score - 0.9) < 1e-6


def test_link_tubes_splits_on_jump():
    frame_dets = {}
    for f in range(10):
        box = _moving_box(f) if f < 5 else _moving_box(f) + 200.0
        frame_dets[f] = (np.stack([box]), np.array([0.8]))
    tubes = link_tubes(frame_dets)
    assert len(tubes) == 2
    assert sorted(len(t.frames) for t in tubes) == [5, 5]


def test_st_iou_identical_and_disjoint():
    f = np.arange(8)
    b = np.stack([_moving_box(i) for i in range(8)])
    assert abs(st_iou(f, b, f, b) - 1.0) < 1e-9
    assert st_iou(f, b, f + 100, b) == 0.0
    # half temporal overlap, same boxes where overlapping
    f2 = np.arange(4, 12)
    b2 = np.stack([_moving_box(i) for i in range(4, 12)])
    v = st_iou(f, b, f2, b2)
    assert abs(v - (4 / 12) * 1.0) < 1e-9


def test_video_map_perfect_and_noisy():
    ev = VideoMAPEvaluator(num_classes=3, thresholds=(0.2, 0.5))
    gt_frames = np.arange(10)
    gt_boxes = np.stack([_moving_box(i) for i in range(10)])
    ev.add_gt_tube("v0", 1, gt_frames, gt_boxes)
    for f in range(10):
        ev.add_frame_detections("v0", f, np.stack([_moving_box(f)]),
                                np.array([1]), np.array([0.95]))
    # a wrong-class, wrong-place tube
    ev.add_gt_tube("v1", 2, gt_frames, gt_boxes + 300)
    for f in range(10):
        ev.add_frame_detections("v1", f, np.stack([_moving_box(f)]),
                                np.array([2]), np.array([0.5]))
    res = ev.evaluate()
    # class 1 perfect (AP 1); class 2 detection misses GT (AP 0); class 0 NaN
    assert abs(res[0.5] - 0.5) < 1e-9
    assert abs(res[0.2] - 0.5) < 1e-9


def test_video_map_ranking():
    """High-scoring correct tube + low-scoring false tube -> AP stays 1."""
    ev = VideoMAPEvaluator(num_classes=1, thresholds=(0.5,))
    gt_frames = np.arange(6)
    gt_boxes = np.stack([_moving_box(i) for i in range(6)])
    ev.add_gt_tube("v0", 0, gt_frames, gt_boxes)
    for f in range(6):
        ev.add_frame_detections("v0", f, np.stack([_moving_box(f)]),
                                np.array([0]), np.array([0.9]))
    for f in range(6):
        ev.add_frame_detections("v1", f, np.stack([_moving_box(f) + 500]),
                                np.array([0]), np.array([0.1]))
    res = ev.evaluate()
    assert abs(res[0.5] - 1.0) < 1e-9
