"""CLI: online streaming inference demo.

Feeds a frame stream (a directory of JPEG frames, or synthetic frames)
through ``serving.StreamingDetector`` and prints one JSON line per keyframe
detection.  Demonstrates the serving loop the reference advertises but never
ships (online_inference / long-term context hooks).

Usage:
  python -m tubelet_transformer_tpu.cli.serve --config-file <yaml> \
      [--frames-dir DIR | --num-frames N] [--fps 30] [--detect-every N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def frame_source(args):
    if args.frames_dir:
        paths = sorted(glob.glob(os.path.join(args.frames_dir, "*.jpg")) +
                       glob.glob(os.path.join(args.frames_dir, "*.png")))
        if not paths:
            raise FileNotFoundError(f"no frames under {args.frames_dir}")
        from PIL import Image

        for p in paths:
            yield np.asarray(Image.open(p).convert("RGB"))
    else:
        rng = np.random.default_rng(0)
        for _ in range(args.num_frames):
            yield rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)


def main() -> None:
    from tubelet_transformer_tpu.config import load_config
    from tubelet_transformer_tpu.serving import StreamingDetector
    from tubelet_transformer_tpu.train import checkpoint as ckpt_lib

    parser = argparse.ArgumentParser(description="TubeR-TPU streaming serve")
    parser.add_argument("--config-file", default=None)
    parser.add_argument("--frames-dir", default=None,
                        help="directory of ordered .jpg/.png frames")
    parser.add_argument("--num-frames", type=int, default=128,
                        help="synthetic frame count when no --frames-dir")
    parser.add_argument("--fps", type=float, default=30.0)
    parser.add_argument("--detect-every", type=int, default=None,
                        help="frames between detections (default: one/sec)")
    parser.add_argument("--top-k", type=int, default=3,
                        help="action classes reported per detection")
    args = parser.parse_args()

    from tubelet_transformer_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = load_config(args.config_file)
    mesh = None
    if cfg.mesh.model > 1:
        # multi-chip serving: TP over the 'model' mesh axis
        from tubelet_transformer_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.create_mesh(cfg.mesh.data, cfg.mesh.model)
    variables = None
    if cfg.model.load and cfg.model.pretrained_path:
        det_tmp = StreamingDetector(cfg, fps=args.fps)
        variables = ckpt_lib.load_pretrained(
            cfg, {"params": det_tmp.variables["params"],
                  "batch_stats": det_tmp.variables["batch_stats"]})
        detector = StreamingDetector(cfg, variables, fps=args.fps,
                                     detect_every=args.detect_every,
                                     mesh=mesh)
    else:
        detector = StreamingDetector(cfg, fps=args.fps,
                                     detect_every=args.detect_every,
                                     mesh=mesh)

    n_frames = 0
    n_keyframes = 0
    latencies = []
    for frame in frame_source(args):
        n_frames += 1
        res = detector.push_frame(frame)
        if res is None:
            continue
        n_keyframes += 1
        latencies.append(res.latency_ms)
        print(json.dumps({
            "keyframe": res.frame_index,
            "time_s": round(res.time_s, 3),
            "latency_ms": round(res.latency_ms, 2),
            "memory_tokens": res.memory_size,
            "detections": [
                {"box": [round(float(v), 1) for v in d.box],
                 "actor": round(d.actor_prob, 3),
                 "top_actions": [
                     [int(c), round(float(d.scores[c]), 3)]
                     for c in np.argsort(-d.scores)[: args.top_k]]}
                for d in res.detections],
        }))
    if latencies:
        # first call includes compile; steady state excludes it
        steady = latencies[1:] or latencies
        print(json.dumps({
            "summary": {"frames": n_frames, "keyframes": n_keyframes,
                        "steady_latency_ms": round(float(np.mean(steady)), 2),
                        "compile_latency_ms": round(latencies[0], 2)}}))


if __name__ == "__main__":
    main()
