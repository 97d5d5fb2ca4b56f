"""CLI: HTTP detection service over the multi-stream serving pool.

Serves the TubeR streaming detector behind a stdlib HTTP API
(serving_http.DetectionServer): clients open streams, POST frames
(JPEG/PNG or raw RGB), and poll per-keyframe detections; all due streams
share one padded batched forward per scheduler tick.

Usage:
  python -m tubelet_transformer_tpu.cli.serve_http \
      --config-file configuration/TubeR_CSN152_AVA22.yaml \
      [--port 8000] [--max-batch 8] [--detect-every 30] [--fps 30] \
      [--actor-threshold 0.8]

Checkpoints load exactly as in the offline eval CLIs: CONFIG.MODEL.LOAD
with PRETRAINED_PATH (torch .pth or our orbax dirs both work).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--detect-every", type=int, default=None,
                   help="frames between detections (default: one per second "
                        "of source video, i.e. fps)")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--actor-threshold", type=float, default=0.8)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tuber_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tubelet_transformer_tpu.config import load_config
    from tubelet_transformer_tpu.serving import StreamingDetector
    from tubelet_transformer_tpu.serving_http import DetectionServer

    cfg = load_config(args.config_file)
    mesh = None
    if cfg.mesh.model > 1:
        # multi-chip serving: TP over the 'model' mesh axis
        from tubelet_transformer_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.create_mesh(cfg.mesh.data, cfg.mesh.model)
    variables = None
    if cfg.model.load and cfg.model.pretrained_path:
        from tubelet_transformer_tpu.train import checkpoint as ckpt_lib

        det_tmp = StreamingDetector(cfg, fps=args.fps)
        variables = ckpt_lib.load_pretrained(
            cfg, {"params": det_tmp.variables["params"],
                  "batch_stats": det_tmp.variables["batch_stats"]})

    server = DetectionServer(
        cfg, variables, host=args.host, port=args.port,
        max_batch=args.max_batch, detect_every=args.detect_every,
        fps=args.fps, actor_threshold=args.actor_threshold, mesh=mesh)
    print(f"serving on http://{args.host}:{server.port} "
          f"(backend={jax.default_backend()}, max_batch={args.max_batch})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
