"""Host input-pipeline throughput: AVA loader samples/s, native vs PIL decode.

Builds a synthetic on-disk frame tree (JPEGs at movie-ish resolution) and
measures end-to-end sample production (decode 32 frames -> resize ->
transforms -> static-canvas padding) through the threaded DataLoader.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_videos: int = 2, n_batches: int = 6, batch_size: int = 4):
    import numpy as np
    from PIL import Image

    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.data.ava import AVADataset
    from tubelet_transformer_tpu.data.loader import DataLoader

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        rng = np.random.default_rng(0)
        keys, vfb = [], {}
        for v in range(n_videos):
            vid = f"vid{v}"
            import os

            d = os.path.join(tmp, "frames", vid)
            os.makedirs(d)
            base = np.zeros((480, 640, 3), np.uint8)
            for i in range(140):
                img = base.copy()  # structured frames: realistic JPEG cost
                x = (i * 4) % 600
                img[100:300, x:x + 40] = (200, 50, 50)
                img[50:80, :, 2] = (i * 2) % 255
                Image.fromarray(img).save(f"{d}/f_{i:05d}.jpg", quality=85)
            for k in range(8):
                key = f"{vid},{901 + k:04d}"
                keys.append(key)
                vfb[key] = {"bboxes": [[0.2, 0.2, 0.7, 0.8]], "acts": [[1]]}
        anno = {"video_frame_bbox": vfb, "frame_keys_list": keys}
        with open(f"{tmp}/anno_train.json", "w") as f:
            json.dump(anno, f)

        # Serial per-sample production rate is the honest primitive: thread
        # scaling is purely a core-count question (this dev box has 1 CPU).
        import numpy as _np

        results = {}
        for native in (True, False):
            cfg = Config()
            cfg.data.anno_path = tmp + "/anno_{}.json"
            cfg.data.data_path = tmp + "/frames"
            cfg.data.native_decode = native
            ds = AVADataset(cfg, "train")
            ds.get(0, _np.random.default_rng(0))  # warm file cache / cv2
            t0 = time.perf_counter()
            n = 8
            for i in range(n):
                ds.get(i % len(ds), _np.random.default_rng(i))
            rate = n / (time.perf_counter() - t0)
            results["native" if native else "pil"] = rate
            print(f"# {'native' if native else 'pil'}: {rate:.2f} "
                  "samples/s/core", file=sys.stderr)
        print(json.dumps({
            "metric": "loader_samples_per_sec_per_core",
            "native": round(results["native"], 2),
            "pil": round(results["pil"], 2),
            "speedup": round(results["native"] / results["pil"], 2),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
