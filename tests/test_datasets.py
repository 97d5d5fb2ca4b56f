"""Integration tests: AVA/JHMDB datasets over synthesized on-disk fixtures,
through the threaded DataLoader, yielding static-shape batches."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.data.ava import AVADataset
from tubelet_transformer_tpu.data.jhmdb import JHMDBDataset
from tubelet_transformer_tpu.data.loader import DataLoader
from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset


def _cfg(tmp_path, dataset="ava"):
    cfg = Config()
    cfg.data.dataset_name = dataset
    cfg.data.temp_len = 8
    cfg.data.frame_rate = 2
    cfg.data.img_size = 32
    cfg.data.img_reshape_size = 36
    cfg.data.max_boxes = 6
    cfg.data.num_classes = 10
    cfg.data.data_path = str(tmp_path / "frames")
    cfg.data.anno_path = str(tmp_path / "anno_{}.json") if dataset == "ava" \
        else str(tmp_path)
    return cfg


def _make_ava_fixture(tmp_path, rng, n_videos=2, n_keys=4):
    frames_root = tmp_path / "frames"
    video_frame_bbox = {}
    keys = []
    for v in range(n_videos):
        vid = f"vid{v}"
        d = frames_root / vid
        d.mkdir(parents=True)
        for i in range(80):
            arr = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:05d}.jpg")
        for k in range(n_keys // n_videos):
            sec = 901 + k
            key = f"{vid},{sec:04d}"
            keys.append(key)
            video_frame_bbox[key] = {
                "bboxes": [[0.2, 0.2, 0.7, 0.8], [0.4, 0.1, 0.9, 0.6]],
                "acts": [[1, 3], [2]],
            }
    for split in ("train", "val"):
        with open(tmp_path / f"anno_{split}.json", "w") as f:
            json.dump({"video_frame_bbox": video_frame_bbox,
                       "frame_keys_list": keys}, f)


def test_ava_dataset_and_loader(tmp_path, rng):
    _make_ava_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    for split in ("train", "val"):
        ds = AVADataset(cfg, split)
        assert len(ds) == 4
        s = ds.get(0, rng)
        ch, cw = ds.canvas
        assert s["clips"].shape == (8, ch, cw, 3)
        assert s["pad_mask"].shape == (ch, cw)
        assert s["boxes"].shape == (6, 4)
        assert s["labels"].shape == (6, 10)
        assert s["valid"].sum() >= 1
        # valid boxes are normalized cxcywh
        vb = s["boxes"][s["valid"]]
        assert (vb >= 0).all() and (vb <= 1.0 + 1e-6).all()
        # mask marks the padding beyond the valid region
        h, w = s["sizes"].astype(int)
        assert not s["pad_mask"][:h, :w].any()
        assert s["pad_mask"][h:, :].all() or h == ch

        loader = DataLoader(ds, batch_size=2, shuffle=(split == "train"),
                            num_workers=2, rank=0, world=2)
        batches = list(loader)
        assert len(batches) == len(loader)
        b = batches[0]
        assert b["clips"].shape[0] == 2
        assert len(b["image_key"]) == 2


def _make_jhmdb_fixture(tmp_path, rng):
    vids = ["cls/video0", "cls/video1"]
    nframes = {v: 12 for v in vids}
    resolution = {v: (48, 64) for v in vids}
    gttubes = {}
    for v in vids:
        tube = np.stack([
            np.arange(12, dtype=np.float32),
            np.full(12, 8.0), np.full(12, 6.0),
            np.full(12, 40.0), np.full(12, 30.0)], axis=1)
        gttubes[v] = {3: [tube]}
        d = tmp_path / "frames" / v
        d.mkdir(parents=True)
        for i in range(12):
            arr = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i + 1:05d}.png")
    with open(tmp_path / "JHMDB-GT.pkl", "wb") as f:
        pickle.dump({
            "train_videos": [vids], "test_videos": [vids],
            "nframes": nframes, "resolution": resolution,
            "gttubes": gttubes,
            "labels": [f"action{i}" for i in range(21)],
        }, f)


def test_jhmdb_dataset(tmp_path, rng):
    _make_jhmdb_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path, dataset="jhmdb")
    ds = JHMDBDataset(cfg, "val")
    assert len(ds) == 24
    s = ds.get(5, rng)
    assert s["clips"].shape[0] == 8
    assert s["labels"].dtype == np.int32
    assert s["vis"] == 1
    assert int(s["key_pos"]) == 4
    assert s["valid"].sum() == 1


def test_device_preprocess_dtype_survives(tmp_path, rng):
    """Regression (round-1 bug): with cfg.data.device_preprocess=True (the
    default), _finalize cast clips to float32, and device_preprocess()
    no-ops on float input — so the model saw unnormalized [0,255] pixels.
    The clip must stay uint8 end-to-end on the host, and the in-jit
    preprocessing must then match the host normalize_clip exactly."""
    from tubelet_transformer_tpu.data import transforms as T
    from tubelet_transformer_tpu.data.device_preprocess import (
        device_preprocess,
    )

    _make_ava_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    assert cfg.data.device_preprocess, "default config must use device mode"

    for ds in (AVADataset(cfg, "val"),
               JHMDBDataset(_jhmdb_cfg_with_fixture(tmp_path, rng), "val")):
        s = ds.get(0, rng)
        assert s["clips"].dtype == np.uint8, type(ds).__name__

    ds = AVADataset(cfg, "val")
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        rank=0, world=1)
    b = next(iter(loader))
    assert b["clips"].dtype == np.uint8  # uint8 crosses the collate too

    out = np.asarray(device_preprocess(b["clips"]))
    ref, _ = T.normalize_clip(np.asarray(b["clips"][0]),
                              np.zeros((0, 4), np.float32))
    np.testing.assert_allclose(out[0], ref, atol=1e-4)
    assert np.abs(out).max() < 10  # nowhere near raw [0,255] pixels

    # host mode still ships ready-normalized float32
    cfg.data.device_preprocess = False
    s = AVADataset(cfg, "val").get(0, rng)
    assert s["clips"].dtype == np.float32
    assert np.abs(s["clips"]).max() < 10


def _jhmdb_cfg_with_fixture(tmp_path, rng):
    root = tmp_path / "jhmdb"
    root.mkdir(exist_ok=True)
    _make_jhmdb_fixture(root, rng)
    return _cfg(root, dataset="jhmdb")


def test_loader_pad_to_batch(tmp_path, rng):
    """Val loaders wrap-pad the tail so every sample is seen in full
    batches; duplicated pad samples repeat the leading indices."""
    _make_ava_fixture(tmp_path, rng)  # 4 keys
    ds = AVADataset(_cfg(tmp_path), "val")
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=1,
                        rank=0, world=1, drop_last=True, pad_to_batch=True)
    assert len(loader) == 2
    keys = [k for b in loader for k in b["image_key"]]
    assert len(keys) == 6
    assert set(keys) == {k.replace(",", "_") for k in ds.keys}  # all seen
    assert keys[4:] == keys[:2]  # wrap-padded with the leading samples


def test_loader_pad_shard_smaller_than_pad(tmp_path, rng):
    """A shard smaller than the required pad must still fill a whole batch
    (cyclic wrap), not leave a partial batch for drop_last to discard."""
    _make_ava_fixture(tmp_path, rng)  # 4 keys
    ds = AVADataset(_cfg(tmp_path), "val")
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1,
                        rank=0, world=1, drop_last=True, pad_to_batch=True)
    assert len(loader) == 1
    keys = [k for b in loader for k in b["image_key"]]
    assert len(keys) == 8
    assert set(keys) == {k.replace(",", "_") for k in ds.keys}  # all seen
    assert keys[4:] == keys[:4]  # wrapped a full extra cycle


def test_synthetic_dataset(rng):
    cfg = Config()
    cfg.data.img_size = 32
    cfg.data.temp_len = 4
    cfg.data.max_boxes = 5
    cfg.data.num_classes = 7
    ds = SyntheticAVADataset(cfg, size=10)
    s = ds.get(3, rng)
    assert s["clips"].shape == (4, 32, 32, 3)
    assert s["valid"].any()


def test_packed_ava_matches_jpeg_path(tmp_path, rng):
    """Packed shards reproduce the JPEG pipeline exactly: same clip bytes,
    boxes and transforms for both splits (train under an identical rng)."""
    from tubelet_transformer_tpu.data.packed import (PackedAVADataset,
                                                     pack_ava)

    _make_ava_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)

    for split in ("val", "train"):
        out = str(tmp_path / f"packed_{split}")
        # tiny shard budget forces a multi-shard pack; train additionally
        # exercises the threaded decode-ahead path (order-preserving)
        pack_ava(cfg, split, out, shard_bytes=40000, progress_every=0,
                 workers=3 if split == "train" else 1)
        base = AVADataset(cfg, split)
        packed = PackedAVADataset(cfg, split, packed_dir=out)
        assert packed.keys == base.keys
        import glob as g
        if split == "val":
            assert len(g.glob(out + "/shard_*.bin")) > 1
        for i in range(len(base)):
            a = base.get(i, np.random.default_rng(7 + i))
            b = packed.get(i, np.random.default_rng(7 + i))
            np.testing.assert_array_equal(a["clips"], b["clips"])
            np.testing.assert_array_equal(a["boxes"], b["boxes"])
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(a["valid"], b["valid"])
            assert a["image_key"] == b["image_key"]


def test_packed_rejects_mismatched_config(tmp_path, rng):
    from tubelet_transformer_tpu.data.packed import (PackedAVADataset,
                                                     pack_ava)
    import pytest

    _make_ava_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    out = str(tmp_path / "packed_val")
    pack_ava(cfg, "val", out, progress_every=0)
    cfg2 = _cfg(tmp_path)
    cfg2.data.img_size = 40  # val resize differs from the pack's
    with pytest.raises(ValueError, match="re-pack"):
        PackedAVADataset(cfg2, "val", packed_dir=out)
    cfg3 = _cfg(tmp_path)
    cfg3.data.frame_rate = 1  # shards bake in the pack-time frame stride
    with pytest.raises(ValueError, match="frame_rate"):
        PackedAVADataset(cfg3, "val", packed_dir=out)


def test_packed_jhmdb_matches_png_path(tmp_path, rng):
    """Per-video JHMDB packing reproduces the PNG pipeline exactly —
    boundary-padded windows, dummy test box, train transforms under an
    identical rng."""
    from tubelet_transformer_tpu.data.packed import (PackedJHMDBDataset,
                                                     pack_jhmdb)

    _make_jhmdb_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path, dataset="jhmdb")

    for split in ("val", "train"):
        out = str(tmp_path / f"packed_jh_{split}")
        pack_jhmdb(cfg, split, out, progress_every=0,
                   workers=2 if split == "train" else 1)
        base = JHMDBDataset(cfg, split)
        packed = PackedJHMDBDataset(cfg, split, packed_dir=out)
        assert len(packed) == len(base)
        for i in range(0, len(base), 3):
            a = base.get(i, np.random.default_rng(11 + i))
            b = packed.get(i, np.random.default_rng(11 + i))
            np.testing.assert_array_equal(a["clips"], b["clips"])
            np.testing.assert_array_equal(a["boxes"], b["boxes"])
            np.testing.assert_array_equal(a["labels"], b["labels"])
            assert a["image_key"] == b["image_key"]
            assert int(a["vis"]) == int(b["vis"])

    cfg2 = _cfg(tmp_path, dataset="jhmdb")
    cfg2.data.img_size = 24
    import pytest

    with pytest.raises(ValueError, match="re-pack"):
        PackedJHMDBDataset(cfg2, "val",
                           packed_dir=str(tmp_path / "packed_jh_val"))


def test_packed_ava_multipart_reassembly(tmp_path, rng):
    """Two machines pack contiguous chunks (num_parts); the reader stitches
    part_* dirs back into the full split in key order."""
    from tubelet_transformer_tpu.data.packed import (PackedAVADataset,
                                                     pack_ava)

    _make_ava_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    out = str(tmp_path / "packed_parts")
    for part in (0, 1):
        pack_ava(cfg, "val", out, progress_every=0, part=part, num_parts=2)
    base = AVADataset(cfg, "val")
    packed = PackedAVADataset(cfg, "val", packed_dir=out)
    assert packed.keys == base.keys
    for i in range(len(base)):
        a = base.get(i, np.random.default_rng(5 + i))
        b = packed.get(i, np.random.default_rng(5 + i))
        np.testing.assert_array_equal(a["clips"], b["clips"])
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_packed_ava_empty_parts_tolerated(tmp_path, rng):
    """--num-parts larger than the key count leaves some parts empty; the
    writer must emit concatenable (0,3)-shaped indices and the reader must
    skip them (review regression)."""
    from tubelet_transformer_tpu.data.packed import (PackedAVADataset,
                                                     pack_ava)

    _make_ava_fixture(tmp_path, rng)   # 4 keys
    cfg = _cfg(tmp_path)
    out = str(tmp_path / "packed_sparse")
    for part in range(6):              # parts 4,5 get zero keys
        pack_ava(cfg, "val", out, progress_every=0, part=part, num_parts=6)
    base = AVADataset(cfg, "val")
    packed = PackedAVADataset(cfg, "val", packed_dir=out)
    assert packed.keys == base.keys
    a = base.get(0, np.random.default_rng(11))
    b = packed.get(0, np.random.default_rng(11))
    np.testing.assert_array_equal(a["clips"], b["clips"])


def test_loader_pads_world_larger_than_dataset(tmp_path, rng):
    """DistributedSampler semantics when pad > n (dataset smaller than the
    host count): every rank must get the same shard length (wrap-pad), or
    multi-host eval collectives hang."""
    from tubelet_transformer_tpu.data.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 3

        def get(self, i, rng):
            return {"clips": np.full((1,), i, np.float32)}

    lengths = set()
    for rank in range(8):
        dl = DataLoader(Tiny(), batch_size=1, shuffle=False, rank=rank,
                        world=8, num_workers=1)
        idx = dl._indices()
        lengths.add(len(idx))
        assert all(0 <= i < 3 for i in idx)
    assert lengths == {1}


def test_loader_releases_consumed_prefetch(tmp_path, rng):
    """Consumed batches must not stay referenced by the prefetch list for
    the rest of the epoch (memory leak regression): track liveness of the
    sample payloads via weakrefs."""
    import gc
    import weakref

    from tubelet_transformer_tpu.data.loader import DataLoader

    class Payload(dict):
        pass

    class DS:
        def __len__(self):
            return 16

        def get(self, i, rng):
            return Payload(clips=np.zeros((4,), np.float32))

    tracked = []

    class DS2(DS):
        def get(self, i, rng):
            p = Payload(clips=np.zeros((4,), np.float32))
            tracked.append(weakref.ref(p))
            return p

    dl2 = DataLoader(DS2(), batch_size=2, shuffle=False, num_workers=1,
                     prefetch=1)
    n = 0
    for batch in dl2:
        n += 1
        if n == 7:
            gc.collect()
            # only in-flight prefetch (+ the just-yielded batch) may be
            # alive; with the leak every consumed sample stayed referenced
            alive = sum(r() is not None for r in tracked)
            assert alive <= 3 * 2, f"{alive} stale samples alive"
        del batch


def test_loader_abandonment_cancels_prefetch():
    """Abandoning the loader iterator (one-batch probe, early break) must
    return immediately and cancel the queued prefetch decodes instead of
    executing them all behind shutdown(wait=True)."""
    import threading
    import time

    class SlowCountingDS:
        def __init__(self):
            self.calls = 0
            self._lock = threading.Lock()

        def __len__(self):
            return 8

        def get(self, index, rng):
            with self._lock:
                self.calls += 1
            time.sleep(0.2)
            return {"x": np.zeros((2,), np.float32)}

    ds = SlowCountingDS()
    loader = DataLoader(ds, 2, shuffle=False, num_workers=1, prefetch=4)
    it = iter(loader)
    next(it)                      # consume ONE batch (2 samples)
    t0 = time.perf_counter()
    it.close()                    # abandon: 6 queued decodes must cancel
    assert time.perf_counter() - t0 < 0.5   # old code blocks ~1.2 s here
    time.sleep(0.5)               # let any single in-flight decode finish
    assert ds.calls <= 4          # 2 consumed + <=2 in flight; never all 8
