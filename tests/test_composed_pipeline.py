"""Composed-pipeline parity: the reference's FULL eval path vs ours.

The stage oracles (transforms, model, criterion, postprocess, evaluator)
are tested individually elsewhere; this test runs the *composition* both
ways on the same on-disk AVA fixture with the same converted weights:

  reference: datasets/ava_frame.VideoDataset -> torch DataLoader/collate ->
             DETR (torch CPU) -> SetCriterionAVA -> PostProcessAVA ->
             per-rank txt dump -> vendored STDetectionEvaluater
             (utils/video_action_recognition.py:222-454)
  ours:      data.ava.AVADataset -> loader -> jitted eval_step (postprocess
             on device) -> collective gather -> array mAP evaluator
             (train/loop.py:validate_ava)

and asserts the two frame-mAPs (and person APs) agree. This is the
strongest accuracy-parity statement attainable with zero egress: if the
composed pipelines agree on converted weights, released checkpoints
reproduce through the identical code path.
"""

import json
from types import SimpleNamespace

import numpy as np
import pytest
import torch

from ref_loader import load_ref
from test_tuber_model import IMG, NUM_CLASSES, Q, _build_ref_detr, _our_cfg
from test_tuber_model import T as TLEN
from tubelet_transformer_tpu.train import torch_convert as tc

N_KEYS = 4


def _labelmap(tmp_path):
    p = tmp_path / "labels.pbtxt"
    lines = []
    for i in range(1, NUM_CLASSES + 1):
        lines += ["item {", f'  name: "class_{i}"', f"  id: {i}", "}"]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _make_fixture(tmp_path, rng, n_keys=N_KEYS):
    """One video (the reference globs a single pre-formatted frame dir,
    ava_frame.py:134-135), 48x96 frames -> val view 64x128 (exact 2:1
    aspect so box scaling is integer on both paths)."""
    from PIL import Image

    d = tmp_path / "frames" / "vidA"
    d.mkdir(parents=True)
    for i in range(60):
        arr = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:05d}.jpg")
    vfb, keys = {}, []
    for k in range(n_keys):
        key = f"vidA,{901 + k:04d}"
        keys.append(key)
        b1 = [0.1 + 0.05 * k, 0.2, 0.5 + 0.05 * k, 0.8]
        b2 = [0.45, 0.1, 0.9, 0.6 + 0.04 * k]
        vfb[key] = {"bboxes": [b1, b2],
                    "acts": [[k % NUM_CLASSES, (k + 3) % NUM_CLASSES],
                             [(k + 5) % NUM_CLASSES]]}
    for split in ("train", "val"):
        (tmp_path / f"anno_{split}.json").write_text(
            json.dumps({"video_frame_bbox": vfb, "frame_keys_list": keys}))
    return str(d)


def _ref_val_cfg(tmp_path, label_path):
    ddp = SimpleNamespace(GPU_WORLD_RANK=0, GPU=0, GPU_WORLD_SIZE=1,
                          DISTRIBUTED=False)
    log = SimpleNamespace(BASE_PATH=str(tmp_path / "ref_out"), RES_DIR="res")
    model = SimpleNamespace(SINGLE_FRAME=True, QUERY_NUM=Q, DS_RATE=8)
    matcher = SimpleNamespace(COST_CLASS=12.0, COST_BBOX=5.0, COST_GIOU=2.0,
                              BNY_LOSS=True, BEFORE=False)
    data = SimpleNamespace(LABEL_PATH=label_path, NUM_CLASSES=NUM_CLASSES,
                           DATASET_NAME="ava")
    cfg = SimpleNamespace(CONFIG=SimpleNamespace(
        LOG=log, MODEL=model, MATCHER=matcher, DATA=data,
        TWO_STREAM=False, USE_LFB=False, USE_LOCATION=False), DDP_CONFIG=ddp)
    return cfg


class _Writer:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value


@pytest.fixture
def _cpu_torch(monkeypatch):
    """The reference eval loop hard-codes .to('cuda:N') and a distributed
    barrier; route both to CPU no-ops for the oracle run."""
    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        args = tuple("cpu" if isinstance(a, (str, torch.device))
                     and "cuda" in str(a) else a for a in args)
        if "device" in kwargs and "cuda" in str(kwargs["device"]):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to_cpu)
    monkeypatch.setattr(torch.distributed, "barrier",
                        lambda *a, **k: None, raising=False)
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)  # ref sleeps 30 s


C_J = 21  # the reference hard-codes 21-wide one-hot GT for JHMDB
          # (video_action_recognition.py:565-569)


def _make_jhmdb_fixture(tmp_path, rng):
    """Two videos, 48x96 frames (exact 2:1 so val resize is integer),
    full-length tubes so every keyframe has GT on both paths."""
    import pickle

    from PIL import Image

    vids = ["cls/v0", "cls/v1"]
    nframes = {v: 12 for v in vids}
    gttubes = {}
    for iv, v in enumerate(vids):
        d = tmp_path / "frames" / v
        d.mkdir(parents=True)
        for i in range(12):
            arr = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i + 1:05d}.png")
        tube = np.stack([
            np.arange(12, dtype=np.float32),
            np.full(12, 10.0 + 4 * iv), np.full(12, 8.0),
            np.full(12, 60.0 + 4 * iv), np.full(12, 40.0)], axis=1)
        gttubes[v] = {3 + iv: [tube]}
    with open(tmp_path / "JHMDB-GT.pkl", "wb") as f:
        pickle.dump({"train_videos": [vids], "test_videos": [vids],
                     "nframes": nframes,
                     "resolution": {v: (48, 96) for v in vids},
                     "gttubes": gttubes,
                     "labels": [f"action{i}" for i in range(C_J)]}, f)
    return str(tmp_path / "frames")


def test_composed_eval_parity_jhmdb(tmp_path, rng, _cpu_torch):
    """The UCF/JHMDB composition: tubelet queries (Q*T), key-frame query
    slicing, softmax postprocess, argmax/no-object evaluator rules —
    reference validate_tuber_ucf_detection (video_action_recognition.py:
    456-689) vs our validate_ucf, same fixture, same converted weights."""
    np.int = int
    np.float = np.float64
    np.NAN = np.nan

    frames_dir = _make_jhmdb_fixture(tmp_path, rng)

    import test_tuber_model as ttm

    ttm.NUM_CLASSES = C_J  # _build_ref_detr reads the module globals
    try:
        ref = _build_ref_detr("decoder", dataset="jhmdb")
    finally:
        ttm.NUM_CLASSES = NUM_CLASSES
    with torch.no_grad():
        # spread the (2-way) actor head and the (C+1) softmax head so
        # rankings are far from cross-framework numeric noise
        ref.class_embed_b.bias.copy_(torch.tensor([0.0, 2.0]))
        ref.class_fc.weight.mul_(10.0)
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = tc.tuber_params_from_torch_state(
        sd, block_nums=(3, 4, 6, 3), enc_layers=2, dec_layers=2,
        temporal_ds_strategy="decoder")

    # --- reference pipeline ----------------------------------------------
    jf = load_ref("datasets.jhmdb_frame")
    misc = load_ref("utils.misc")
    var = load_ref("utils.video_action_recognition")
    crit_mod = load_ref("models.criterion")
    matcher_mod = load_ref("models.detr.matcher_ucf")

    ref_cfg = _ref_val_cfg(tmp_path, label_path="")
    ref_cfg.CONFIG.DATA.NUM_CLASSES = C_J
    ref_cfg.CONFIG.DATA.DATASET_NAME = "jhmdb"
    ref_cfg.CONFIG.MATCHER.COST_CLASS = 1.0

    val_ds = jf.VideoDataset(
        directory=str(tmp_path), video_path=frames_dir,
        transforms=jf.make_transforms(
            "val", SimpleNamespace(CONFIG=SimpleNamespace(
                DATA=SimpleNamespace(IMG_SIZE=IMG)))),
        clip_len=TLEN, resize_size=IMG, crop_size=IMG, mode="val")
    val_loader = torch.utils.data.DataLoader(
        val_ds, batch_size=2, shuffle=False, num_workers=0,
        collate_fn=misc.collate_fn)

    matcher = matcher_mod.build_matcher(ref_cfg)
    weight_dict = {"loss_ce": 12.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                   "loss_ce_b": 1}
    weight_dict.update({f"{k}_0": v for k, v in dict(weight_dict).items()})
    criterion = crit_mod.SetCriterion(
        10.0, C_J, num_queries=Q, matcher=matcher, weight_dict=weight_dict,
        eos_coef=0.1, losses=["labels", "boxes"], data_file="jhmdb",
        evaluation=False)
    post = crit_mod.PostProcess()

    writer = _Writer()
    ref_map = var.validate_tuber_ucf_detection(
        ref_cfg, ref, criterion, {"bbox": post}, val_loader, 0, writer)

    # --- our pipeline ----------------------------------------------------
    import jax

    from tubelet_transformer_tpu.data.jhmdb import JHMDBDataset
    from tubelet_transformer_tpu.data.loader import DataLoader
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.train import engine
    from tubelet_transformer_tpu.train.loop import validate_ucf

    cfg = _our_cfg("decoder", dataset="jhmdb")
    cfg.data.num_classes = C_J
    cfg.data.anno_path = str(tmp_path)
    cfg.data.data_path = frames_dir
    cfg.data.img_size = IMG
    cfg.data.temp_len = TLEN
    cfg.model.temp_len = TLEN
    cfg.data.max_boxes = 6
    cfg.data.native_decode = False
    cfg.val.batch_size = 2

    ds = JHMDBDataset(cfg, "val")
    loader = DataLoader(ds, batch_size=2, shuffle=False, rank=0, world=1,
                        num_workers=1, drop_last=True, pad_to_batch=True)
    model = build_model(cfg)
    sample = next(iter(loader))
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    state = state.replace(params=params, batch_stats=batch_stats)
    eval_step = engine.make_eval_step(cfg, model)
    mesh = mesh_lib.create_mesh(1, 1, devices=jax.devices()[:1])

    result = validate_ucf(cfg, eval_step, state, loader, mesh, epoch=0)

    assert abs(result["mAP"] - ref_map) < 1e-6, (result["mAP"], ref_map)


def _shared_ava_weights(strategy):
    """Reference model + its weights converted to our pytree.

    Head tweaks make the composed comparison well-conditioned:
      * Lift the binary-head bias so every query passes the 0.8
        postprocess gate. Gated-to-zero scores are exact ties, and AP
        over ties is sort-order dependent — the reference itself breaks
        them differently at each of its three sort sites (quicksort in
        load_detection_from_path, TF-OD per-image sort, pooled metrics
        sort), so tie behavior is not a well-defined semantic to match.
        On real-scale eval the tied-zero tail contributes O(1e-4) mAP;
        here it would dominate a 4-image fixture.
      * Random-weight decoder queries are nearly identical, so action
        scores sit ~1e-6 apart — within cross-framework numeric noise,
        which flips adjacent ranks and shifts AP by a precision step.
        Amplify the class head so score gaps are >> float32 noise.
    """
    ref = _build_ref_detr(strategy)
    with torch.no_grad():
        ref.class_embed_b.bias.copy_(torch.tensor([0.0, 4.0, 0.0]))
        ref.class_fc.weight.mul_(10.0)
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = tc.tuber_params_from_torch_state(
        sd, block_nums=(3, 4, 6, 3), enc_layers=2, dec_layers=2,
        temporal_ds_strategy=strategy)
    return ref, params, batch_stats


def _ref_ava_map(tmp_path, ref, label_path, frames_dir):
    """Run the reference's composed eval path on the fixture: torch
    dataset -> collate -> DETR -> criterion/postprocess -> txt dumps ->
    vendored evaluator (video_action_recognition.py:222-454)."""
    av = load_ref("datasets.ava_frame")
    misc = load_ref("utils.misc")
    var = load_ref("utils.video_action_recognition")
    crit_mod = load_ref("models.criterion")
    matcher_mod = load_ref("models.detr.matcher")

    ref_cfg = _ref_val_cfg(tmp_path, label_path)
    anno = json.loads((tmp_path / "anno_val.json").read_text())
    val_ds = av.VideoDataset(
        frames_dir, anno["video_frame_bbox"], anno["frame_keys_list"],
        transforms=av.make_transforms(
            "val", SimpleNamespace(CONFIG=SimpleNamespace(
                DATA=SimpleNamespace(IMG_SIZE=IMG)))),
        frame_sample_rate=2, clip_len=TLEN, resize_size=IMG, crop_size=IMG,
        mode="val", class_num=NUM_CLASSES)
    val_loader = torch.utils.data.DataLoader(
        val_ds, batch_size=2, shuffle=False, num_workers=0,
        collate_fn=misc.collate_fn)

    matcher = matcher_mod.build_matcher(ref_cfg)
    weight_dict = {"loss_ce": 12.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                   "loss_ce_b": 1}
    weight_dict.update({f"{k}_{i}": v for i in range(1)
                        for k, v in dict(weight_dict).items()})
    criterion = crit_mod.SetCriterionAVA(
        10.0, NUM_CLASSES, num_queries=Q, matcher=matcher,
        weight_dict=weight_dict, eos_coef=0.1, losses=["labels", "boxes"],
        data_file="ava", evaluation=False)
    post = crit_mod.PostProcessAVA()

    writer = _Writer()
    ref_map = var.validate_tuber_detection(
        ref_cfg, ref, criterion, {"bbox": post}, val_loader, 0, writer)
    return ref_map, writer.scalars.get("val/val_person_AP_epoch")


def _our_ava_cfg(tmp_path, strategy, label_path):
    cfg = _our_cfg(strategy)
    cfg.data.anno_path = str(tmp_path / "anno_{}.json")
    cfg.data.data_path = str(tmp_path / "frames")
    cfg.data.label_path = label_path
    cfg.data.img_size = IMG
    cfg.data.temp_len = TLEN
    cfg.data.frame_rate = 2
    cfg.data.max_boxes = 6
    cfg.data.native_decode = False  # PIL path, byte-identical to the ref
    cfg.val.batch_size = 2
    return cfg


def _our_ava_map(cfg, params, batch_stats, label_path, ds=None,
                 batch_size=2, dump_dir=None):
    """Run OUR composed eval path: dataset -> loader -> jitted eval step
    (postprocess on device) -> gather -> array evaluator
    (train/loop.py:validate_ava)."""
    import jax

    from tubelet_transformer_tpu.data.ava import AVADataset
    from tubelet_transformer_tpu.data.loader import DataLoader
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.train import engine
    from tubelet_transformer_tpu.train.loop import validate_ava

    if ds is None:
        ds = AVADataset(cfg, "val")
    loader = DataLoader(ds, batch_size=batch_size, shuffle=False, rank=0,
                        world=1, num_workers=1, drop_last=True)
    model = build_model(cfg)
    sample = next(iter(loader))
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    # merge: converted reference weights override the matching init params;
    # modules the reference does not have (e.g. the LFB fusion block) keep
    # their initialized values
    merged = dict(state.params)
    merged.update(params)
    state = state.replace(params=merged, batch_stats=batch_stats)
    eval_step = engine.make_eval_step(cfg, model)
    mesh = mesh_lib.create_mesh(1, 1, devices=jax.devices()[:1])
    return validate_ava(cfg, eval_step, state, loader, mesh, epoch=0,
                        label_path=label_path, dump_dir=dump_dir)


def _assert_parity(result, ref_map, ref_person):
    assert abs(result["mAP"] - ref_map) < 1e-6, (result["mAP"], ref_map)
    if ref_person is not None and not np.isnan(ref_person):
        assert abs(result["person_AP"] - ref_person) < 1e-6
    # sanity: the fixture must actually produce non-trivial detections
    assert result["mAP"] > 0 or ref_map == 0


def test_composed_eval_parity(tmp_path, rng, _cpu_torch):
    """avg pooling x JPEG/PIL data path x device-side preprocessing (the
    default config surface)."""
    # numpy 2 removed the aliases the reference uses
    np.int = int
    np.float = np.float64
    np.NAN = np.nan

    frames_dir = _make_fixture(tmp_path, rng)
    label_path = _labelmap(tmp_path)
    ref, params, batch_stats = _shared_ava_weights("avg")
    ref_map, ref_person = _ref_ava_map(tmp_path, ref, label_path, frames_dir)

    cfg = _our_ava_cfg(tmp_path, "avg", label_path)
    assert cfg.data.device_preprocess  # default: photometric stage in-jit
    result = _our_ava_map(cfg, params, batch_stats, label_path)
    _assert_parity(result, ref_map, ref_person)


def test_composed_eval_parity_decode_packed_hostpre(tmp_path, rng,
                                                    _cpu_torch):
    """The remaining AVA config axes in one composed run vs the same torch
    oracle: 'decode' temporal pooling (the AVA 2.2 flagship strategy,
    configuration/TubeR_CSN152_AVA22.yaml), the packed-shard data path
    (DATA.PACKED_PATH), and host-side preprocessing (DEVICE_PREPROCESS
    off). Any of these could hide a composition break the stage oracles
    miss (round 2's deferred-TP bug was exactly this class).

    Under the 'decode' pooling, random-init decoder queries collapse to
    EXACT float32 score ties (verified: the pooled per-class (score, TP)
    multisets of the two pipelines are identical, yet APs differ). AP
    under exact ties is quicksort-order dependent: the vendored
    metrics.py:57-58 argsorts a pool whose element order is an artifact
    of the reference's own intermediate sorts, so exact-mAP equality is
    not a well-defined target for this strategy. Asserted instead, each
    strictly stronger than a tie-order mAP match:
      1. row-level parity of the two composed detection dumps (boxes to
         1e-2 px, scores to 1e-3) — proves the full data->model->
         postprocess->gather composition;
      2. evaluator-stage parity on the reference's composed detections
         after deterministic de-tying: the IDENTICAL jittered dump fed to
         the vendored evaluator and ours must give the exact same mAP;
      3. person AP exact — binary scores are gap-conditioned (bias 4.0),
         tie-free, so this leg of the composition asserts end-to-end.
    """
    np.int = int
    np.float = np.float64
    np.NAN = np.nan

    frames_dir = _make_fixture(tmp_path, rng)
    label_path = _labelmap(tmp_path)
    ref, params, batch_stats = _shared_ava_weights("decode")
    ref_map, ref_person = _ref_ava_map(tmp_path, ref, label_path, frames_dir)

    from tubelet_transformer_tpu.data.packed import (PackedAVADataset,
                                                     pack_ava)
    from tubelet_transformer_tpu.eval.ava_eval import (AVADetectionEvaluator,
                                                       _parse_txt)

    cfg = _our_ava_cfg(tmp_path, "decode", label_path)
    cfg.data.device_preprocess = False  # host normalize (reference layout)
    out = str(tmp_path / "packed_val")
    pack_ava(cfg, "val", out, progress_every=0)
    ds = PackedAVADataset(cfg, "val", packed_dir=out)
    dump_dir = str(tmp_path / "our_dump")
    result = _our_ava_map(cfg, params, batch_stats, label_path, ds=ds,
                          dump_dir=dump_dir)

    # 3. person AP (class-agnostic, gap-conditioned binary scores): exact
    assert abs(result["person_AP"] - ref_person) < 1e-6, (
        result["person_AP"], ref_person)

    # 2. evaluator-stage parity on the reference's own composed dump,
    #    de-tied: bump every score in row i by (i+1)*1e-6 so no two rows
    #    tie exactly, then feed the identical file to both evaluators.
    ref_res = tmp_path / "ref_out" / "res"
    jittered = tmp_path / "ref_dets_detied.txt"
    with open(ref_res / "0.txt") as f, open(jittered, "w") as out:
        for i, line in enumerate(f):
            key, rest = line.split(" [")
            vals = [float(x) for x in rest.split("]")[0].split(",")]
            vals[4:4 + NUM_CLASSES] = [v + (i + 1) * 1e-6
                                       for v in vals[4:4 + NUM_CLASSES]]
            out.write("{} [{}]\n".format(key, ", ".join(map(str, vals))))
    ref_ev_mod = load_ref("evaluates.evaluate_ava")
    ref_ev = ref_ev_mod.STDetectionEvaluater(label_path,
                                             tiou_thresholds=[0.5],
                                             class_num=NUM_CLASSES)
    ref_ev.load_GT_from_path([str(ref_res / "GT_0.txt")])
    ref_ev.load_detection_from_path([str(jittered)])
    ref_detied_map, _ = ref_ev.evaluate()
    ev = AVADetectionEvaluator(label_path=label_path,
                               class_num=NUM_CLASSES)
    ev.load_gt_from_files([str(ref_res / "GT_0.txt")])
    ev.load_detections_from_files([str(jittered)])
    maps, _ = ev.evaluate()
    assert abs(maps[0] - ref_detied_map[0]) < 1e-9, (maps[0], ref_detied_map)

    # 1. row-level parity of the composed dumps
    def rows_by_key(path):
        by_key = {}
        for key, vals in _parse_txt([str(path)], set()):
            by_key.setdefault(key, []).append(vals)
        return {k: np.asarray(sorted(v), float) for k, v in by_key.items()}

    ref_rows = rows_by_key(ref_res / "0.txt")
    our_rows = rows_by_key(tmp_path / "our_dump" / "0.txt")
    assert set(ref_rows) == set(our_rows)
    for key in ref_rows:
        r, o = ref_rows[key], our_rows[key]
        assert r.shape == o.shape, (key, r.shape, o.shape)
        np.testing.assert_allclose(o[:, :4], r[:, :4], atol=1e-2,
                                   err_msg=f"boxes diverged at {key}")
        np.testing.assert_allclose(o[:, 4:], r[:, 4:], atol=1e-3,
                                   err_msg=f"scores diverged at {key}")


def test_composed_lfb_feeding_and_batch_invariance(tmp_path, rng):
    """The LFB-fed composition. No torch oracle exists — the reference
    ships the USE_LFB plumbing but never released the LFB model (SURVEY
    §5.7; /root/reference/utils/video_action_recognition.py:109-139) — so
    the assertions are the composition properties that can actually break:

      1. the bank is LIVE end-to-end (generate_bank -> BankAttachDataset
         window -> collate -> jitted eval): detections differ from an
         empty-bank run of the same weights;
      2. the full LFB-fed pipeline is batching-invariant: bs=1 and bs=2
         produce identical mAP (bank-window alignment, padding and gather
         are where a live-loop composition bug would hide).
    """
    import jax

    from tubelet_transformer_tpu.data.ava import AVADataset
    from tubelet_transformer_tpu.data.loader import DataLoader
    from tubelet_transformer_tpu.eval.lfb import (BankAttachDataset,
                                                  generate_bank)
    from tubelet_transformer_tpu.models.tuber import build_model

    frames_dir = _make_fixture(tmp_path, rng)
    del frames_dir
    label_path = _labelmap(tmp_path)
    ref, params, batch_stats = _shared_ava_weights("avg")
    del ref

    # --- bank generation with the converted weights (GENERATE_LFB mode) --
    gen_cfg = _our_ava_cfg(tmp_path, "avg", label_path)
    gen_cfg.model.generate_lfb = True
    gen_model = build_model(gen_cfg)
    gen_loader = DataLoader(AVADataset(gen_cfg, "val"), batch_size=2,
                            shuffle=False, rank=0, world=1, num_workers=1,
                            drop_last=True)
    bank = generate_bank(
        gen_cfg, gen_model, {"params": params, "batch_stats": batch_stats},
        gen_loader, mesh=None, threshold=0.0)
    assert len(bank) == N_KEYS

    # --- LFB-fed composed eval, bs=2 vs bs=1 ------------------------------
    cfg = _our_ava_cfg(tmp_path, "avg", label_path)
    cfg.use_lfb = True

    def run(bank_, batch_size):
        ds = BankAttachDataset(AVADataset(cfg, "val"), bank_, half_window=2)
        return _our_ava_map(cfg, params, batch_stats, label_path, ds=ds,
                            batch_size=batch_size)

    r2 = run(bank, 2)
    r1 = run(bank, 1)
    assert abs(r2["mAP"] - r1["mAP"]) < 1e-9, (r2["mAP"], r1["mAP"])

    # --- the bank must actually influence the composed output ------------
    # direct probe (mAP on a 4-image fixture can coincide): same batch,
    # real vs fully-masked memory window must change the action logits
    model = build_model(cfg)
    ds = BankAttachDataset(AVADataset(cfg, "val"), bank, half_window=2)
    loader = DataLoader(ds, batch_size=2, shuffle=False, rank=0, world=1,
                        num_workers=1, drop_last=True)
    batch = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros_like(batch["clips"], np.float32),
                           train=False,
                           lfb_features=batch["lfb_features"],
                           lfb_mask=batch["lfb_mask"])
    merged = dict(variables["params"])
    merged.update(params)
    variables = {"params": merged, "batch_stats": batch_stats}
    assert not np.asarray(batch["lfb_mask"]).all(), "bank window empty"

    def logits(mask):
        out = model.apply(variables, np.asarray(batch["clips"], np.float32),
                          train=False,
                          lfb_features=batch["lfb_features"], lfb_mask=mask)
        return np.asarray(out["pred_logits"])

    real = logits(np.asarray(batch["lfb_mask"]))
    masked = logits(np.ones_like(np.asarray(batch["lfb_mask"])))
    assert not np.allclose(real, masked), "LFB memory had no effect"
