"""Composed-pipeline parity at FLAGSHIP-CLASS shapes (round-3 VERDICT #3).

tests/test_composed_pipeline.py proves the composition (dataset ->
transforms -> model -> postprocess -> gather -> evaluator) equals the
reference's at tiny dims (64 px, T=8, d_ff 512). This test runs the same
two full compositions at the shape class where padding, bucketing,
divisibility and the 2/8-3/8-3/8 posenc split could silently diverge:

  * full CSN-50 trunk -> 2048-d features (flagship channel width,
    /root/reference/models/backbone_builder.py:59-90,111)
  * IMG_SIZE 256, TEMP_LEN 32, FRAME_RATE 2 (TubeR_CSN152_AVA22.yaml dims)
  * 'decode' temporal pooling (the AVA 2.2 flagship strategy)
  * DIM_FEEDFORWARD 2048, QUERY_NUM 15, 80 classes
  * enc/dec reduced to 2+2 layers — the only concession, for CPU-torch
    tractability (layer count does not change any shape/padding logic,
    every layer is the same module)

Assertions mirror the proven decode-strategy structure (exact-score ties
under decode pooling make raw mAP sort-order-dependent; see
test_composed_eval_parity_decode_packed_hostpre's docstring):
  1. row-level parity of the two composed detection dumps;
  2. evaluator-stage exact-mAP parity on the de-tied reference dump;
  3. person AP exact (gap-conditioned binary head, tie-free).

Reference anchor: utils/video_action_recognition.py:222-454 composed with
models/backbone_builder.py:59-111 at the released config's dims.
"""

import io
import json
from types import SimpleNamespace

import numpy as np
import pytest
import torch

from ref_loader import load_ref
from test_composed_pipeline import _cpu_torch  # noqa: F401  (pytest fixture)
from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.train import torch_convert as tc

pytestmark = pytest.mark.slow

NUM_CLASSES, Q, T, IMG = 80, 15, 32, 256
# 1.75:1 aspect -> val view 256x448. Must stay within the static canvas's
# documented input domain (AVA movies are 4:3..16:9 -> canvas 256x464,
# transforms.default_canvas); a wider fixture would trip shrink_to_canvas
# and dump boxes in a smaller pixel space than the reference's.
FRAME_H, FRAME_W = 192, 336
N_KEYS = 2
ENC, DEC = 2, 2


def _labelmap(tmp_path):
    p = tmp_path / "labels.pbtxt"
    lines = []
    for i in range(1, NUM_CLASSES + 1):
        lines += ["item {", f'  name: "class_{i}"', f"  id: {i}", "}"]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _make_fixture(tmp_path, rng):
    """One video, 100 frames at 192x336 (covers keyframes 901-902 at
    T=32/rate 2 with the same boundary clamp on both paths)."""
    from PIL import Image

    d = tmp_path / "frames" / "vidA"
    d.mkdir(parents=True)
    for i in range(100):
        arr = rng.integers(0, 255, (FRAME_H, FRAME_W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:05d}.jpg")
    vfb, keys = {}, []
    for k in range(N_KEYS):
        key = f"vidA,{901 + k:04d}"
        keys.append(key)
        b1 = [0.1 + 0.05 * k, 0.2, 0.5 + 0.05 * k, 0.8]
        b2 = [0.45, 0.1, 0.9, 0.6 + 0.04 * k]
        vfb[key] = {"bboxes": [b1, b2],
                    "acts": [[k % NUM_CLASSES, (k + 33) % NUM_CLASSES],
                             [(k + 55) % NUM_CLASSES]]}
    for split in ("train", "val"):
        (tmp_path / f"anno_{split}.json").write_text(
            json.dumps({"video_frame_bbox": vfb, "frame_keys_list": keys}))
    return str(d)


def _ref_flagship_detr():
    """Reference DETR at flagship dims: full CSN-50 trunk, decode pooling,
    D_MODEL 256 / D_FF 2048 / Q 15 / 80 classes, enc/dec 2+2."""
    bb = load_ref("models.backbone_builder")
    tr = load_ref("models.transformer.transformer")
    tuber = load_ref("models.tuber_ava")

    model_ns = SimpleNamespace(
        BACKBONE_NAME="CSN-50", SINGLE_FRAME=True,
        TEMPORAL_DS_STRATEGY="decode", TEMP_LEN=T, DS_RATE=8,
        D_MODEL=256, NHEAD=8, ENC_LAYERS=ENC, DEC_LAYERS=DEC,
        DIM_FEEDFORWARD=2048, NORMALIZE_BEFORE=False, DROPOUT=0.0,
        PRETRAINED=False, PRETRAIN_BACKBONE_DIR="", LAST_STRIDE=False,
        GENERATE_LFB=False, QUERY_NUM=Q)
    cfg = SimpleNamespace(CONFIG=SimpleNamespace(
        MODEL=model_ns,
        DATA=SimpleNamespace(NUM_CLASSES=NUM_CLASSES, IMG_SIZE=IMG,
                             DATASET_NAME="ava"),
        TRAIN=SimpleNamespace(LR_BACKBONE=1e-5, AUX_LOSS=True)))

    torch.manual_seed(0)
    backbone = bb.build_backbone(cfg)
    backbone.num_channels = 2048  # backbone_builder.py:111 ties it to D_FF
    transformer = tr.build_transformer(cfg)
    model = tuber.DETR(backbone, transformer, num_classes=NUM_CLASSES,
                       num_queries=Q, aux_loss=True, hidden_dim=256,
                       temporal_length=T, generate_lfb=False,
                       backbone_name="CSN-50", ds_rate=8, last_stride=False,
                       dataset_mode="ava")
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    model.eval()
    with torch.no_grad():
        # same conditioning as test_composed_pipeline._shared_ava_weights:
        # every query passes the 0.8 gate (ties are sort-order artifacts)
        # and class-score gaps sit far above cross-framework float noise
        model.class_embed_b.bias.copy_(torch.tensor([0.0, 4.0, 0.0]))
        model.class_fc.weight.mul_(10.0)
    return model


def _our_flagship_cfg(tmp_path, label_path):
    cfg = Config()
    cfg.data.dataset_name = "ava"
    cfg.data.num_classes = NUM_CLASSES
    cfg.data.anno_path = str(tmp_path / "anno_{}.json")
    cfg.data.data_path = str(tmp_path / "frames")
    cfg.data.label_path = label_path
    cfg.data.img_size = IMG
    cfg.data.temp_len = T
    cfg.data.frame_rate = 2
    cfg.data.max_boxes = 6
    cfg.data.native_decode = False
    cfg.model.backbone_name = "CSN-50"
    cfg.model.query_num = Q
    cfg.model.temp_len = T
    cfg.model.enc_layers = ENC
    cfg.model.dec_layers = DEC
    cfg.model.dim_feedforward = 2048
    cfg.model.temporal_ds_strategy = "decode"
    cfg.model.last_stride = False
    cfg.model.compute_dtype = "float32"
    cfg.val.batch_size = 2
    return cfg


def test_flagship_shape_composed_parity(tmp_path, rng, _cpu_torch):  # noqa: F811
    np.int = int
    np.float = np.float64
    np.NAN = np.nan

    frames_dir = _make_fixture(tmp_path, rng)
    label_path = _labelmap(tmp_path)

    # At class_num=80 the reference evaluator hardcodes an absolute path to
    # the AVA v2.1 excluded-timestamps CSV (evaluates/evaluate_ava.py:36,
    # "/xxx/datasets/..."). Shadow `open` in that module's globals so the
    # phantom path reads as an empty file — the synthetic fixture has no
    # excluded keys, and our evaluator's exclude_keys defaults to () too.
    ref_ev_mod = load_ref("evaluates.evaluate_ava")

    def _shim_open(path, *a, **k):
        if str(path).startswith("/xxx/"):
            return io.StringIO("")
        return open(path, *a, **k)

    ref_ev_mod.open = _shim_open

    ref = _ref_flagship_detr()
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = tc.tuber_params_from_torch_state(
        sd, block_nums=(3, 4, 6, 3), enc_layers=ENC, dec_layers=DEC,
        temporal_ds_strategy="decode")

    # --- reference composed eval ------------------------------------------
    av = load_ref("datasets.ava_frame")
    misc = load_ref("utils.misc")
    var = load_ref("utils.video_action_recognition")
    crit_mod = load_ref("models.criterion")
    matcher_mod = load_ref("models.detr.matcher")

    ddp = SimpleNamespace(GPU_WORLD_RANK=0, GPU=0, GPU_WORLD_SIZE=1,
                          DISTRIBUTED=False)
    ref_cfg = SimpleNamespace(CONFIG=SimpleNamespace(
        LOG=SimpleNamespace(BASE_PATH=str(tmp_path / "ref_out"),
                            RES_DIR="res"),
        MODEL=SimpleNamespace(SINGLE_FRAME=True, QUERY_NUM=Q, DS_RATE=8),
        MATCHER=SimpleNamespace(COST_CLASS=12.0, COST_BBOX=5.0,
                                COST_GIOU=2.0, BNY_LOSS=True, BEFORE=False),
        DATA=SimpleNamespace(LABEL_PATH=label_path, NUM_CLASSES=NUM_CLASSES,
                             DATASET_NAME="ava"),
        TWO_STREAM=False, USE_LFB=False, USE_LOCATION=False), DDP_CONFIG=ddp)

    anno = json.loads((tmp_path / "anno_val.json").read_text())
    val_ds = av.VideoDataset(
        frames_dir, anno["video_frame_bbox"], anno["frame_keys_list"],
        transforms=av.make_transforms(
            "val", SimpleNamespace(CONFIG=SimpleNamespace(
                DATA=SimpleNamespace(IMG_SIZE=IMG)))),
        frame_sample_rate=2, clip_len=T, resize_size=IMG, crop_size=IMG,
        mode="val", class_num=NUM_CLASSES)
    val_loader = torch.utils.data.DataLoader(
        val_ds, batch_size=2, shuffle=False, num_workers=0,
        collate_fn=misc.collate_fn)

    matcher = matcher_mod.build_matcher(ref_cfg)
    weight_dict = {"loss_ce": 12.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                   "loss_ce_b": 1}
    weight_dict.update({f"{k}_{i}": v for i in range(DEC - 1)
                        for k, v in dict(weight_dict).items()})
    criterion = crit_mod.SetCriterionAVA(
        10.0, NUM_CLASSES, num_queries=Q, matcher=matcher,
        weight_dict=weight_dict, eos_coef=0.1, losses=["labels", "boxes"],
        data_file="ava", evaluation=False)
    post = crit_mod.PostProcessAVA()

    class _Writer:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, tag, value, step):
            self.scalars[tag] = value

    writer = _Writer()
    var.validate_tuber_detection(
        ref_cfg, ref, criterion, {"bbox": post}, val_loader, 0, writer)
    ref_person = writer.scalars.get("val/val_person_AP_epoch")

    # --- our composed eval -------------------------------------------------
    import jax

    from tubelet_transformer_tpu.data.ava import AVADataset
    from tubelet_transformer_tpu.data.loader import DataLoader
    from tubelet_transformer_tpu.eval.ava_eval import (AVADetectionEvaluator,
                                                       _parse_txt)
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.train import engine
    from tubelet_transformer_tpu.train.loop import validate_ava

    cfg = _our_flagship_cfg(tmp_path, label_path)
    ds = AVADataset(cfg, "val")
    loader = DataLoader(ds, batch_size=2, shuffle=False, rank=0, world=1,
                        num_workers=1, drop_last=True)
    model = build_model(cfg)
    sample = next(iter(loader))
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    merged = dict(state.params)
    merged.update(params)
    state = state.replace(params=merged, batch_stats=batch_stats)
    eval_step = engine.make_eval_step(cfg, model)
    mesh = mesh_lib.create_mesh(1, 1, devices=jax.devices()[:1])
    dump_dir = str(tmp_path / "our_dump")
    result = validate_ava(cfg, eval_step, state, loader, mesh, epoch=0,
                          label_path=label_path, dump_dir=dump_dir)

    # 3. person AP exact (tie-free by construction)
    assert ref_person is not None and not np.isnan(ref_person)
    assert abs(result["person_AP"] - ref_person) < 1e-6, (
        result["person_AP"], ref_person)

    # 2. evaluator-stage exact parity on the de-tied reference dump
    ref_res = tmp_path / "ref_out" / "res"
    jittered = tmp_path / "ref_dets_detied.txt"
    with open(ref_res / "0.txt") as f, open(jittered, "w") as out:
        for i, line in enumerate(f):
            key, rest = line.split(" [")
            vals = [float(x) for x in rest.split("]")[0].split(",")]
            vals[4:4 + NUM_CLASSES] = [v + (i + 1) * 1e-6
                                       for v in vals[4:4 + NUM_CLASSES]]
            out.write("{} [{}]\n".format(key, ", ".join(map(str, vals))))
    ref_ev = ref_ev_mod.STDetectionEvaluater(
        label_path, tiou_thresholds=[0.5], class_num=NUM_CLASSES)
    ref_ev.load_GT_from_path([str(ref_res / "GT_0.txt")])
    ref_ev.load_detection_from_path([str(jittered)])
    ref_detied_map, _ = ref_ev.evaluate()
    ev = AVADetectionEvaluator(label_path=label_path, class_num=NUM_CLASSES)
    ev.load_gt_from_files([str(ref_res / "GT_0.txt")])
    ev.load_detections_from_files([str(jittered)])
    maps, _ = ev.evaluate()
    assert abs(maps[0] - ref_detied_map[0]) < 1e-9, (maps[0], ref_detied_map)

    # 1. row-level parity of the composed dumps (boxes in 256x512-px space)
    def rows_by_key(path):
        by_key = {}
        for key, vals in _parse_txt([str(path)], set()):
            by_key.setdefault(key, []).append(vals)
        return {k: np.asarray(sorted(v), float) for k, v in by_key.items()}

    ref_rows = rows_by_key(ref_res / "0.txt")
    our_rows = rows_by_key(tmp_path / "our_dump" / "0.txt")
    assert set(ref_rows) == set(our_rows)
    assert len(ref_rows) == N_KEYS
    for key in ref_rows:
        r, o = ref_rows[key], our_rows[key]
        assert r.shape == o.shape, (key, r.shape, o.shape)
        np.testing.assert_allclose(o[:, :4], r[:, :4], atol=5e-2,
                                   err_msg=f"boxes diverged at {key}")
        np.testing.assert_allclose(o[:, 4:], r[:, 4:], atol=1e-3,
                                   err_msg=f"scores diverged at {key}")
