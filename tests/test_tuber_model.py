"""Keystone parity test: full TubeR (JAX) vs the reference DETR (torch),
random weights copied across. Passing this means released .pth checkpoints
will reproduce through the same conversion path."""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.models.tuber import build_model
from tubelet_transformer_tpu.train import torch_convert as tc

NUM_CLASSES, Q, T, IMG = 10, 5, 8, 64


def _ref_cfg(strategy="decode", dataset="ava"):
    model = SimpleNamespace(
        BACKBONE_NAME="CSN-50", SINGLE_FRAME=True,
        TEMPORAL_DS_STRATEGY=strategy, TEMP_LEN=T, DS_RATE=8,
        D_MODEL=256, NHEAD=8, ENC_LAYERS=2, DEC_LAYERS=2,
        DIM_FEEDFORWARD=512, NORMALIZE_BEFORE=False, DROPOUT=0.0,
        PRETRAINED=False, PRETRAIN_BACKBONE_DIR="", LAST_STRIDE=False,
        GENERATE_LFB=False, QUERY_NUM=Q)
    data = SimpleNamespace(NUM_CLASSES=NUM_CLASSES, IMG_SIZE=IMG,
                           DATASET_NAME=dataset)
    train = SimpleNamespace(LR_BACKBONE=1e-5, AUX_LOSS=True)
    return SimpleNamespace(CONFIG=SimpleNamespace(MODEL=model, DATA=data,
                                                  TRAIN=train))


def _our_cfg(strategy="decode", dataset="ava"):
    cfg = Config()
    cfg.data.dataset_name = dataset
    cfg.data.num_classes = NUM_CLASSES
    cfg.model.backbone_name = "CSN-50"
    cfg.model.query_num = Q
    cfg.model.temp_len = T
    cfg.model.enc_layers = 2
    cfg.model.dec_layers = 2
    cfg.model.dim_feedforward = 512
    cfg.model.temporal_ds_strategy = strategy
    cfg.model.last_stride = False
    cfg.model.compute_dtype = "float32"
    return cfg


def _build_ref_detr(strategy="decode", dataset="ava"):
    bb = load_ref("models.backbone_builder")
    tr = load_ref("models.transformer.transformer")
    tuber = load_ref("models.tuber_ava")
    cfg = _ref_cfg(strategy, dataset)
    torch.manual_seed(0)
    backbone = bb.build_backbone(cfg)
    # DIM_FEEDFORWARD doubles as backbone num_channels in the reference
    # (backbone_builder.py:111) — the CSN emits 2048 regardless; fix it here.
    backbone.num_channels = 2048
    transformer = tr.build_transformer(cfg)
    model = tuber.DETR(backbone, transformer, num_classes=NUM_CLASSES,
                       num_queries=Q, aux_loss=True, hidden_dim=256,
                       temporal_length=T, generate_lfb=False,
                       backbone_name="CSN-50", ds_rate=8, last_stride=False,
                       dataset_mode=dataset)
    # randomize BN running stats for a meaningful eval-mode check
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    model.eval()
    return model


@pytest.mark.parametrize("strategy", ["decode", "avg"])
def test_full_model_parity_ava(rng, strategy):
    ref = _build_ref_detr(strategy)
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = tc.tuber_params_from_torch_state(
        sd, block_nums=(3, 4, 6, 3), enc_layers=2, dec_layers=2,
        temporal_ds_strategy=strategy)

    ours = build_model(_our_cfg(strategy))
    clips = rng.normal(0, 1, (1, T, IMG, IMG, 3)).astype(np.float32)

    out = ours.apply({"params": params, "batch_stats": batch_stats},
                     clips, train=False)

    misc = load_ref("utils.misc")  # the NestedTensor class DETR isinstance-checks
    x = torch.from_numpy(clips.transpose(0, 4, 1, 2, 3))  # (B, 3, T, H, W)
    mask = torch.zeros((1, IMG, IMG), dtype=torch.bool)
    with torch.no_grad():
        ref_out = ref(misc.NestedTensor(x, mask))

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), ref_out["pred_logits"].numpy(),
        rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_b"]), ref_out["pred_logits_b"].numpy(),
        rtol=1e-3, atol=2e-3)
    # aux layers too (index 0 = first decoder layer)
    np.testing.assert_allclose(
        np.asarray(out["aux_boxes"][0]),
        ref_out["aux_outputs"][0]["pred_boxes"].numpy(),
        rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["aux_logits"][0]),
        ref_out["aux_outputs"][0]["pred_logits"].numpy(),
        rtol=1e-3, atol=2e-3)


def test_export_to_reference_pth(rng, tmp_path):
    """Reverse interop: weights trained HERE load into the reference model
    (its own module names) and reproduce our forward — a reference user can
    consume checkpoints from this framework."""
    strategy = "decode"
    ours = build_model(_our_cfg(strategy))
    clips = rng.normal(0, 1, (1, T, IMG, IMG, 3)).astype(np.float32)
    variables = ours.init({"params": __import__("jax").random.PRNGKey(3)},
                          clips, train=False)
    # randomize batch stats so eval-mode BN is meaningfully checked
    import jax

    batch_stats = jax.tree.map(
        lambda x: np.asarray(rng.normal(0.2, 0.5, x.shape), np.float32) ** 2
        + 0.1, variables["batch_stats"])
    params = variables["params"]

    path = str(tmp_path / "exported.pth")
    tc.export_tuber_pth(path, params, batch_stats, _our_cfg(strategy))

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = tc.strip_module_prefix(ckpt["model"])
    ref = _build_ref_detr(strategy)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert unexpected == [], f"exported keys unknown to reference: {unexpected}"
    # the only reference params we do not emit: the CSN's dead out_fc head
    # (never used in forward, ir_CSN_50.py:184-186)
    assert all("out_fc" in k for k in missing), f"missing: {missing}"
    ref.eval()

    out = ours.apply({"params": params, "batch_stats": batch_stats},
                     clips, train=False)
    misc = load_ref("utils.misc")
    x = torch.from_numpy(clips.transpose(0, 4, 1, 2, 3))
    mask = torch.zeros((1, IMG, IMG), dtype=torch.bool)
    with torch.no_grad():
        ref_out = ref(misc.NestedTensor(x, mask))

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), ref_out["pred_logits"].numpy(),
        rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_b"]), ref_out["pred_logits_b"].numpy(),
        rtol=1e-3, atol=2e-3)

    # round trip through the forward converter is exact
    params2, stats2 = tc.tuber_params_from_torch_state(
        ckpt["model"], block_nums=(3, 4, 6, 3), enc_layers=2, dec_layers=2,
        temporal_ds_strategy=strategy)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))
