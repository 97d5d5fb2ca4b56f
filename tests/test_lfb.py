"""Long-term feature bank: model fusion path, bank roundtrip, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.data.loader import DataLoader
from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
from tubelet_transformer_tpu.eval.lfb import FeatureBank, generate_bank
from tubelet_transformer_tpu.models.tuber import build_model


def _cfg(use_lfb=False, generate=False):
    cfg = Config()
    cfg.data.num_classes = 5
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 2
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    cfg.use_lfb = use_lfb
    cfg.model.generate_lfb = generate
    return cfg


def test_lfb_fusion_changes_logits(rng):
    cfg = _cfg(use_lfb=True)
    model = build_model(cfg)
    clips = rng.normal(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    lfb = rng.normal(0, 1, (2, 6, 64)).astype(np.float32)
    mask_none = np.zeros((2, 6), bool)
    mask_all = np.ones((2, 6), bool)

    v = model.init({"params": jax.random.PRNGKey(0)}, clips,
                   lfb_features=lfb, lfb_mask=mask_none, train=False)
    out_with = model.apply(v, clips, lfb_features=lfb, lfb_mask=mask_none,
                           train=False)
    out_masked = model.apply(v, clips, lfb_features=lfb, lfb_mask=mask_all,
                             train=False)
    # real memory changes the class logits; fully-padded memory must not NaN
    assert np.isfinite(np.asarray(out_with["pred_logits"])).all()
    assert np.isfinite(np.asarray(out_masked["pred_logits"])).all()
    diff = np.abs(np.asarray(out_with["pred_logits"])
                  - np.asarray(out_masked["pred_logits"])).max()
    assert diff > 1e-6

    # boxes come from hs only: memory must NOT affect them
    np.testing.assert_allclose(np.asarray(out_with["pred_boxes"]),
                               np.asarray(out_masked["pred_boxes"]),
                               rtol=1e-6)


def test_bank_roundtrip_and_window(tmp_path, rng):
    bank = FeatureBank(feat_dim=8, slots_per_frame=3)
    for s in [901, 902, 904]:
        bank.add(f"vid0,{s:04d}", rng.normal(0, 1, (5, 8)).astype(np.float32),
                 np.array([0.95, 0.9, 0.5, 0.2, 0.1]))
    mem, pad = bank.window("vid0", 903, half_window=2)
    assert mem.shape == (4 * 3, 8)
    # seconds 901, 902, 904 present; 905 absent
    assert (~pad[:3]).sum() == 2      # 901: two confident slots
    assert pad[9:].all() or not pad[9:].all()  # shape sanity

    path = str(tmp_path / "bank.npz")
    bank.save(path)
    bank2 = FeatureBank.load(path)
    mem2, pad2 = bank2.window("vid0", 903, half_window=2)
    np.testing.assert_array_equal(mem, mem2)
    np.testing.assert_array_equal(pad, pad2)


def test_bank_attach_dataset(rng):
    """USE_LFB loader plumbing: every sample carries its keyframe's memory
    window (reference collate variants, utils/misc.py:284-308)."""
    from tubelet_transformer_tpu.eval.lfb import BankAttachDataset

    cfg = _cfg()
    cfg.data.dataset_name = "synthetic"
    ds = SyntheticAVADataset(cfg, size=4)  # keys synth,0900..0903
    bank = FeatureBank(feat_dim=8, slots_per_frame=2)
    marker = np.full((2, 8), 7.0, np.float32)
    bank.add("synth,0901", marker, np.array([0.95, 0.9]))

    wrapped = BankAttachDataset(ds, bank, half_window=1)
    assert len(wrapped) == 4
    s = wrapped.get(0, rng)  # key synth,0900: window covers 0899 + 0901
    assert s["lfb_features"].shape == (2 * 2, 8)
    assert s["lfb_mask"].shape == (4,)
    assert s["lfb_mask"][:2].all()               # 0899 absent -> padded
    assert not s["lfb_mask"][2:].any()           # 0901 confident slots
    np.testing.assert_array_equal(s["lfb_features"][2:], marker)
    s2 = wrapped.get(3, rng)  # key synth,0903: neighbors 0902/0904 absent
    assert s2["lfb_mask"].all()
    # base dataset surface still reachable (loader uses .keys)
    assert wrapped.keys[1] == "synth,0901"


def test_bank_attach_follows_resampled_index(rng):
    """Regression: AVA's empty-target resampling returns a sample from a
    different keyframe than requested (ava.py:194-202); the memory window
    must follow the RETURNED keyframe (key_idx), not the requested index."""
    from tubelet_transformer_tpu.eval.lfb import BankAttachDataset

    class ResamplingBase:
        keys = ["vidA,0900", "vidB,0900"]

        def __len__(self):
            return 2

        def get(self, index, rng):
            # index 0 is "empty" -> the base resamples to index 1
            return {"key_idx": np.int32(1)}

    bank = FeatureBank(feat_dim=4, slots_per_frame=1)
    marker = np.full((1, 4), 3.0, np.float32)
    bank.add("vidB,0901", marker, np.array([0.99]))

    wrapped = BankAttachDataset(ResamplingBase(), bank, half_window=1)
    s = wrapped.get(0, rng)  # requested 0, base returned keyframe 1 (vidB)
    assert not s["lfb_mask"][1:].any()  # vidB,0901 found
    np.testing.assert_array_equal(s["lfb_features"][1:], marker)


def test_generate_bank(rng):
    cfg = _cfg(generate=True)
    cfg.data.dataset_name = "synthetic"
    model = build_model(cfg)
    ds = SyntheticAVADataset(cfg, size=4)
    ds.keys = [f"vid0,{900 + i:04d}" for i in range(4)]  # AVA-style keys
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)

    clips = np.zeros((1, 8, 32, 32, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, clips,
                           train=False)
    bank = generate_bank(cfg, model, variables, loader, mesh=None,
                         threshold=0.0)
    assert len(bank) == 4
    mem, pad = bank.window("vid0", 901, half_window=1)
    assert mem.shape[0] == 2 * min(cfg.model.query_num, 5)
