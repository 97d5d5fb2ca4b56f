"""Flagship-shape parallelism smoke (virtual mesh).

Every other multi-device test runs CSN-TINY at 32^2/T=8 — shapes where the
divisibility guards (parallel/sharding_rules.py TP rules, mesh.clip_sharding
spatial split, the pallas ``*_supported`` predicates) never see the real
channel counts. This module runs ONE eval step of the real CSN-50 TubeR at
reduced-but-realistic shapes (IMG 128, T=16 -> 2048-channel features,
d_model 256, ffn 2048, 15 queries) on a 4-device (data=2, model=2) mesh with
spatial (H) sharding of the clips + tensor-parallel transformer kernels, and
asserts the outputs equal the replicated single-layout run.

Covers the reference's multi-GPU eval capability (DDP validate,
/root/reference/utils/video_action_recognition.py:222-454) at the shape
class of /root/reference/configuration/TubeR_CSN50_AVA21.yaml.
"""

import jax
import numpy as np

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.models.tuber import build_model
from tubelet_transformer_tpu.parallel import mesh as mesh_lib
from tubelet_transformer_tpu.parallel.sharding_rules import shard_train_state
from tubelet_transformer_tpu.train import engine


def _flagship_smoke_cfg():
    cfg = Config()                     # defaults = flagship CSN-152 decode
    cfg.model.backbone_name = "CSN-50"
    cfg.model.compute_dtype = "float32"  # strict parity accounting
    cfg.data.img_size = 128
    cfg.data.temp_len = 16
    cfg.model.temp_len = 16
    cfg.data.max_boxes = 8
    cfg.train.batch_size = 2
    return cfg


def _fake_batch(rng, cfg, b):
    m, c = cfg.data.max_boxes, cfg.data.num_classes
    img = cfg.data.img_size
    n_valid = rng.integers(1, m, b)
    valid = np.arange(m)[None] < n_valid[:, None]
    labels = (rng.uniform(0, 1, (b, m, c)) < 0.3).astype(np.float32)
    labels[..., 0] = 1.0
    boxes = np.stack([
        rng.uniform(0.3, 0.6, (b, m)), rng.uniform(0.3, 0.6, (b, m)),
        rng.uniform(0.1, 0.3, (b, m)), rng.uniform(0.1, 0.3, (b, m))], -1)
    return {
        "clips": rng.normal(0, 1, (b, cfg.model.temp_len, img, img, 3)
                            ).astype(np.float32),
        "pad_mask": np.zeros((b, img, img), bool),
        "boxes": boxes.astype(np.float32),
        "labels": labels,
        "valid": valid,
        "sizes": np.full((b, 2), img, np.float32),
    }


def test_csn50_eval_parity_tp_sp_flagship_shapes(rng):
    cfg = _flagship_smoke_cfg()
    model = build_model(cfg)
    batch = _fake_batch(rng, cfg, cfg.train.batch_size)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
    eval_step = engine.make_eval_step(cfg, model)

    outs = {}
    four = jax.devices()[:4]
    layouts = {
        "replicated": dict(data=1, model=1, devices=four[:1], spatial=False),
        "dp_tp_sp": dict(data=2, model=2, devices=four, spatial=True),
    }
    for name, lo in layouts.items():
        mesh = mesh_lib.create_mesh(data=lo["data"], model=lo["model"],
                                    devices=lo["devices"])
        db = mesh_lib.shard_batch(batch, mesh, spatial=lo["spatial"])
        st = shard_train_state(state, mesh)
        outs[name] = jax.tree.map(np.asarray, eval_step(st, db))

    a, b = outs["replicated"], outs["dp_tp_sp"]
    assert a["scores"].shape == (2, cfg.model.query_num,
                                 cfg.data.num_classes)
    assert np.isfinite(a["scores"]).all() and np.isfinite(b["scores"]).all()
    a_leaves = jax.tree_util.tree_flatten_with_path(a)[0]
    b_leaves = jax.tree.leaves(b)
    assert len(a_leaves) == len(b_leaves) and len(a_leaves) >= 4
    for (path, av), bv in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(
            av, bv, rtol=2e-4, atol=2e-5,
            err_msg=f"TPxSP eval diverges from replicated on "
                    f"{jax.tree_util.keystr(path)}")
