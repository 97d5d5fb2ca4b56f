"""Native checkpoint roundtrip + DETR seeding + schedule semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.models.tuber import build_model
from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
from tubelet_transformer_tpu.train import engine
from tubelet_transformer_tpu.train.schedule import (
    cosine_schedule,
    linear_schedule,
    multistep_schedule,
)


def _tiny_cfg():
    cfg = Config()
    cfg.data.num_classes = 5
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 1
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    return cfg


def _batch(cfg):
    return {
        "clips": np.zeros((2, cfg.data.temp_len, 32, 32, 3), np.float32),
        "pad_mask": np.zeros((2, 32, 32), bool),
    }


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, tx, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), _batch(cfg), 10)
    state = state.replace(step=jnp.int32(42))

    path = ckpt_lib.save_checkpoint(str(tmp_path / "ck"), state, epoch=3,
                                    max_accuracy=0.5)

    state2, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(1), _batch(cfg), 10)
    restored, epoch, max_acc = ckpt_lib.load_checkpoint(path, state2)
    assert epoch == 3 and max_acc == 0.5
    assert int(restored.step) == 42
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt_lib.latest_checkpoint(str(tmp_path / "ck")) == path


def test_load_orbax_variables_partial_restore(tmp_path):
    """Eval-side weight loading reads only params/batch_stats from a full
    training checkpoint (opt_state stays on disk)."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), _batch(cfg), 10)
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ck"), state, epoch=1)

    template = {"params": jax.tree.map(np.zeros_like, state.params),
                "batch_stats": jax.tree.map(np.zeros_like,
                                            state.batch_stats)}
    out = ckpt_lib.load_orbax_variables(path, template)
    assert set(out.keys()) == {"params", "batch_stats"}
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(out["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_scoped_to_exp_name(tmp_path):
    """Two experiments sharing one BASE_PATH must not cross-resume: the
    search is scoped to this experiment's own ``{exp_name}_{stamp}`` dirs."""
    base = tmp_path
    for exp, epoch in (("expA", 7), ("expB", 9)):
        d = base / f"{exp}_20260101_000000" / "checkpoints"
        d.mkdir(parents=True)
        (d / f"ckpt_epoch_{epoch}").mkdir()

    got = ckpt_lib.latest_checkpoint_any_run(str(base), exp_name="expA")
    assert got and "expA_" in got and got.endswith("ckpt_epoch_7")
    got = ckpt_lib.latest_checkpoint_any_run(str(base), exp_name="expB")
    assert got and got.endswith("ckpt_epoch_9")
    # no runs for this experiment -> no resume, even though siblings exist
    assert ckpt_lib.latest_checkpoint_any_run(str(base),
                                              exp_name="expC") is None
    # unscoped search (legacy behavior) still sees everything
    got = ckpt_lib.latest_checkpoint_any_run(str(base))
    assert got and got.endswith("ckpt_epoch_9")
    # an experiment whose name extends ours must not match either
    # ("tuber" globbing "tuber_large_<stamp>"): suffix must be a run stamp
    d = base / "expA_large_20260101_000000" / "checkpoints"
    d.mkdir(parents=True)
    (d / "ckpt_epoch_99").mkdir()
    got = ckpt_lib.latest_checkpoint_any_run(str(base), exp_name="expA")
    assert got and got.endswith("ckpt_epoch_7")
    got = ckpt_lib.latest_checkpoint_any_run(str(base), exp_name="expA_large")
    assert got and got.endswith("ckpt_epoch_99")


def test_detr_seed(tmp_path):
    """COCO-DETR-format .pth seeds transformer/bbox_embed/query_embed with a
    query-row slice (model_utils.py:10-36 semantics)."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 8, 32, 32, 3)), train=False)

    d, h = cfg.model.d_model, cfg.model.dim_feedforward
    sd = {}
    torch.manual_seed(0)

    def mha(prefix):
        sd[f"{prefix}.in_proj_weight"] = torch.randn(3 * d, d)
        sd[f"{prefix}.in_proj_bias"] = torch.randn(3 * d)
        sd[f"{prefix}.out_proj.weight"] = torch.randn(d, d)
        sd[f"{prefix}.out_proj.bias"] = torch.randn(d)

    def lin(prefix, o, i):
        sd[f"{prefix}.weight"] = torch.randn(o, i)
        sd[f"{prefix}.bias"] = torch.randn(o)

    for i in range(1):
        p = f"transformer.encoder.layers.{i}"
        mha(f"{p}.self_attn")
        lin(f"{p}.linear1", h, d), lin(f"{p}.linear2", d, h)
        lin(f"{p}.norm1", d, 1), lin(f"{p}.norm2", d, 1)
        sd[f"{p}.norm1.weight"] = torch.randn(d)
        sd[f"{p}.norm2.weight"] = torch.randn(d)
        p = f"transformer.decoder.layers.{i}"
        mha(f"{p}.self_attn"), mha(f"{p}.multihead_attn")
        lin(f"{p}.linear1", h, d), lin(f"{p}.linear2", d, h)
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{n}.weight"] = torch.randn(d)
            sd[f"{p}.{n}.bias"] = torch.randn(d)
    sd["transformer.decoder.norm.weight"] = torch.randn(d)
    sd["transformer.decoder.norm.bias"] = torch.randn(d)
    for i in range(3):
        lin(f"bbox_embed.layers.{i}", d if i < 2 else 4, d)
    sd["query_embed.weight"] = torch.randn(100, d)  # COCO: 100 queries

    path = str(tmp_path / "detr.pth")
    torch.save({"model": sd}, path)

    cfg.model.load_detr = True
    cfg.model.pretrain_transformer_dir = path
    out = ckpt_lib.seed_from_detr(cfg, variables)
    qe = out["params"]["query_embed"]
    assert qe.shape == (5, d)
    np.testing.assert_allclose(qe, sd["query_embed.weight"][:5].numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(
        out["params"]["bbox_embed"]["layers_0"]["kernel"],
        sd["bbox_embed.layers.0.weight"].numpy().T, rtol=1e-6)


def test_multistep_schedule_matches_torch():
    base, gamma = 0.1, 0.1
    sched = multistep_schedule(base, [3, 6], gamma, steps_per_epoch=10)
    lrs = [float(sched(e * 10)) for e in range(8)]
    expect = [0.1, 0.1, 0.1, 0.01, 0.01, 0.01, 0.001, 0.001]
    np.testing.assert_allclose(lrs, expect, rtol=1e-6)


def test_cosine_schedule_endpoints():
    sched = cosine_schedule(1e-4, 1e-5, total_steps=100, warmup_steps=10,
                            warmup_start_lr=1e-6)
    assert abs(float(sched(0)) - 1e-6) < 1e-9
    assert abs(float(sched(10)) - (1e-5 + 0.5 * (1e-4 - 1e-5)
                                   * (1 + np.cos(np.pi * 0.1)))) < 1e-9
    assert abs(float(sched(100)) - 1e-5) < 1e-9


def test_async_checkpoint_roundtrip(tmp_path):
    """LOG.ASYNC_CKPT path: the background save commits after
    wait_for_checkpoints() and restores identically to a sync save."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), _batch(cfg), 10)
    state = state.replace(step=jnp.int32(7))

    path = ckpt_lib.save_checkpoint(str(tmp_path / "ck"), state, epoch=2,
                                    max_accuracy=0.25, async_save=True)
    ckpt_lib.wait_for_checkpoints()
    ckpt_lib.wait_for_checkpoints()  # idempotent

    state2, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(1), _batch(cfg), 10)
    restored, epoch, max_acc = ckpt_lib.load_checkpoint(path, state2)
    assert epoch == 2 and max_acc == 0.25
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_ignores_orbax_tmp_dirs(tmp_path):
    """A hard kill mid-(async)-save leaves 'ckpt_epoch_N.orbax-checkpoint-
    tmp-<ts>' dirs; resume must skip them instead of crashing on int()."""
    d = tmp_path / "ck"
    (d / "ckpt_epoch_3").mkdir(parents=True)
    (d / "ckpt_epoch_7.orbax-checkpoint-tmp-1755500000").mkdir()
    got = ckpt_lib.latest_checkpoint(str(d))
    assert got and got.endswith("ckpt_epoch_3")

    base = tmp_path / "runs"
    e = base / "exp_20260101_000000" / "checkpoints"
    e.mkdir(parents=True)
    (e / "ckpt_epoch_2").mkdir()
    (e / "ckpt_epoch_9.orbax-checkpoint-tmp-42").mkdir()
    got = ckpt_lib.latest_checkpoint_any_run(str(base), exp_name="exp")
    assert got and got.endswith("ckpt_epoch_2")


def test_keep_prunes_old_checkpoints(tmp_path):
    """LOG.KEEP_CKPTS: only the newest N committed checkpoints survive;
    in-flight tmp dirs and the just-written checkpoint are never touched."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), _batch(cfg), 10)
    d = str(tmp_path / "ck")
    for epoch in range(4):
        ckpt_lib.save_checkpoint(d, state, epoch, keep=2)
    import os
    names = sorted(x for x in os.listdir(d) if x.startswith("ckpt_epoch_"))
    assert names == ["ckpt_epoch_2", "ckpt_epoch_3"]


def test_schedules_clamp_past_horizon():
    """Past total_steps the linear schedule must hold its floor (unclamped
    it goes NEGATIVE -> gradient ascent) and cosine must hold min_lr
    (unclamped it climbs back toward base_lr)."""
    lin = linear_schedule(1e-3, total_steps=100, warmup_steps=0,
                          warmup_start_lr=1e-5, lr_min_rate=0.01)
    end = float(lin(100))
    for s in (101, 200, 10_000):
        assert float(lin(s)) == end > 0.0

    cos = cosine_schedule(1e-3, 1e-5, total_steps=100, warmup_steps=0,
                          warmup_start_lr=1e-5)
    for s in (101, 200, 10_000):
        np.testing.assert_allclose(float(cos(s)), 1e-5, rtol=1e-6)
