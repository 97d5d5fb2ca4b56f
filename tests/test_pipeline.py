"""Pipeline-parallel encoder tests: the GPipe shard_map schedule must be
loss- and grad-exact vs the sequential layer loop, params must stack/unstack
losslessly, and the pipelined Transformer must reproduce the standard one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tubelet_transformer_tpu.models.layers import EncoderLayer
from tubelet_transformer_tpu.parallel import mesh as mesh_lib
from tubelet_transformer_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_encoder_params,
    stack_layer_params,
    unstack_encoder_params,
)

D, NHEAD, FF = 32, 4, 64
B, S = 8, 10
N_LAYERS = 4


@pytest.fixture(scope="module")
def layer_setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    layer = EncoderLayer(D, NHEAD, FF, dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, S)) < 0.2)
    pos = jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), N_LAYERS)
    trees = [layer.init({"params": k}, x, mask, pos)["params"] for k in keys]
    return layer, x, mask, pos, trees


def _sequential(layer, trees, x, mask, pos):
    for p in trees:
        x = layer.apply({"params": p}, x, mask, pos, True)
    return x


def _pipelined(layer, mesh, microbatches):
    def layer_fn(p, x, aux, r):
        return layer.apply({"params": p}, x, aux["mask"], aux["pos"], True)

    def run(stacked, x, mask, pos):
        return pipeline_apply(layer_fn, stacked, x,
                              {"mask": mask, "pos": pos}, mesh, microbatches)

    return run


@pytest.mark.parametrize("layout,microbatches", [
    ((2, 1, 4), 2),   # dp x pp
    ((1, 2, 4), 4),   # tp-axis present (replicated) x pp
    ((4, 1, 2), 2),   # shallow pipeline
])
def test_pipeline_matches_sequential(layer_setup, layout, microbatches):
    layer, x, mask, pos, trees = layer_setup
    d, m, p = layout
    mesh = mesh_lib.create_mesh(data=d, model=m, pipe=p)
    stacked = stack_layer_params(trees)
    y_ref = np.asarray(_sequential(layer, trees, x, mask, pos))
    y_pp = np.asarray(jax.jit(_pipelined(layer, mesh, microbatches))(
        stacked, x, mask, pos))
    np.testing.assert_allclose(y_pp, y_ref, rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential(layer_setup):
    layer, x, mask, pos, trees = layer_setup
    mesh = mesh_lib.create_mesh(data=2, model=1, pipe=4)
    stacked = stack_layer_params(trees)
    run = _pipelined(layer, mesh, microbatches=2)

    g_pp = jax.grad(lambda st: (run(st, x, mask, pos) ** 2).sum())(stacked)
    g_seq_layers = jax.grad(
        lambda ts: (_sequential(layer, ts, x, mask, pos) ** 2).sum())(trees)
    g_seq = stack_layer_params(g_seq_layers)

    flat_pp, _ = jax.tree.flatten(g_pp)
    flat_seq, _ = jax.tree.flatten(g_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_stack_unstack_roundtrip(layer_setup):
    _, _, _, _, trees = layer_setup
    tr_params = {f"encoder_layer_{i}": t for i, t in enumerate(trees)}
    tr_params["decoder_norm"] = {"scale": jnp.ones((D,))}
    stacked = stack_encoder_params(tr_params, N_LAYERS)
    assert "encoder_stack" in stacked and "decoder_norm" in stacked
    assert not any(k.startswith("encoder_layer_") for k in stacked)
    back = unstack_encoder_params(stacked, N_LAYERS)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(tr_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_transformer_matches_sequential(layer_setup):
    """Full Transformer with MESH.PIPE stages == the sequential Transformer
    on the same weights (encoder params stacked via stack_encoder_params)."""
    from tubelet_transformer_tpu.models.transformer import Transformer

    _, x, mask, pos, _ = layer_setup
    mesh = mesh_lib.create_mesh(data=2, model=1, pipe=4)
    q = jnp.asarray(np.random.default_rng(1).normal(0, 1, (5, D)), jnp.float32)

    seq_tr = Transformer(d_model=D, nhead=NHEAD, num_encoder_layers=N_LAYERS,
                         num_decoder_layers=2, dim_feedforward=FF,
                         dropout=0.0)
    pp_tr = Transformer(d_model=D, nhead=NHEAD, num_encoder_layers=N_LAYERS,
                        num_decoder_layers=2, dim_feedforward=FF,
                        dropout=0.0, pipeline_stages=4,
                        pipeline_microbatches=2, mesh=mesh)

    v = seq_tr.init(jax.random.PRNGKey(0), x, mask, q, pos)
    y_seq = np.asarray(seq_tr.apply(v, x, mask, q, pos))

    pp_params = stack_encoder_params(dict(v["params"]), N_LAYERS)
    y_pp = np.asarray(jax.jit(
        lambda p, x, mask, q, pos: pp_tr.apply({"params": p}, x, mask, q, pos)
    )(pp_params, x, mask, q, pos))
    np.testing.assert_allclose(y_pp, y_seq, rtol=2e-5, atol=2e-5)


def test_checkpoint_loading_into_pp_run(tmp_path):
    """MODEL.LOAD into a MESH.PIPE run: a sequential-layout orbax checkpoint
    is unstacked/restacked around the loaders; a PP-shaped checkpoint loads
    directly. Restored stacked encoder == stack of the sequential params."""
    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
    from tubelet_transformer_tpu.train import engine

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")

    def tiny(pipe):
        cfg = Config()
        cfg.data.num_classes = 5
        cfg.data.max_boxes = 4
        cfg.data.img_size = 32
        cfg.data.temp_len = 8
        cfg.model.backbone_name = "CSN-TINY"
        cfg.model.query_num = 5
        cfg.model.temp_len = 8
        cfg.model.enc_layers = 2
        cfg.model.dec_layers = 1
        cfg.model.d_model = 64
        cfg.model.nhead = 4
        cfg.model.dim_feedforward = 64
        cfg.model.compute_dtype = "float32"
        cfg.model.temporal_ds_strategy = "avg"
        cfg.mesh.pipe = pipe
        cfg.mesh.pipe_microbatches = 2
        return cfg

    batch = {"clips": np.zeros((2, 8, 32, 32, 3), np.float32),
             "pad_mask": np.zeros((2, 32, 32), bool)}

    # sequential run writes a checkpoint
    cfg_seq = tiny(pipe=1)
    model_seq = build_model(cfg_seq)
    state_seq, _, _ = engine.create_train_state(
        cfg_seq, model_seq, jax.random.PRNGKey(0), batch, 10)
    path_seq = ckpt_lib.save_checkpoint(str(tmp_path / "seq"), state_seq,
                                        epoch=1)

    # PP run loads it
    cfg_pp = tiny(pipe=2)
    cfg_pp.model.load = True
    cfg_pp.model.pretrained_path = path_seq
    mesh = mesh_lib.create_mesh(1, 1, 2, devices=jax.devices()[:2])
    model_pp = build_model(cfg_pp, mesh=mesh)
    state_pp, _, _ = engine.create_train_state(
        cfg_pp, model_pp, jax.random.PRNGKey(1), batch, 10)
    vars_pp = {"params": jax.device_get(state_pp.params),
               "batch_stats": jax.device_get(state_pp.batch_stats)}
    out = ckpt_lib.load_pretrained(cfg_pp, vars_pp)

    want = stack_encoder_params(
        dict(jax.device_get(state_seq.params)["transformer"]), 2)
    got = out["params"]["transformer"]["encoder_stack"]
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(
            want["encoder_stack"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-encoder weights came from the checkpoint too
    np.testing.assert_array_equal(
        np.asarray(out["params"]["query_embed"]),
        np.asarray(jax.device_get(state_seq.params)["query_embed"]))

    # a PP-shaped checkpoint loads directly (stacked-first branch)
    loaded_pp = state_pp.replace(params=out["params"],
                                 batch_stats=out["batch_stats"])
    path_pp = ckpt_lib.save_checkpoint(str(tmp_path / "pp"), loaded_pp,
                                       epoch=1)
    cfg_pp2 = tiny(pipe=2)
    cfg_pp2.model.load = True
    cfg_pp2.model.pretrained_path = path_pp
    out2 = ckpt_lib.load_pretrained(cfg_pp2, vars_pp)
    for a, b in zip(
            jax.tree.leaves(out2["params"]["transformer"]["encoder_stack"]),
            jax.tree.leaves(want["encoder_stack"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_checkpoint_into_sequential_run(tmp_path):
    """The inverse direction: a PP-trained (stacked) orbax checkpoint loads
    into a pipe=1 run (export / sequential eval) via stack-restore-unstack;
    encoder layers must match the original per-layer weights exactly."""
    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
    from tubelet_transformer_tpu.train import engine

    cfg = Config()
    cfg.data.num_classes = 5
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 2
    cfg.model.dec_layers = 1
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    batch = {"clips": np.zeros((2, 8, 32, 32, 3), np.float32),
             "pad_mask": np.zeros((2, 32, 32), bool)}

    # make a PP-shaped state by stacking a sequential init, save it
    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, 10)
    seq_params = jax.device_get(state.params)
    pp_params = dict(seq_params)
    pp_params["transformer"] = stack_encoder_params(
        dict(seq_params["transformer"]), 2)
    path = ckpt_lib.save_checkpoint(
        str(tmp_path / "pp"), state.replace(params=pp_params), epoch=1)

    # a fresh sequential run loads it
    cfg.model.load = True
    cfg.model.pretrained_path = path
    state2, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(7), batch, 10)
    out = ckpt_lib.load_pretrained(
        cfg, {"params": jax.device_get(state2.params),
              "batch_stats": jax.device_get(state2.batch_stats)})
    for i in range(2):
        for a, b in zip(
                jax.tree.leaves(out["params"]["transformer"]
                                [f"encoder_layer_{i}"]),
                jax.tree.leaves(seq_params["transformer"]
                                [f"encoder_layer_{i}"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_dropout_decorrelated_across_data_shards(layer_setup):
    """With dropout active, identical samples on different 'data' shards
    must draw different masks (the key folds in the data coordinate);
    within one shard the draw is deterministic given the key."""
    layer, x, mask, pos, trees = layer_setup
    mesh = mesh_lib.create_mesh(data=2, model=1, pipe=4)
    stacked = stack_layer_params(trees)
    # duplicate the first half of the batch into the second half: shard 0
    # and shard 1 see identical inputs
    xd = jnp.concatenate([x[: B // 2], x[: B // 2]], axis=0)
    maskd = jnp.concatenate([mask[: B // 2], mask[: B // 2]], axis=0)
    posd = jnp.concatenate([pos[: B // 2], pos[: B // 2]], axis=0)

    drop_layer = EncoderLayer(D, NHEAD, FF, dropout=0.5)

    def layer_fn_d(p, xx, aux, r):
        return drop_layer.apply({"params": p}, xx, aux["mask"], aux["pos"],
                                False, rngs={"dropout": r})

    y = jax.jit(lambda st, x, m, p: pipeline_apply(
        layer_fn_d, st, x, {"mask": m, "pos": p}, mesh, 2,
        rng=jax.random.PRNGKey(3)))(stacked, xd, maskd, posd)
    y = np.asarray(y)
    half0, half1 = y[: B // 2], y[B // 2:]
    assert np.abs(half0 - half1).max() > 1e-3, \
        "identical samples on different data shards drew identical dropout"


def test_resume_across_pipe_change_refuses(tmp_path):
    """Full-state resume (load_checkpoint) across a MESH.PIPE change must
    raise instead of silently partial-restoring the encoder."""
    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
    from tubelet_transformer_tpu.train import engine

    cfg = Config()
    cfg.data.num_classes = 5
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 2
    cfg.model.dec_layers = 1
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    batch = {"clips": np.zeros((2, 8, 32, 32, 3), np.float32),
             "pad_mask": np.zeros((2, 32, 32), bool)}

    model = build_model(cfg)
    state, _, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, 10)
    path = ckpt_lib.save_checkpoint(str(tmp_path / "seq"), state, epoch=1)

    cfg_pp = cfg
    cfg_pp.mesh.pipe = 2
    cfg_pp.mesh.pipe_microbatches = 2
    mesh = mesh_lib.create_mesh(1, 1, 2, devices=jax.devices()[:2])
    model_pp = build_model(cfg_pp, mesh=mesh)
    state_pp, _, _ = engine.create_train_state(
        cfg_pp, model_pp, jax.random.PRNGKey(1), batch, 10)
    with pytest.raises(ValueError, match="MESH.PIPE"):
        ckpt_lib.load_checkpoint(path, state_pp)
