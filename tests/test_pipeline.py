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
