"""MoE FFN unit tests: dense equivalence, routing math, capacity drops,
aux loss, and expert-parallel sharding parity on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tubelet_transformer_tpu.models.moe import MoEFFN
from tubelet_transformer_tpu.parallel import mesh as mesh_lib
from tubelet_transformer_tpu.parallel.sharding_rules import param_shardings

B, S, D, F = 2, 16, 8, 32


def _x(rng, b=B, s=S, d=D):
    return jnp.asarray(rng.normal(0, 1, (b, s, d)), jnp.float32)


def test_single_expert_matches_dense(rng):
    """E=1 with capacity >= S routes every token to the one expert with
    gate 1.0 — output must equal the plain dense FFN on the same weights."""
    x = _x(rng)
    m = MoEFFN(D, F, num_experts=1, top_k=1, capacity_factor=float(S))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)

    p = v["params"]
    w1, b1 = p["expert_w1"][0], p["expert_b1"][0]
    w2, b2 = p["expert_w2"][0], p["expert_b2"][0]
    ref = jax.nn.relu(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_top2_matches_manual_mixture(rng):
    """top-2 with full capacity == renormalized gate-weighted sum of the two
    chosen experts' dense FFNs, token by token."""
    e = 4
    x = _x(rng)
    m = MoEFFN(D, F, num_experts=e, top_k=2, capacity_factor=float(S * e))
    v = m.init(jax.random.PRNGKey(1), x)
    y = np.asarray(m.apply(v, x))

    p = v["params"]
    logits = np.asarray(x @ p["router"]["kernel"])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    w1, b1 = np.asarray(p["expert_w1"]), np.asarray(p["expert_b1"])
    w2, b2 = np.asarray(p["expert_w2"]), np.asarray(p["expert_b2"])

    ref = np.zeros((B, S, D), np.float32)
    for b in range(B):
        for s in range(S):
            order = np.argsort(-probs[b, s])
            g = probs[b, s, order[:2]]
            g = g / g.sum()
            for gi, ei in zip(g, order[:2]):
                h = np.maximum(x[b, s] @ w1[ei] + b1[ei], 0.0)
                ref[b, s] += gi * (h @ w2[ei] + b2[ei])
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_capacity_drops_pass_through_as_zero(rng):
    """With capacity 1 and every token routed to expert 0, only the first
    token per row produces output; dropped tokens contribute exactly zero
    (the encoder residual then passes them through unchanged)."""
    e = 4
    x = _x(rng)
    m = MoEFFN(D, F, num_experts=e, top_k=1, capacity_factor=1e-6)
    v = m.init(jax.random.PRNGKey(2), x)
    # Zero router kernel -> uniform probs -> argmax tie-breaks to expert 0
    # for every token; capacity_factor 1e-6 -> capacity 1.
    params = dict(v["params"])
    params["router"] = {"kernel": jnp.zeros((D, e), jnp.float32)}
    y = np.asarray(m.apply({"params": params}, x))
    assert np.abs(y[:, 0]).max() > 0
    assert np.abs(y[:, 1:]).max() == 0.0


def test_aux_loss_is_one_for_uniform_probs(rng):
    """Switch aux = E * sum_e f_e * P_e; with uniform router probs P_e = 1/E
    so aux = sum_e f_e = 1 regardless of tie-broken routing."""
    e = 4
    x = _x(rng)
    m = MoEFFN(D, F, num_experts=e, top_k=1, capacity_factor=2.0)
    v = m.init(jax.random.PRNGKey(3), x)
    params = dict(v["params"])
    params["router"] = {"kernel": jnp.zeros((D, e), jnp.float32)}
    _, state = m.apply({"params": params}, x, mutable=["moe"])
    aux = jax.tree.leaves(state["moe"])[0]
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_expert_parallel_sharding_parity(rng):
    """Expert kernels sharded over the mesh 'model' axis produce the same
    output as replicated params — EP changes layout, not math."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    e = 4
    x = _x(rng, b=4)
    m = MoEFFN(D, F, num_experts=e, top_k=2, capacity_factor=2.0)
    v = m.init(jax.random.PRNGKey(4), x)

    y_ref = np.asarray(jax.jit(lambda p, x: m.apply({"params": p}, x))(
        v["params"], x))

    mesh = mesh_lib.create_mesh(data=4, model=2)
    shardings = param_shardings(v["params"], mesh)
    # the rule must have sharded the expert stacks and replicated the router
    assert shardings["expert_w1"].spec[0] == "model"
    assert shardings["router"]["kernel"].spec == jax.sharding.PartitionSpec()
    p_sharded = jax.tree.map(jax.device_put, v["params"], shardings)
    x_sharded = jax.device_put(x, mesh_lib.batch_sharding(mesh))
    y_ep = np.asarray(jax.jit(lambda p, x: m.apply({"params": p}, x))(
        p_sharded, x_sharded))
    np.testing.assert_allclose(y_ep, y_ref, rtol=1e-5, atol=1e-5)


def test_padded_tokens_do_not_consume_capacity(rng):
    """With pad_mask set, padded tokens get zero output, take no expert
    capacity (real tokens behind them in raster order still get served),
    and are excluded from the load-balance statistics."""
    e = 2
    x = _x(rng)
    m = MoEFFN(D, F, num_experts=e, top_k=1, capacity_factor=1.0)
    v = m.init(jax.random.PRNGKey(5), x)
    params = dict(v["params"])
    # zero router -> everything routes to expert 0; capacity = S/2
    params["router"] = {"kernel": jnp.zeros((D, e), jnp.float32)}

    # first half of every row padded
    pad = jnp.asarray(np.arange(S)[None, :] < S // 2) & jnp.ones((B, 1), bool)
    y_pad, st = m.apply({"params": params}, x, True, pad, mutable=["moe"])
    y_pad = np.asarray(y_pad)
    # padded tokens: exactly zero output (residual passthrough upstream)
    assert np.abs(y_pad[:, : S // 2]).max() == 0.0
    # all real tokens served: capacity S/2 exactly fits the S/2 real tokens
    assert (np.abs(y_pad[:, S // 2:]).max(axis=-1) > 0).all()
    # aux over valid tokens only: uniform probs -> exactly 1.0
    np.testing.assert_allclose(float(jax.tree.leaves(st["moe"])[0]), 1.0,
                               rtol=1e-6)

    # without the mask, the padded half would exhaust expert 0's capacity
    y_nomask = np.asarray(m.apply({"params": params}, x))
    assert np.abs(y_nomask[:, S // 2:]).max() == 0.0
