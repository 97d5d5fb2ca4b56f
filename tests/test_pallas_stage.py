"""Chained ir-bottleneck stage kernel parity (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.ops.pallas import stage as S


@pytest.fixture(autouse=True)
def _interpret():
    S._INTERPRET["on"] = True
    yield
    S._INTERPRET["on"] = False


def _args(k=3, b=2, t=5, h=8, w=8, ci=32, cm=16, seed=0):
    rng = np.random.default_rng(seed)

    def mk(*s, scale=1.0):
        return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

    x = mk(b, t, h, w, ci)
    return (x, mk(k, ci, cm, scale=.1), mk(k, 3, 3, 3, cm, scale=.2),
            mk(k, cm, ci, scale=.1),
            mk(k, cm, scale=.3) + 1, mk(k, cm, scale=.3),
            mk(k, cm, scale=.3) + 1, mk(k, cm, scale=.3),
            mk(k, ci, scale=.3) + 1, mk(k, ci, scale=.3))


@pytest.mark.parametrize("k", [1, 2, 3])
def test_chain_parity(k):
    args = _args(k=k)
    ref = np.asarray(S.chain_xla(args[0], args[1:]), np.float32)
    got = np.asarray(S.bottleneck_chain(*args), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel


def test_chain_batch_ring_reset():
    """Rings must reset between batch rows (skewed pipeline drains)."""
    args = _args(k=2, b=3, t=4)
    ref = np.asarray(S.chain_xla(args[0], args[1:]), np.float32)
    got = np.asarray(S.bottleneck_chain(*args), np.float32)
    for bi in range(3):
        rel = np.abs(got[bi] - ref[bi]).max() / np.abs(ref).max()
        assert rel < 5e-3, (bi, rel)


def test_chain_grad_via_xla():
    args = _args(k=2, b=1, t=3)
    g_p = jax.grad(lambda w1: jnp.sum(
        S.bottleneck_chain(args[0], w1, *args[2:]) ** 2))(args[1])
    g_x = jax.grad(lambda w1: jnp.sum(
        S.chain_xla(args[0], (w1,) + tuple(args[2:])) ** 2))(args[1])
    rel = (np.linalg.norm(np.asarray(g_p - g_x, np.float64))
           / np.linalg.norm(np.asarray(g_x, np.float64)))
    assert rel < 2e-2, rel


def test_csn_fused_stages_matches_unfused(monkeypatch):
    """Model-level: the stage-chain path must reproduce the per-block path
    (CSN with multi-block stages, forced dispatch, interpret mode)."""
    import jax
    from tubelet_transformer_tpu.models import csn as csn_mod

    monkeypatch.setitem(csn_mod.BLOCK_NUMS, "CHAINTEST", (1, 3, 2, 1))
    monkeypatch.setattr(csn_mod, "chain_supported",
                        lambda shape, cm: shape[2] * shape[3] >= 16)
    x = np.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 4, 32, 32, 3)), np.float32)

    m0 = csn_mod.build_csn("CHAINTEST", last_stride=False)
    v = jax.jit(lambda r: m0.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    ref = np.asarray(m0.apply(v, x, train=False))

    m1 = csn_mod.build_csn("CHAINTEST", last_stride=False, fused_stages=True)
    got = np.asarray(m1.apply(v, x, train=False))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel
