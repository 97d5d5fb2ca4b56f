"""Fused Pallas stem (conv 3x7x7 + BN + ReLU + max-pool) parity tests.

Runs the kernels in interpret mode on CPU against the XLA composite
(`_stem_xla`), which itself matches the reference stem
(ir_CSN_152.py:97-104) — covered transitively by tests/test_csn.py's
torch-parity goldens.  On-TPU parity/perf live in benchmarks/bench_stem.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.ops.pallas import stem as S


@pytest.fixture(autouse=True)
def _interpret():
    S._DEBUG["interpret"] = True
    yield
    S._DEBUG["interpret"] = False


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(0, 1, shape), dtype)


def test_stem_conv_parity():
    x = _rand((1, 4, 32, 256, 3))
    w = _rand((3, 7, 7, 3, 64), seed=1) * 0.05
    ones, zeros = jnp.ones((64,)), jnp.zeros((64,))
    ref = S._stem_xla(x, w, ones, zeros, relu=False)
    got = S._stem_pallas(x, w, ones, zeros, relu=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_stem_pooled_parity():
    x = _rand((2, 4, 32, 256, 3))
    w = _rand((3, 7, 7, 3, 64), seed=1) * 0.05
    sc = jnp.asarray(np.random.default_rng(2).uniform(0.5, 2, 64), jnp.float32)
    bi = _rand((64,), seed=3)
    ref = S._stem_xla(x, w, sc, bi, relu=True, pool=True)
    got = S.stem_forward(x, w, sc, bi)
    assert got.shape == (2, 4, 8, 64, 64)
    # bf16 internals; the random BN scale amplifies rounding
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)


def test_stem_supported_gating():
    assert not S.stem_supported((1, 3, 32, 256, 3))   # odd T
    assert not S.stem_supported((1, 4, 32, 200, 3))   # W' not 128-multiple
    assert not S.stem_supported((1, 4, 24, 256, 3))   # H' not 2*HB multiple
    # shape-valid cases still require a TPU backend
    expected = jax.default_backend() == "tpu"
    assert S.stem_supported((1, 4, 32, 256, 3)) == expected


def test_stem_grad_matches_xla():
    """custom_vjp routes the backward through the XLA composite."""
    x = _rand((1, 2, 32, 256, 3))
    w = _rand((3, 7, 7, 3, 64), seed=1) * 0.05
    sc = jnp.ones((64,))
    bi = jnp.zeros((64,))

    def loss_pallas(w_):
        return jnp.sum(S.stem_forward(x, w_, sc, bi) ** 2)

    def loss_xla(w_):
        return jnp.sum(S._stem_xla(x, w_, sc, bi, relu=True, pool=True) ** 2)

    g_p = np.asarray(jax.grad(loss_pallas)(w), np.float64)
    g_x = np.asarray(jax.grad(loss_xla)(w), np.float64)
    # bf16 primal vs f32 recompute flips max-pool argmax on near-ties, so
    # a few elements differ; the gradient as a whole must agree
    rel = np.linalg.norm(g_p - g_x) / np.linalg.norm(g_x)
    assert rel < 2e-2, rel


def test_stem_pooled_parity_224():
    """JHMDB/UCF input size: W' = 112 rides padded 128-lane row blocks."""
    x = _rand((1, 4, 224, 224, 3))
    w = _rand((3, 7, 7, 3, 64), seed=1) * 0.05
    sc = jnp.ones((64,))
    bi = jnp.zeros((64,))
    ref = S._stem_xla(x, w, sc, bi, relu=True, pool=True)
    got = S.stem_forward(x, w, sc, bi)
    assert got.shape == (1, 4, 56, 56, 64)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)
