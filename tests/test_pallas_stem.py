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


def test_train_two_phase_stem_matches_xla():
    """Frozen-stem train path: the conv-stats pass + batch-affine fused
    pass must reproduce XLA train-mode BN (conv output, batch statistics,
    and the pooled output), stage-level."""
    import jax
    import jax.numpy as jnp
    from tubelet_transformer_tpu.ops.pallas import stem as S

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 256, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, .05, (3, 7, 7, 3, 64)), jnp.float32)
    ones = jnp.ones((64,), jnp.float32)
    zeros = jnp.zeros((64,), jnp.float32)

    y_cm = S.stem_conv_bn_relu(x, w, ones, zeros, False)
    y_ref = S._stem_xla(x, w, ones, zeros, relu=False)
    rel = float(jnp.abs(y_cm - y_ref).max() / jnp.abs(y_ref).max())
    assert rel < 5e-3, rel

    def stats(y):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 3, 4))
        return m, jnp.mean(jnp.square(yf), axis=(0, 1, 3, 4)) - m ** 2

    mean, var = stats(y_cm)
    mean_r, var_r = stats(y_ref)
    assert float(jnp.abs(mean - mean_r).max()) < 1e-3
    assert float(jnp.abs(var - var_r).max()) < 5e-3

    mul = jax.lax.rsqrt(var + 1e-3)
    shift = -mean * mul
    out = S.stem_forward(x, w, mul, shift)
    out_ref = S._stem_xla(x, w, mul, shift, relu=True, pool=True)
    rel = float(jnp.abs(out - out_ref).max() / jnp.abs(out_ref).max())
    assert rel < 1e-2, rel


def test_stem_batch_stats_matches_xla():
    """In-kernel phase-1 statistics (f32 accumulator, conv output never
    materialized) must match the XLA composite's batch mean/var."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 64, 256, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, .05, (3, 7, 7, 3, 64)), jnp.float32)
    ones = jnp.ones((64,), jnp.float32)
    zeros = jnp.zeros((64,), jnp.float32)

    mean, var = S.stem_batch_stats(S.stem_prep(x), x.shape, w)

    y_ref = S._stem_xla(x, w, ones, zeros, relu=False).astype(jnp.float32)
    mean_r = jnp.mean(y_ref, axis=(0, 1, 3, 4))
    var_r = jnp.mean(jnp.square(y_ref), axis=(0, 1, 3, 4)) - mean_r ** 2
    assert float(jnp.abs(mean - mean_r).max()) < 1e-3
    assert float(jnp.abs(var - var_r).max()) < 5e-3
    assert float(var.min()) > 0


def test_stem_batch_stats_224():
    """W' = 112 (JHMDB/UCF input size): ghost lanes beyond W' carry
    nonzero edge-tap garbage that the stats kernel must mask out."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 4, 64, 224, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, .05, (3, 7, 7, 3, 64)), jnp.float32)

    mean, var = S.stem_batch_stats(S.stem_prep(x), x.shape, w)

    y_ref = S._stem_xla(x, w, jnp.ones((64,)), jnp.zeros((64,)),
                        relu=False).astype(jnp.float32)
    mean_r = jnp.mean(y_ref, axis=(0, 1, 3, 4))
    var_r = jnp.mean(jnp.square(y_ref), axis=(0, 1, 3, 4)) - mean_r ** 2
    assert float(jnp.abs(mean - mean_r).max()) < 1e-3
    assert float(jnp.abs(var - var_r).max()) < 5e-3


def test_train_two_phase_dispatch(monkeypatch):
    """The frozen-stem train path must dispatch (and update batch stats)
    exactly when stem_train_supported holds and stop_grad_stage == 0."""
    from tubelet_transformer_tpu.models import csn as csn_mod
    from tubelet_transformer_tpu.ops.pallas.stem import stem_train_supported

    tpu = __import__("jax").default_backend() == "tpu"
    # W' = 112 (JHMDB/UCF 224 px) supported since the ghost-lane stats mask
    assert stem_train_supported((1, 4, 64, 224, 3)) == tpu
    assert stem_train_supported((1, 4, 64, 256, 3)) == tpu
    assert not stem_train_supported((1, 3, 64, 256, 3))   # odd T
