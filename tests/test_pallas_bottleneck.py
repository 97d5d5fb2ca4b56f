"""Fused ir-bottleneck Pallas kernel parity tests (interpret mode, CPU).

The kernel is parity-exact but currently dispatched OFF by default
(cfg MODEL.FUSED_BLOCKS): it wins standalone but loses in-model (151 vs
214 clips/s — the pallas_call fusion barrier + per-frame grid vs XLA's
full-batch matmuls).  These tests keep the groundwork correct.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.ops.pallas import bottleneck as B


@pytest.fixture(autouse=True)
def _interpret():
    B._INTERPRET["on"] = True
    yield
    B._INTERPRET["on"] = False


def _args(b=2, t=5, h=8, w=8, ci=512, cm=128, seed=0):
    rng = np.random.default_rng(seed)

    def mk(*s, scale=1.0):
        return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

    x = mk(b, t, h, w, ci)
    return (x, mk(ci, cm, scale=.05), mk(3, 3, 3, cm, scale=.2),
            mk(cm, ci, scale=.05), mk(cm, scale=.3) + 1, mk(cm, scale=.3),
            mk(cm, scale=.3) + 1, mk(cm, scale=.3),
            mk(ci, scale=.3) + 1, mk(ci, scale=.3))


def test_bottleneck_parity():
    args = _args()
    ref = np.asarray(B.bottleneck_xla(*args), np.float32)
    got = np.asarray(B.bottleneck_fused(*args), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel  # bf16 products, f32 accumulation


def test_bottleneck_batch_ring_reset():
    """The persistent mid-ring must reset between batch rows."""
    args = _args(b=3, t=4)
    ref = np.asarray(B.bottleneck_xla(*args), np.float32)
    got = np.asarray(B.bottleneck_fused(*args), np.float32)
    for bi in range(3):
        rel = np.abs(got[bi] - ref[bi]).max() / np.abs(ref).max()
        assert rel < 5e-3, (bi, rel)


def test_bottleneck_grad_via_xla():
    args = _args(b=1, t=3)

    g_p = jax.grad(lambda w1: jnp.sum(
        B.bottleneck_fused(args[0], w1, *args[2:]) ** 2))(args[1])
    g_x = jax.grad(lambda w1: jnp.sum(
        B.bottleneck_xla(args[0], w1, *args[2:]) ** 2))(args[1])
    rel = (np.linalg.norm(np.asarray(g_p, np.float64) - np.asarray(g_x, np.float64))
           / np.linalg.norm(np.asarray(g_x, np.float64)))
    assert rel < 2e-2, rel


def test_bottleneck_supported_gating():
    shape = (1, 4, 32, 32, 512)
    on_tpu = jax.default_backend() == "tpu"
    assert B.bottleneck_supported(shape, 128, 1, 1, False) == on_tpu
    assert not B.bottleneck_supported(shape, 128, 2, 1, False)   # strided
    assert not B.bottleneck_supported(shape, 128, 1, 2, False)   # t-strided
    assert not B.bottleneck_supported(shape, 128, 1, 1, True)    # downsample
    assert not B.bottleneck_supported(shape, 64, 1, 1, False)    # thin lanes
    assert not B.bottleneck_supported((1, 4, 16, 16, 1024), 256, 1, 1, False)
