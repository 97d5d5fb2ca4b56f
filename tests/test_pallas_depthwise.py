"""Depthwise conv3d custom-vjp math vs XLA (CPU; the Pallas forward itself is
exercised on TPU — forward parity there is exact, see ops/pallas/depthwise)."""

import jax
import jax.numpy as jnp
import numpy as np

from tubelet_transformer_tpu.ops.pallas.depthwise import (
    _bwd,
    _dw_lax,
    depthwise_conv3x3x3,
)


def test_backward_matches_lax_vjp(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (2, 4, 6, 6, 8)), jnp.float32)
    _, vjp = jax.vjp(_dw_lax, x, w)
    dx_ref, dw_ref = vjp(g)
    dx, dw = _bwd((x, w), g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-4)


def test_dispatch_fallback_off_tpu(rng):
    """On CPU the dispatcher must route to the XLA implementation."""
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 4, 4, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 8)), jnp.float32)
    out = depthwise_conv3x3x3(x, w)
    ref = _dw_lax(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # strided path
    out_s = depthwise_conv3x3x3(x, w, stride=(2, 2, 2))
    assert out_s.shape == (1, 1, 2, 2, 8)


def test_bfold_exact(rng):
    """Batch-fold (two batch items stacked along channels) is algebraically
    identical to the plain depthwise conv — pure data movement plus the
    same per-channel taps."""
    from tubelet_transformer_tpu.ops.pallas.depthwise import _dw_bfold

    x = jnp.asarray(rng.normal(0, 1, (2, 4, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_dw_bfold(x, w)),
                               np.asarray(_dw_lax(x, w)),
                               rtol=1e-6, atol=1e-6)
