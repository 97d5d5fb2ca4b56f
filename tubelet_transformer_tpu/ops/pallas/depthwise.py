"""Pallas TPU kernel: depthwise (channel-separated) 3x3x3 convolution.

The irCSN backbone's hot op. XLA's grouped-conv lowering collapses at
C < 128 (layer1: C=64 runs at ~56 GB/s effective — measured on v5e), because
the channel (lane) dimension is half-empty. This kernel sidesteps that by
flattening (W, C) into the lane axis: a shift by one pixel in W becomes a
static slice offset of C lanes, so all 27 stencil taps are full-width VPU
multiply-adds over a (H, W*C) view held in VMEM.

Layout: x (B, T, H, W, C) channels-last, SAME padding, stride 1 (the only
depthwise stride-1 case in CSN layer1; strided blocks have C >= 128 where
XLA is already fast). Weights (3, 3, 3, C) — one filter per channel
(reference ir_CSN_152.py:48-51, groups == planes).

Gradients: custom_vjp with the backward expressed through XLA convs
(layer1 is frozen under the reference recipe — tune_point=4 — so backward
speed there is off the hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _dw_lax(x, w, stride=(1, 1, 1)):
    """Reference XLA implementation (also the fallback + backward basis)."""
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 3, 1, c), stride, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c)


def _dw_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, wd, c = x.shape
    lane = wd * c

    # Spatial SAME padding once in XLA; temporal handled in-kernel by masks.
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    xp = xp.reshape(b, t, h + 2, (wd + 2) * c)

    # Per-tap weights tiled across W so they broadcast over the flattened
    # (W*C) lane axis.
    w_tiled = jnp.tile(w.astype(jnp.float32).reshape(3, 3, 3, 1, c),
                       (1, 1, 1, wd, 1)).reshape(27, wd * c)

    out_dtype = x.dtype

    def kernel(xprev_ref, xcur_ref, xnext_ref, w_ref, o_ref):
        ti = pl.program_id(1)
        nt = pl.num_programs(1)
        acc = jnp.zeros((h, lane), jnp.float32)

        def taps(ref, dt, mask_val):
            nonlocal acc
            for dh in range(3):
                for dwi in range(3):
                    sl = ref[0, 0, dh:dh + h, dwi * c:dwi * c + lane]
                    wt = w_ref[dt * 9 + dh * 3 + dwi, :]
                    acc = acc + (sl.astype(jnp.float32) * wt[None, :]
                                 * mask_val)

        m_prev = (ti > 0).astype(jnp.float32)
        m_next = (ti < nt - 1).astype(jnp.float32)
        taps(xprev_ref, 0, m_prev)
        taps(xcur_ref, 1, 1.0)
        taps(xnext_ref, 2, m_next)
        o_ref[0, 0] = acc.astype(out_dtype)

    block = (1, 1, h + 2, (wd + 2) * c)
    spec_prev = pl.BlockSpec(block, lambda bi, tt: (bi, jnp.maximum(tt - 1, 0), 0, 0))
    spec_cur = pl.BlockSpec(block, lambda bi, tt: (bi, tt, 0, 0))
    spec_next = pl.BlockSpec(
        block, lambda bi, tt: (bi, jnp.minimum(tt + 1, t - 1), 0, 0))

    out = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[spec_prev, spec_cur, spec_next,
                  pl.BlockSpec((27, lane), lambda bi, tt: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, h, lane),
                               lambda bi, tt: (bi, tt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, h, lane), out_dtype),
    )(xp, xp, xp, w_tiled)
    return out.reshape(b, t, h, wd, c)


@jax.custom_vjp
def depthwise_conv3d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3x3 conv, stride 1, SAME. x (B,T,H,W,C); w (3,3,3,C)."""
    return _dw_pallas(x, w)


def _fwd(x, w):
    return depthwise_conv3d(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: correlate the cotangent with the spatially flipped filters
    # (depthwise conv is self-transpose up to a flip).
    dx = _dw_lax(g, w[::-1, ::-1, ::-1, :])
    # dw: reuse XLA's conv-vjp (single fused pass; a hand-rolled 27-tap
    # reduction re-reads x 27 times — verified equivalent in tests).
    _, vjp = jax.vjp(lambda w_: _dw_lax(x, w_), w)
    (dw,) = vjp(g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


depthwise_conv3d.defvjp(_fwd, _bwd)


def depthwise_conv3x3x3(x, w, stride=(1, 1, 1), use_pallas: bool = True):
    """Dispatch: Pallas kernel on TPU for stride-1 / C < 128 (where XLA's
    grouped-conv lowering underutilizes the lane dim); XLA otherwise."""
    if (use_pallas and stride == (1, 1, 1) and x.shape[-1] < 128
            and jax.default_backend() == "tpu"):
        return depthwise_conv3d(x, w)
    return _dw_lax(x, w, stride)
