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


def _dw_tfold(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3x3 stride-1 SAME as three 2D depthwise convs over the
    T-folded batch, plus a temporal shift-sum.

    At layer1 scale (C=64) XLA's native conv emitter puts batch on
    sublanes; with only B in batch the sublane dim is starved and the 3D
    depthwise runs ~10x over the bandwidth floor (ROADMAP "Measured
    ceilings"). Folding T into batch feeds the same emitter B*T rows —
    the measured 3x layout win — and the temporal taps become a
    shift-and-add that XLA fuses into one elementwise pass. The
    (B,T,...)->(B*T,...) reshapes merge leading dims only, so they are
    layout-preserving bitcasts, not graph-level repacks.
    """
    b, t, h, wd, c = x.shape
    xf = x.reshape(b * t, h, wd, c)

    def conv2d(dt):
        return lax.conv_general_dilated(
            xf, w[dt].reshape(3, 3, 1, c), (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c).reshape(b, t, h, wd, c)

    # out[t] = w[0]*x[t-1] + w[1]*x[t] + w[2]*x[t+1]  (SAME, zero edges)
    y0, y1, y2 = conv2d(0), conv2d(1), conv2d(2)
    zero = jnp.zeros_like(y1[:, :1])
    return (y1
            + jnp.concatenate([zero, y0[:, :-1]], axis=1)
            + jnp.concatenate([y2[:, 1:], zero], axis=1))


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


def _dw_bfold(x, w):
    """Two batch items stacked along channels: depthwise conv is
    independent per channel AND per batch item, so stacking b=2 into the
    lane axis (filter tiled 2x) computes the identical result while
    filling the 128-lane registers that C=64 leaves half-empty.  Exact
    (pure data movement + the same per-channel taps).

    MEASURED DEAD END — not dispatched.  Isolated (v5e, layer1 scale,
    benchmarks/bench_depthwise_layer1.py) it wins at b=2 (0.699 vs
    1.227 ms, -43%) and loses at b=8 (7.5 vs 2.2 ms, lane concats
    dominate).  In the full forward graph the b=2 win INVERTS too:
    bench.py dropped 245.5 -> 182.7 clips/s (bytes/clip 3.55 -> 4.88 GB)
    because the concats materialize as graph-level relayouts that also
    break the producer/consumer fusions around the conv — the same
    failure mode as the other repack dead ends in BASELINE.md."""
    b, c = x.shape[0], x.shape[-1]
    x2 = jnp.concatenate([x[: b // 2], x[b // 2:]], axis=-1)
    y2 = _dw_lax(x2, jnp.tile(w, (1, 1, 1, 2)))
    return jnp.concatenate([y2[..., :c], y2[..., c:]], axis=0)


def depthwise_conv3x3x3(x, w, stride=(1, 1, 1), use_pallas: bool = True):
    """Dispatch: Pallas kernel on TPU for stride-1 / C < 128 (where XLA's
    grouped-conv lowering underutilizes the lane dim); XLA otherwise."""
    if (use_pallas and stride == (1, 1, 1) and x.shape[-1] < 128
            and jax.default_backend() == "tpu"):
        return depthwise_conv3d(x, w)
    return _dw_lax(x, w, stride)


# ---------------------------------------------------------------------------
# v2: T-blocked manual-DMA kernel with in-kernel zero padding and optional
# fused BN(inference affine)+ReLU. Removes v1's XLA-side pad (a full extra
# HBM round trip) and the 3x per-t halo overfetch (halo cost 2/T_BLK).
# ---------------------------------------------------------------------------

def _dw_pallas_v2(x: jnp.ndarray, w: jnp.ndarray,
                  scale: jnp.ndarray | None = None,
                  bias: jnp.ndarray | None = None,
                  relu: bool = False, t_blk: int = 4) -> jnp.ndarray:
    """Depthwise 3x3x3 stride-1 SAME; optionally fused y = relu(y*scale+bias).

    x (B,T,H,W,C); w (3,3,3,C); scale/bias (C,) inference-affine (folded BN).
    Requires T % t_blk == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, wd, c = x.shape
    assert t % t_blk == 0, (t, t_blk)
    lane = wd * c
    xf = x.reshape(b, t, h, lane)            # layout-free view

    w_tiled = jnp.tile(w.astype(jnp.float32).reshape(3, 3, 3, 1, c),
                       (1, 1, 1, wd, 1)).reshape(27, lane)
    fuse = scale is not None
    if fuse:
        s_tiled = jnp.tile(scale.astype(jnp.float32), wd).reshape(1, lane)
        b_tiled = jnp.tile(bias.astype(jnp.float32), wd).reshape(1, lane)
    else:
        s_tiled = jnp.ones((1, lane), jnp.float32)
        b_tiled = jnp.zeros((1, lane), jnp.float32)
    out_dtype = x.dtype
    n_tb = t // t_blk

    def kernel(x_hbm, w_ref, s_ref, b_ref, o_ref, xs, sems):
        bi = pl.program_id(0)
        tb = pl.program_id(1)
        t0 = tb * t_blk

        xs[...] = jnp.zeros_like(xs)
        # DMA offsets must be tile-aligned (sublane x8, lane x128): the
        # interior starts at H-offset 8 and lane-offset 128; taps read at
        # arbitrary offsets (vector shifts), which is unrestricted.
        main = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(t0, t_blk), :, :],
            xs.at[pl.ds(1, t_blk), 8:8 + h, 128:128 + lane],
            sems.at[0])
        main.start()

        @pl.when(tb > 0)
        def _():
            prev = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(t0 - 1, 1), :, :],
                xs.at[pl.ds(0, 1), 8:8 + h, 128:128 + lane],
                sems.at[1])
            prev.start()
            prev.wait()

        @pl.when(tb < n_tb - 1)
        def _():
            nxt = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(t0 + t_blk, 1), :, :],
                xs.at[pl.ds(t_blk + 1, 1), 8:8 + h, 128:128 + lane],
                sems.at[2])
            nxt.start()
            nxt.wait()

        main.wait()

        acc = jnp.zeros((t_blk, h, lane), jnp.float32)
        for dt in range(3):
            for dh in range(3):
                for dwi in range(3):
                    sl = xs[dt:dt + t_blk, 7 + dh:7 + dh + h,
                            128 + (dwi - 1) * c:128 + (dwi - 1) * c + lane]
                    acc = acc + sl.astype(jnp.float32) * \
                        w_ref[dt * 9 + dh * 3 + dwi, :]
        out = acc * s_ref[0, :] + b_ref[0, :]
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[0] = out.astype(out_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((27, lane), lambda bi, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda bi, tb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda bi, tb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk, h, lane),
                               lambda bi, tb: (bi, tb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, lane), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2, h + 16, lane + 256), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(xf, w_tiled, s_tiled, b_tiled)
    return out.reshape(b, t, h, wd, c)
