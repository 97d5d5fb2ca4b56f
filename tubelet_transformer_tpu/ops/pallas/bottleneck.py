"""Pallas TPU kernel: fused irCSN bottleneck block (inference).

One stride-1 ir-bottleneck — conv1x1 -> BN+ReLU -> depthwise 3x3x3 ->
BN+ReLU -> conv1x1 -> BN -> +identity -> ReLU (reference
ir_CSN_152.py:33-90) — in a single pass over the input.  XLA runs the
same chain through ~6 HBM round trips of the full activation tensor
(layer2 of CSN-152: 4.9 ms at bs=4, ~8x its bandwidth floor); here each
frame is read once for conv1 and once for the residual, everything
intermediate lives in VMEM, and the output is written once.

Layout: frames as (H*W, C) tiles — pixels on sublanes, channels on
lanes (full lanes for C >= 128).  Per grid step (b, t):

  * the three ``mid`` frames (post-conv1 BN-ReLU, C_mid channels) live in
    three persistent VMEM scratch buffers rotated by copy each step, so
    conv1 runs ONCE per frame on the MXU (grid scratch persists across
    the sequential (b, t) steps; t==0 bootstraps and resets per batch),
  * the depthwise 3x3x3 runs on the VPU as 9 groups of 3 W-taps: a
    W-shift is +-1 sublane of the flattened (H*W, C) tile, an H-shift
    +-W sublanes, T-taps select among the three mid buffers.  Each group
    multiplies pre-masked mid variants (wrap-around rows zeroed once per
    frame, not per tap) in bf16 and accumulates the group sum in f32 —
    bf16 products match MXU-matmul precision; the f32 accumulator keeps
    the 9-term reduction exact,
  * conv4 + BN + residual-add + ReLU run on the f32 accumulator before
    one bf16 write.

Dispatched for stride-1 identity blocks with C_mid >= 128 and H*W >= 1024
(layer2; layers 3-4 have tiny frames where XLA's batched matmuls win).
Training and CPU use the XLA composite (also the custom_vjp backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INTERPRET = {"on": False}


def bottleneck_xla(x, w1, wd, w4, a1, b1, a3, b3, a4, b4):
    """XLA reference composite. x (B,T,H,W,Ci); wd (3,3,3,Cm)."""
    cm = w1.shape[1]
    dt = x.dtype
    m = jnp.einsum("bthwc,cd->bthwd", x, w1.astype(dt))
    m = jnp.maximum(m * a1.astype(dt) + b1.astype(dt), 0)
    m = lax.conv_general_dilated(
        m, wd.astype(dt).reshape(3, 3, 3, 1, cm), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=cm)
    m = jnp.maximum(m * a3.astype(dt) + b3.astype(dt), 0)
    y = jnp.einsum("bthwd,de->bthwe", m, w4.astype(dt))
    y = y * a4.astype(dt) + b4.astype(dt)
    return jnp.maximum(y + x, 0)


def _bottleneck_pallas(x, w1, wd, w4, a1, b1, a3, b3, a4, b4, h, w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, hw, ci = x.shape
    cm = w1.shape[1]
    co = w4.shape[1]
    assert hw == h * w and ci == co
    cdt = jnp.bfloat16
    pad = w + 1   # value slices have no alignment constraint

    # Source-row masks cancelling the W wrap-around of the flattened +-1
    # shifts, applied pre-shift: the dwi=+1 tap legitimately reads source
    # columns 1..W-1 only (w==0 rows are reached solely by wraps from the
    # previous row's w==W-1 output), and symmetrically for dwi=-1.
    pix = jnp.arange(hw) % w
    mask_l = (pix != 0).astype(cdt).reshape(hw, 1)       # pre-mask for dwi=+1
    mask_r = (pix != w - 1).astype(cdt).reshape(hw, 1)   # pre-mask for dwi=-1

    # W-tap groups: wd (3,3,3,Cm) -> (9, 3, Cm) over (dt*3+dh, dwi)
    wdf = wd.astype(cdt).reshape(9, 3, cm)

    def kernel(xc, xn, w1r, wdr, w4r, a1r, b1r, a3r, b3r, a4r, b4r,
               ml, mr, o_ref, m0, m1, m2):
        tq = pl.program_id(1)
        ntq = pl.num_programs(1)

        def mid(ref):
            mm = lax.dot_general(
                ref[0, 0], w1r[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(mm * a1r[:] + b1r[:], 0.0).astype(cdt)

        # rotate the persistent mid ring; conv1 runs once per frame
        @pl.when(tq == 0)
        def _():
            m0[:] = jnp.zeros((hw, cm), cdt)
            m1[:] = mid(xc)

        @pl.when(tq > 0)
        def _():
            m0[:] = m1[:]
            m1[:] = m2[:]

        m2[:] = jnp.where(tq < ntq - 1, mid(xn), jnp.zeros((hw, cm), cdt))

        zpad = jnp.zeros((pad, cm), cdt)
        acc = jnp.zeros((hw, cm), jnp.float32)
        for dt_, mref in enumerate((m0, m1, m2)):
            mv = mref[:]
            mc = jnp.concatenate([zpad, mv, zpad], axis=0)
            mlft = jnp.concatenate([zpad, mv * mr[:], zpad], axis=0)
            mrgt = jnp.concatenate([zpad, mv * ml[:], zpad], axis=0)
            for dh in range(3):
                base = pad + (dh - 1) * w
                kv = wdr[dt_ * 3 + dh]
                s = (mlft[base - 1:base - 1 + hw] * kv[0]
                     + mc[base:base + hw] * kv[1]
                     + mrgt[base + 1:base + 1 + hw] * kv[2])
                acc = acc + s.astype(jnp.float32)

        mdw = jnp.maximum(acc * a3r[:] + b3r[:], 0.0).astype(cdt)
        out = lax.dot_general(
            mdw, w4r[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out * a4r[:] + b4r[:] + xc[0, 0].astype(jnp.float32)
        o_ref[0, 0] = jnp.maximum(out, 0.0).astype(x.dtype)

    blk = (1, 1, hw, ci)

    def spec(dt_):
        return pl.BlockSpec(
            blk, lambda bq, tq, dt_=dt_: (bq, jnp.clip(tq + dt_, 0, t - 1),
                                          0, 0))

    def const(shape):
        return pl.BlockSpec(shape, lambda bq, tq: (0,) * len(shape))

    return pl.pallas_call(
        kernel,
        interpret=_INTERPRET["on"],
        grid=(b, t),
        in_specs=[spec(0), spec(1),
                  const((ci, cm)), const((9, 3, cm)), const((cm, co)),
                  const((1, cm)), const((1, cm)), const((1, cm)),
                  const((1, cm)), const((1, co)), const((1, co)),
                  const((hw, 1)), const((hw, 1))],
        out_specs=pl.BlockSpec(blk, lambda bq, tq: (bq, tq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, hw, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hw, cm), cdt),
            pltpu.VMEM((hw, cm), cdt),
            pltpu.VMEM((hw, cm), cdt),
        ],
    )(x, x, w1.astype(cdt), wdf, w4.astype(cdt),
      a1.astype(jnp.float32).reshape(1, cm), b1.astype(jnp.float32).reshape(1, cm),
      a3.astype(jnp.float32).reshape(1, cm), b3.astype(jnp.float32).reshape(1, cm),
      a4.astype(jnp.float32).reshape(1, co), b4.astype(jnp.float32).reshape(1, co),
      mask_l, mask_r)


@jax.custom_vjp
def bottleneck_fused(x, w1, wd, w4, a1, b1, a3, b3, a4, b4):
    """Fused stride-1 identity ir-bottleneck. x (B,T,H,W,Ci) channels-last.

    w1 (Ci,Cm); wd (3,3,3,Cm); w4 (Cm,Co=Ci); a*/b* folded inference-BN
    affines applied after conv1 / depthwise / conv4 respectively.
    """
    b, t, h, w, ci = x.shape
    y = _bottleneck_pallas(x.reshape(b, t, h * w, ci),
                           w1, wd, w4, a1, b1, a3, b3, a4, b4, h, w)
    return y.reshape(b, t, h, w, ci)


def _fwd(*args):
    return bottleneck_fused(*args), args


def _bwd(res, g):
    _, vjp = jax.vjp(bottleneck_xla, *res)
    return vjp(g)


bottleneck_fused.defvjp(_fwd, _bwd)


def bottleneck_supported(x_shape, cm, stride, tstride, has_downsample) -> bool:
    """Stride-1 identity blocks, full-lane C_mid, big-enough frames
    (layers with tiny H*W run faster through XLA's batched matmuls)."""
    _, _, h, w, _ = x_shape
    return (stride == 1 and tstride == 1 and not has_downsample
            and cm >= 128 and h * w >= 1024
            and jax.default_backend() == "tpu")
