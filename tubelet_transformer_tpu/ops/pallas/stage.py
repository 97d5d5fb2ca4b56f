"""Pallas TPU kernel: a pipelined CHAIN of stride-1 ir-bottleneck blocks.

K consecutive identity blocks of a CSN stage (reference
ir_CSN_152.py:151-170 — every block after the first in a stage is stride-1
with no downsample) run as ONE kernel with one HBM read and one HBM write
of the frame stream; every intermediate activation lives in VMEM rings.

STATUS: tested groundwork, default OFF — measured SLOWER than XLA on the
target (v5e): 3.6 ms vs 2.9 ms standalone for layer2's 7-block identity
tail at bs=4.  The decisive measurement (2026-08, see ROADMAP): XLA lowers
depthwise convolutions through a native TPU convolution emitter (the
compiled HLO keeps a `%convolution ... feature_group_count=128` op with a
specialized layout) that runs the 27-tap depthwise at ~0.9 us/block-frame
— ~7x faster than the best pure-VPU tap FMAs available from inside Pallas
(measured floor 6.5 us/block-frame with zero shifts/masks).  Since the
depthwise is the chain's serial backbone, no amount of DMA pipelining or
MXU overlap can close a 7x VPU-side gap.  Kept because the architecture
(skewed multi-block VMEM rings, one HBM read/write per stage) is the right
shape if Pallas ever exposes the native conv path, and as documentation of
why mid-network Pallas does not pay on this backend.

Why a chain and not per-block kernels: any pallas call sandwiched between
XLA convs pays a ~0.5-1.3 ms relayout of the 33 MB activation at each
boundary (XLA assigns conv layouts like {4,0,3,2,1:T(2,128)}; pallas
speaks the default layout).  Chains keep all interior boundaries
pallas<->pallas (no relayout) and amortize the two outer ones over the
whole stage.

Schedule: TWO-step software skew per block, so within a grid step every
block's work is data-independent and Mosaic can overlap the VPU depthwise
taps of one block with the MXU 1x1 matmuls of the others:

  step t, phase A (forward):  block k computes mid_k(tau),  tau = t - 2k
  step t, phase B (reverse):  block k computes y_k(tau-1)

Phase B runs in reverse block order so the 2-slot y rings are read (next
block's residual, 2 steps stale) before being overwritten.  The depthwise
3x3x3 runs on the VPU as 9 taps over the 3-slot mid ring: a W-shift is a
+-1 sublane of the flattened (H*W, C) tile with wrap rows pre-masked, an
H-shift +-W sublanes, T-taps select ring slots; bf16 products accumulate
in f32.  Input/output frames move by explicit double-buffered DMA
(BlockSpec windows would double the VMEM cost).

Used for layer2-scale stages (C_mid >= 128 so lanes are full).  Training
and CPU use the XLA composite (also the custom_vjp backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tubelet_transformer_tpu.ops.pallas.bottleneck import bottleneck_xla

_INTERPRET = {"on": False}
# microbench toggles (wrong numerics when on; never set outside benches)
_DEBUG = {"skip_dw": False, "skip_dots": False}


def chain_xla(x, stacked):
    """XLA reference composite: K chained identity bottlenecks."""
    k = stacked[0].shape[0]
    for i in range(k):
        x = bottleneck_xla(x, *[s[i] for s in stacked])
    return x


def _chain_pallas(x, w1, wd, w4, a1, b1, a3, b3, a4, b4, h, w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, hw, ci = x.shape
    k_n, _, cm = w1.shape
    assert hw == h * w and w4.shape == (k_n, cm, ci)
    assert t >= 2
    cdt = jnp.bfloat16
    pad = w + 1
    steps = t + 2 * k_n

    pix = jnp.arange(hw) % w
    mask_l = (pix != 0).astype(cdt).reshape(hw, 1)
    mask_r = (pix != w - 1).astype(cdt).reshape(hw, 1)

    wdf = wd.astype(cdt).reshape(k_n, 9, 3, cm)   # (k, dt*3+dh, dwi, cm)

    def kernel(x_hbm, w1r, wdr, w4r, a1r, b1r, a3r, b3r, a4r, b4r,
               ml, mr, o_hbm, xin, obuf, mid, ybuf, isem, osem):
        bq = pl.program_id(0)
        tq = pl.program_id(1)

        def in_dma(f):
            return pltpu.make_async_copy(
                x_hbm.at[bq, f], xin.at[f % 3], isem.at[f % 3])

        def out_dma(f):
            return pltpu.make_async_copy(
                obuf.at[f % 2], o_hbm.at[bq, f], osem.at[f % 2])

        # ---- input streaming: frame tq waited here, tq+1 prefetched
        @pl.when(tq == 0)
        def _():
            mid[:] = jnp.zeros_like(mid)
            in_dma(0).start()
            in_dma(0).wait()

        @pl.when((tq + 1 < t) & (tq + 1 < steps))
        def _():
            in_dma(tq + 1).start()

        @pl.when((tq > 0) & (tq < t))
        def _():
            in_dma(tq).wait()

        def conv_mid(kk, src):
            if _DEBUG["skip_dots"]:
                return src[:, :cm].astype(cdt)
            mm = lax.dot_general(
                src, w1r[kk], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(mm * a1r[kk] + b1r[kk], 0.0).astype(cdt)

        def depthwise(kk, tau_out):
            """f32 accumulator of the 3x3x3 depthwise over mid[kk]'s ring."""
            if _DEBUG["skip_dw"]:
                return mid[kk, 0].astype(jnp.float32)
            zpad = jnp.zeros((pad, cm), cdt)
            acc = jnp.zeros((hw, cm), jnp.float32)
            for dt_ in range(3):
                slot = (tau_out + dt_ + 2) % 3
                mv = mid[kk, slot]
                mc = jnp.concatenate([zpad, mv, zpad], axis=0)
                mlft = jnp.concatenate([zpad, mv * mr[:], zpad], axis=0)
                mrgt = jnp.concatenate([zpad, mv * ml[:], zpad], axis=0)
                for dh in range(3):
                    base = pad + (dh - 1) * w
                    kv = wdr[kk, dt_ * 3 + dh]
                    s = (mlft[base - 1:base - 1 + hw] * kv[0]
                         + mc[base:base + hw] * kv[1]
                         + mrgt[base + 1:base + 1 + hw] * kv[2])
                    acc = acc + s.astype(jnp.float32)
            return acc

        # ---- phase A: all blocks' conv1 (independent MXU work)
        for kk in range(k_n):
            tau = tq - 2 * kk

            @pl.when((tau >= 0) & (tau < t))
            def _(kk=kk, tau=tau):
                src = (xin[tau % 3] if kk == 0
                       else ybuf[kk - 1, tau % 2]).astype(cdt)
                mid[kk, tau % 3] = conv_mid(kk, src)

            @pl.when(tau == t)
            def _(kk=kk, tau=tau):
                mid[kk, tau % 3] = jnp.zeros((hw, cm), cdt)

        # ---- phase B (reverse): depthwise + conv4 + residual + ReLU
        for kk in reversed(range(k_n)):
            tau_out = tq - 2 * kk - 1

            @pl.when((tau_out >= 0) & (tau_out < t))
            def _(kk=kk, tau_out=tau_out):
                acc = depthwise(kk, tau_out)
                mdw = jnp.maximum(acc * a3r[kk] + b3r[kk], 0.0).astype(cdt)
                if _DEBUG["skip_dots"]:
                    out = jnp.concatenate(
                        [mdw.astype(jnp.float32)] * (ci // cm), axis=1)
                else:
                    out = lax.dot_general(
                        mdw, w4r[kk], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                res = (xin[tau_out % 3] if kk == 0
                       else ybuf[kk - 1, tau_out % 2]).astype(jnp.float32)
                out = jnp.maximum(out * a4r[kk] + b4r[kk] + res, 0.0)
                if kk == k_n - 1:
                    @pl.when(tau_out >= 2)
                    def _():
                        out_dma(tau_out - 2).wait()
                    obuf[tau_out % 2] = out.astype(x.dtype)
                    out_dma(tau_out).start()
                else:
                    ybuf[kk, tau_out % 2] = out.astype(cdt)

        # drain the last two output DMAs
        @pl.when(tq == steps - 1)
        def _():
            out_dma(t - 2).wait()
            out_dma(t - 1).wait()

    def const(shape):
        return pl.BlockSpec(shape, lambda bq, tq: (0,) * len(shape))

    def aff(v, c):
        return v.astype(jnp.float32).reshape(k_n, 1, c)

    return pl.pallas_call(
        kernel,
        interpret=_INTERPRET["on"],
        grid=(b, steps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  const((k_n, ci, cm)), const((k_n, 9, 3, cm)),
                  const((k_n, cm, ci)),
                  const((k_n, 1, cm)), const((k_n, 1, cm)),
                  const((k_n, 1, cm)), const((k_n, 1, cm)),
                  const((k_n, 1, ci)), const((k_n, 1, ci)),
                  const((hw, 1)), const((hw, 1))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, t, hw, ci), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, hw, ci), x.dtype),            # input frame ring
            pltpu.VMEM((2, hw, ci), x.dtype),            # output frame ring
            pltpu.VMEM((k_n, 3, hw, cm), cdt),           # mid rings
            pltpu.VMEM((max(k_n - 1, 1), 2, hw, ci), cdt),  # y rings
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, w1.astype(cdt), wdf, w4.astype(cdt),
      aff(a1, cm), aff(b1, cm), aff(a3, cm), aff(b3, cm),
      aff(a4, ci), aff(b4, ci), mask_l, mask_r)


@jax.custom_vjp
def bottleneck_chain(x, w1, wd, w4, a1, b1, a3, b3, a4, b4):
    """K chained stride-1 identity ir-bottlenecks, one kernel.

    x (B,T,H,W,Ci) channels-last; stacked weights with leading K axis:
    w1 (K,Ci,Cm); wd (K,3,3,3,Cm); w4 (K,Cm,Ci); a*/b* (K,C*) folded
    inference-BN affines (post-conv1 / post-depthwise / post-conv4).
    """
    b, t, h, w, ci = x.shape
    y = _chain_pallas(x.reshape(b, t, h * w, ci),
                      w1, wd, w4, a1, b1, a3, b3, a4, b4, h, w)
    return y.reshape(b, t, h, w, ci)


def _fwd(*args):
    return bottleneck_chain(*args), args


def _bwd(res, g):
    x, *stacked = res
    _, vjp = jax.vjp(lambda xx, *s: chain_xla(xx, s), x, *stacked)
    return vjp(g)


bottleneck_chain.defvjp(_fwd, _bwd)


def chain_supported(x_shape, cm: int) -> bool:
    """Full-lane C_mid, frames that fit the VMEM rings, T >= 2."""
    _, t, h, w, ci = x_shape
    hw = h * w
    return (cm >= 128 and t >= 2 and hw >= 256
            and hw * ci * 2 <= 2 * 1024 * 1024
            and jax.default_backend() == "tpu")


def max_chain(hw: int, ci: int, cm: int) -> int:
    """Largest K whose VMEM footprint fits ~14 MB: input ring 3 + output
    ring 2 frames of (hw, ci), per block a 3-slot mid ring (hw, cm) and
    (except the last block) a 2-slot y ring (hw, ci), plus weight stacks."""
    budget = 14 * 1024 * 1024
    frame = hw * ci * 2
    fixed = 5 * frame
    per = 3 * hw * cm * 2 + 2 * frame + (2 * ci * cm + 27 * cm) * 2
    return max(1, (budget - fixed + 2 * frame) // per)
