"""Pallas TPU kernels: the irCSN stem conv (3x7x7, stride (1,2,2), C_in=3).

The stem is the hottest single op in the model (6.6 ms of the 27.5 ms bs=4
CSN-152 forward on v5e): with C_in=3 the MXU contraction dimension is
starved and XLA runs it at ~18 TFLOP/s.  Every XLA-level rewrite loses
(measured, benchmarks/bench_stem.py): temporal decomposition to 2D convs
16.0, space-to-depth 16.1, im2col-via-patches 2.5 TFLOP/s — and any
XLA-side relayout is off the table too (a materialized s2d transpose of
the 50 MB input costs ~2 ms on its own, ~25 GB/s).  So the whole path is
two Pallas kernels:

K1  ``_deinterleave``: lane permutation of each padded frame from raw
    interleaved ``(i_w, c)`` lanes to six 256-lane blocks
    ``cidx = rw*3 + c`` of W-parity-split columns, done as a one-hot
    bf16 matmul on the MXU (exact: each output sums exactly one input).
    This is the only layout change the stem needs — the H-side
    space-to-depth is absorbed by K2's sublane indexing.

K2  ``_stem_matmul``: the conv itself as one dense MXU matmul per
    (2-frame, 8-row) tile.  The stride-2 7x7 kernel is algebraically a
    stride-1 4x4 kernel over the parity-split planes (tap ``k = 2j + r``
    lands on plane ``r`` at offset ``j``; taps with ``2j+r > 6`` are
    zero).  The patch matrix P (K=768, N=HB*W') is assembled from
    contiguous (8, W') sublane-block copies — every element copied once,
    all offsets 8-aligned — and double-buffered so P-build overlaps the
    matmul.  The weight matrix A (128, 768) stacks the taps of TWO
    consecutive output frames (a single frame has only 64 output
    channels), so all 128 MXU rows are used; K spans the union of their
    4 input frames with zeros where a frame is outside a row's support.
    Folded BN (scale/bias) + ReLU hit the f32 accumulator and the bf16
    result is DMA'd straight to HBM (double-buffered).

Output layout is channels-mid, (B, T, 64, H', W'): the matmul naturally
produces (o, h'w') tiles, and the following 1x3x3 max-pool runs fine in
this layout; the (4x smaller) pooled tensor is transposed back to
channels-last by the caller.

Reference: the stem is models/backbones/ir_CSN_152.py:97-104 (conv1 + bn1
+ relu + maxpool).  Exactness: the parity-split rewrite is algebraic (no
approximation); parity is tested against the XLA composite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

HB = 8    # output rows per matmul tile
_DEBUG = {"skip_build": False, "skip_dot": False, "one_jw": False,
          "interpret": False}  # interpret=True: CPU-debuggable kernels
LB = 256  # lanes per cidx block in the deinterleaved layout


def _stem_xla(x, w, scale, bias, relu=True, pool=False):
    """XLA reference composite: conv + affine (+ ReLU) (+ 1x3x3 maxpool).

    Returns channels-mid (B,T,64,H',W'), or channels-last pooled
    (B,T,H'/2,W'/2,64) when ``pool``."""
    y = lax.conv_general_dilated(
        x, w, (1, 2, 2), [(1, 1), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    if pool:
        return lax.reduce_window(
            y, -jnp.inf, lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    return y.transpose(0, 1, 4, 2, 3)


def _weight_matrix(w):
    """w (3,7,7,3,64) -> A (128, 768).

    A[f*64+o, q*192 + jw*48 + (rw*3+c)*8 + jh*2+rh]
        = w[q-f, 2*jh+rh, 2*jw+rw, c, o]
    (zero where kt/kh/kw fall outside the kernel); f indexes the two
    output frames of a K2 grid step, q the four loaded input frames.
    """
    w_p = jnp.pad(w, [(0, 1), (0, 1), (0, 1), (0, 0), (0, 0)])  # (4,8,8,3,64)
    cols = []
    for f in range(2):
        idx = jnp.arange(4) - f                       # kt per loaded frame
        sub = w_p[jnp.clip(idx, 0, 3)] * (idx >= 0)[:, None, None, None, None]
        sub = sub.reshape(4, 4, 2, 4, 2, 3, 64)       # (q, jh,rh, jw,rw, c, o)
        sub = sub.transpose(0, 3, 4, 5, 1, 2, 6)      # (q, jw, rw, c, jh, rh, o)
        cols.append(sub.reshape(768, 64))
    return jnp.concatenate(cols, axis=1).T            # (128, 768)


def _weight_matrix_v3(w):
    """(4, 128, 192) jw-major split of ``_weight_matrix``: A3[jw][:, q*48+r]
    = A[:, q*192 + jw*48 + r].  The pooled kernel runs one dot per jw on a
    lane-shifted patch view instead of materializing the shift in P."""
    a = _weight_matrix(w)                             # (128, 768)
    return a.reshape(128, 4, 4, 48).transpose(2, 0, 1, 3).reshape(4, 128, 192)


def _deinterleave(xr, w2):
    """K1: (B, T, Ht, (2*w2)*3) raw lanes -> (B, T, Ht, 6*LB) parity-split.

    out[..., (rw*3+c)*LB + v] = xr[..., (2v+rw)*3 + c]  for v < w2,
    as a one-hot matmul (exact)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, ht, wl = xr.shape
    # one-hot S: S[6v+cidx, cidx*LB+v] = 1
    v = jnp.arange(w2)
    rows = (6 * v[None, :] + jnp.arange(6)[:, None]).ravel()   # (6*w2,)
    colz = (jnp.arange(6)[:, None] * LB + v[None, :]).ravel()
    s_mat = jnp.zeros((wl, 6 * LB), jnp.bfloat16).at[rows, colz].set(1)

    def kernel(x_ref, s_ref, o_ref):
        o_ref[0, 0] = lax.dot_general(
            x_ref[0, 0], s_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        interpret=_DEBUG["interpret"],
        grid=(b, t),
        in_specs=[pl.BlockSpec((1, 1, ht, wl), lambda bq, tq: (bq, tq, 0, 0)),
                  pl.BlockSpec((wl, 6 * LB), lambda bq, tq: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, ht, 6 * LB),
                               lambda bq, tq: (bq, tq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, ht, 6 * LB), xr.dtype),
    )(xr, s_mat)


def _stem_matmul(xd, a_mat, bi, relu, hp, wp, out_dtype, pool=False):
    """K2: deinterleaved frames (B, T, Ht, 6*LB) -> conv output.

    ``pool=False``: channels-mid (B, T, 64, H'*W').
    ``pool=True``: the 1x3x3/(2,2) max-pool and the transpose to
    channels-last are fused in-kernel, returning (B, T, (H'/2)*(W'/2), 64)
    and never materializing the 4x-larger pre-pool tensor (XLA's
    reduce_window on that tensor alone costs ~4.7 ms at bs=4 — measured,
    ~30 GB/s).  The main dot is flipped to emit (npix, 128) tiles so
    pixels sit on sublanes: H-pool and the W-pool +-1 shifts are then
    plain sublane-block maxes, and the stride-2 W downsample rides a
    one-hot block-diagonal matmul E (npo, 4*W') that simultaneously
    selects even columns and leaves the tile in the (pixels, channels)
    output orientation — no on-chip transpose at all.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, ht, _ = xd.shape
    nh = hp // HB
    wb = 128                         # padded per-row lane block; rows with
    npix = HB * wb                   # W' < 128 carry zero ghost lanes (K1's
    npo = (HB // 2) * (wp // 2)      # one-hot matrix zeroes them) that the
    cdt = jnp.bfloat16               # E-selection simply never reads
    neg = jnp.finfo(jnp.float32).min

    assert nh % 2 == 0, (hp, HB)
    assert wp % 4 == 0 and wp <= wb, wp
    assert pool or wp == wb, "channels-mid output requires W' == 128"

    # E selects the stride-2 W-downsample AND regroups pooled pixels into
    # pairs: rows [e*npo/2 + jj*(wp//4) + v2] pick m3c row
    # [jj*wp + 2*(2*v2+e)], i.e. the even (e=0) / odd (e=1) pooled columns.
    # A tile's pooled result P2 then splits into full 128-lane blocks
    # (pixel-pair, (parity, channel)) per frame — DMA-legal (the compiler
    # crashes on any sub-128-lane DMA) and a pure reshape from
    # channels-last in HBM.
    npo2 = npo // 2
    es = jnp.repeat(jnp.arange(2), npo2)
    jjs = jnp.tile(jnp.repeat(jnp.arange(HB // 2), wp // 4), 2)
    v2s = jnp.tile(jnp.arange(wp // 4), 2 * (HB // 2))
    e_mat = jnp.zeros((npo, (HB // 2) * wb), cdt).at[
        es * npo2 + jjs * (wp // 4) + v2s,
        jjs * wb + 2 * (2 * v2s + es)].set(1)

    def kernel(x0, x1, x2, x3, a_ref, b_ref, e_ref, o_hbm,
               p0, p1, c0, c1, carry, sems):
        bq = pl.program_id(0)
        tp = pl.program_id(1)
        ntp = pl.num_programs(1)
        refs = (x0, x1, x2, x3)
        pbufs, cbufs = (p0, p1), (c0, c1)

        def out_dma(slot, f, i):
            if pool:
                return pltpu.make_async_copy(
                    cbufs[slot].at[f],
                    o_hbm.at[bq, 2 * tp + f, pl.ds(i * npo2, npo2), :],
                    sems.at[slot, f])
            return pltpu.make_async_copy(
                cbufs[slot].at[pl.ds(f * 64, 64), :],
                o_hbm.at[bq, 2 * tp + f, :, pl.ds(i * npix, npix)],
                sems.at[slot, f])

        def build(i, pbuf):
            if _DEBUG["skip_build"]:
                return
            if pool:
                # v3: jw lives in the dots, not in P.  P (192, HB*256):
                # P[q*48+cidx*8+(jh*2+rh), hh*256 + v]
                #   = xd[frame q, 2*(h0+hh) + jh*2+rh, cidx*LB + v], v<136;
                # the per-jw patch view is the lane slice [jw, jw+wb) of
                # each 256-aligned hh block.  4x fewer build copies than
                # materializing all four shifts.
                for q in range(4):
                    for cidx in range(6):
                        base = q * 48 + cidx * 8
                        for hq in range(HB // 4):
                            val = refs[q][
                                0, 0,
                                pl.ds(2 * HB * i + 8 * hq, 16),
                                pl.ds(cidx * LB, 136)]
                            for hl in range(4):
                                hh = 4 * hq + hl
                                pbuf[pl.ds(base, 8),
                                     pl.ds(hh * 256, 136)] = val[
                                         2 * hl:2 * hl + 8]
                # clip-boundary frames contribute zero
                @pl.when(tp == 0)
                def _():
                    pbuf[0:48, :] = jnp.zeros((48, HB * 256), cdt)

                @pl.when(tp == ntp - 1)
                def _():
                    pbuf[144:192, :] = jnp.zeros((48, HB * 256), cdt)
                return
            # P[q*192+jw*48+cidx*8+(jh*2+rh), hh*W'+w']
            #   = xd[frame q, 2*(h0+hh) + jh*2+rh, cidx*LB + w'+jw]
            for q in range(4):
                for jw in range(4):
                    for cidx in range(6):
                        base = q * 192 + jw * 48 + cidx * 8
                        for hq in range(HB // 4):
                            val = refs[q][
                                0, 0,
                                pl.ds(2 * HB * i + 8 * hq, 16),
                                pl.ds(cidx * LB + jw, wb)]
                            for hl in range(4):
                                hh = 4 * hq + hl
                                pbuf[pl.ds(base, 8),
                                     pl.ds(hh * wb, wb)] = val[
                                         2 * hl:2 * hl + 8]
            # clip-boundary frames (clamped index maps) contribute zero
            @pl.when(tp == 0)
            def _():
                pbuf[0:192, :] = jnp.zeros((192, npix), cdt)

            @pl.when(tp == ntp - 1)
            def _():
                pbuf[576:768, :] = jnp.zeros((192, npix), cdt)

        def matmul_tile(i, slot):
            """dot on pbufs[slot] -> cbufs[slot] -> async DMA out."""
            @pl.when(i >= 2)
            def _():
                for f in range(2):
                    out_dma(slot, f, i - 2).wait()

            # scale is pre-folded into A rows; cast the f32 accumulator
            # immediately so the bias+relu tail runs at 2x VPU rate.
            if pool:
                # flipped orientation: (npix, 128) — pixels on sublanes.
                # One dot per jw tap-shift on the lane-shifted patch view.
                if _DEBUG["skip_dot"]:
                    accf = jnp.zeros((npix, 128), jnp.float32)
                else:
                    accf = jnp.zeros((npix, 128), jnp.float32)
                    pb = pbufs[slot]
                    for jw in ((0,) if _DEBUG["one_jw"] else range(4)):
                        rhs = jnp.concatenate(
                            [pb[:, hh * 256 + jw: hh * 256 + jw + wb]
                             for hh in range(HB)], axis=1)       # (192, npix)
                        accf = accf + lax.dot_general(
                            rhs, a_ref[jw], (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                acc = accf.astype(cdt)
                out = acc + b_ref[:]
                if relu:
                    out = jnp.maximum(out, jnp.zeros((), cdt))
                negrow = jnp.full((wb, 128), neg, cdt)
                hm = []
                for jj in range(HB // 2):
                    lo = 2 * jj - 1
                    prev = (jnp.where(i > 0, carry[:], negrow) if lo < 0
                            else out[lo * wb:(lo + 1) * wb])
                    mid = out[(lo + 1) * wb:(lo + 2) * wb]
                    hi = out[(lo + 2) * wb:(lo + 3) * wb]
                    hm.append(jnp.maximum(jnp.maximum(prev, mid), hi))
                carry[:] = out[(HB - 1) * wb:HB * wb]
                negone = jnp.full((1, 128), neg, cdt)
                m3 = []
                for part in hm:
                    up = jnp.concatenate([negone, part[:-1]], axis=0)
                    dn = jnp.concatenate([part[1:], negone], axis=0)
                    m3.append(jnp.maximum(jnp.maximum(up, part), dn))
                m3c = jnp.concatenate(m3, axis=0)        # (4*wp, 128)
                # E (npo, 4*wp) one-hot: selects even rows per block and
                # leaves (pixels, channels) orientation
                p2 = lax.dot_general(
                    e_ref[:], m3c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_dtype)
                # rows [0:npo2] = even pooled columns, [npo2:npo] = odd;
                # lanes (f, o).  Regroup per frame into (pixel-pair,
                # (parity, o)) full-128-lane blocks.
                for f in range(2):
                    cbufs[slot][f] = jnp.concatenate(
                        [p2[0:npo2, f * 64:(f + 1) * 64],
                         p2[npo2:npo, f * 64:(f + 1) * 64]], axis=1)
            else:
                if _DEBUG["skip_dot"]:
                    acc = pbufs[slot][0:128, :].astype(cdt)
                else:
                    acc = lax.dot_general(
                        a_ref[:], pbufs[slot][:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(cdt)
                out = acc + b_ref[:]
                if relu:
                    out = jnp.maximum(out, jnp.zeros((), cdt))
                cbufs[slot][:] = out.astype(out_dtype)
            for f in range(2):
                out_dma(slot, f, i).start()

        build(0, p0)

        def pair(i2, _):
            # static even/odd unroll keeps every buffer index static; the
            # build of tile i+1 sits after the dot of tile i so Mosaic can
            # overlap VPU assembly with the MXU.
            i0 = 2 * i2
            matmul_tile(i0, 0)
            build(i0 + 1, p1)
            matmul_tile(i0 + 1, 1)

            @pl.when(i0 + 2 < nh)
            def _():
                build(i0 + 2, p0)
            return 0

        lax.fori_loop(0, nh // 2, pair, 0)

        for i_last in (nh - 2, nh - 1):
            for f in range(2):
                out_dma(i_last % 2, f, i_last).wait()

    frame_block = (1, 1, ht, 6 * LB)

    def frame_spec(q):
        return pl.BlockSpec(
            frame_block,
            lambda bq, tp, q=q: (bq, jnp.clip(2 * tp - 1 + q, 0, t - 1), 0, 0))

    out = pl.pallas_call(
        kernel,
        interpret=_DEBUG["interpret"],
        grid=(b, t // 2),
        in_specs=[frame_spec(0), frame_spec(1), frame_spec(2), frame_spec(3),
                  pl.BlockSpec((4, 128, 192) if pool else (128, 768),
                               lambda bq, tp: (0, 0, 0) if pool else (0, 0)),
                  pl.BlockSpec((1, 128) if pool else (128, 1),
                               lambda bq, tp: (0, 0)),
                  pl.BlockSpec((npo, (HB // 2) * wb),
                               lambda bq, tp: (0, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (b, t, (hp // 2) * (wp // 2) // 2, 128) if pool
            else (b, t, 64, hp * wp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((192, HB * 256) if pool else (768, npix), cdt),
            pltpu.VMEM((192, HB * 256) if pool else (768, npix), cdt),
            pltpu.VMEM((2, npo // 2, 128) if pool else (128, npix),
                       out_dtype),
            pltpu.VMEM((2, npo // 2, 128) if pool else (128, npix),
                       out_dtype),
            pltpu.VMEM((wb, 128), cdt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(xd, xd, xd, xd, a_mat, bi, e_mat)
    if pool:
        # lanes are (w''-parity, channel): a pure reshape recovers
        # channels-last (B, T, H/4, W/4, 64)
        return out.reshape(b, t, hp // 2, wp // 2, 64)
    return out.reshape(b, t, 64, hp, wp)


def _stem_stats_matmul(xd, a_mat, hp, wp):
    """K2-stats: per-row partial (sum, sum-of-squares) of the bare stem
    conv output, accumulated in-kernel — the conv result never leaves the
    f32 accumulator, so the (B, T, 64, H'*W') tensor (537 MB at bs=8) is
    never materialized and never re-read for the reduction.

    Returns f32 (2, 128, 128): ``[0]`` partial sums, ``[1]`` partial
    sums-of-squares; rows are (frame-parity, channel) = f*64+o like the
    non-pool output, lanes are 128-column partials of the H'*W' pixel
    axis. The single output block (constant index map) stays resident in
    VMEM across the whole sequential grid — the standard Pallas revisited-
    block accumulation pattern."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, ht, _ = xd.shape
    nh = hp // HB
    wb = 128
    npix = HB * wb
    cdt = jnp.bfloat16
    assert nh % 2 == 0, (hp, HB)
    assert wp % 4 == 0 and wp <= wb, wp

    def kernel(x0, x1, x2, x3, a_ref, o_ref, p0, p1):
        bq = pl.program_id(0)
        tp = pl.program_id(1)
        ntp = pl.num_programs(1)
        refs = (x0, x1, x2, x3)
        pbufs = (p0, p1)

        @pl.when((bq == 0) & (tp == 0))
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        def build(i, pbuf):
            # same P assembly as the non-pool matmul path
            for q in range(4):
                for jw in range(4):
                    for cidx in range(6):
                        base = q * 192 + jw * 48 + cidx * 8
                        for hq in range(HB // 4):
                            val = refs[q][
                                0, 0,
                                pl.ds(2 * HB * i + 8 * hq, 16),
                                pl.ds(cidx * LB + jw, wb)]
                            for hl in range(4):
                                hh = 4 * hq + hl
                                pbuf[pl.ds(base, 8),
                                     pl.ds(hh * wb, wb)] = val[
                                         2 * hl:2 * hl + 8]

            @pl.when(tp == 0)
            def _():
                pbuf[0:192, :] = jnp.zeros((192, npix), cdt)

            @pl.when(tp == ntp - 1)
            def _():
                pbuf[576:768, :] = jnp.zeros((192, npix), cdt)

        def acc_tile(slot):
            accf = lax.dot_general(
                a_ref[:], pbufs[slot][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (128, npix)
            if wp < wb:
                # W' < 128 rows carry ghost lanes; near the right edge the
                # conv taps of a ghost output still touch real columns, so
                # ghost outputs are nonzero garbage — mask them out of the
                # statistics (the pooled phase-2 E-selection never reads
                # them, same reason it needs no mask).
                lane = lax.broadcasted_iota(jnp.int32, (1, wb), 1)
                mask = jnp.where(lane < wp, 1.0, 0.0).astype(jnp.float32)
            else:
                mask = None
            s = jnp.zeros((128, wb), jnp.float32)
            s2 = jnp.zeros((128, wb), jnp.float32)
            for j in range(npix // wb):
                blk = accf[:, j * wb:(j + 1) * wb]
                if mask is not None:
                    blk = blk * mask
                s = s + blk
                s2 = s2 + blk * blk
            o_ref[0] += s
            o_ref[1] += s2

        build(0, p0)

        def pair(i2, _):
            i0 = 2 * i2
            acc_tile(0)
            build(i0 + 1, p1)
            acc_tile(1)

            @pl.when(i0 + 2 < nh)
            def _():
                build(i0 + 2, p0)
            return 0

        lax.fori_loop(0, nh // 2, pair, 0)

    frame_block = (1, 1, ht, 6 * LB)

    def frame_spec(q):
        return pl.BlockSpec(
            frame_block,
            lambda bq, tp, q=q: (bq, jnp.clip(2 * tp - 1 + q, 0, t - 1), 0, 0))

    return pl.pallas_call(
        kernel,
        interpret=_DEBUG["interpret"],
        grid=(b, t // 2),
        in_specs=[frame_spec(0), frame_spec(1), frame_spec(2), frame_spec(3),
                  pl.BlockSpec((128, 768), lambda bq, tp: (0, 0))],
        out_specs=pl.BlockSpec((2, 128, wb), lambda bq, tp: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 128, wb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((768, npix), cdt),
            pltpu.VMEM((768, npix), cdt),
        ],
    )(xd, xd, xd, xd, a_mat)


def stem_batch_stats(xd, x_shape, w):
    """Per-channel (mean, biased var) of the bare stem conv output on a
    prepped input — phase 1 of the frozen-stem train path, without
    materializing the conv output (train-mode BN statistics; reference
    keeps frozen layers' BatchNorm3d in train mode, ir_CSN_152.py:252-254
    sets requires_grad only). Stats come from the f32 MXU accumulator
    rather than the rounded bf16 activations, so they are slightly MORE
    accurate than reducing the stored tensor."""
    b, t, h, wd, _ = x_shape
    hp, wp = h // 2, wd // 2
    a_mat = _weight_matrix(w.astype(jnp.float32)).astype(jnp.bfloat16)
    s = _stem_stats_matmul(xd, a_mat, hp, wp)
    n = b * t * hp * wp
    sums = jnp.sum(s[0], axis=1)
    sqs = jnp.sum(s[1], axis=1)
    sums = sums[:64] + sums[64:]
    sqs = sqs[:64] + sqs[64:]
    mean = sums / n
    var = sqs / n - mean ** 2
    return mean, var


def stem_prep(x):
    """K1 input prep shared by both stem passes: SAME-pad, lane-merge the
    (W, 3) axes, parity-split (deinterleave). Returns the (B, T, H+8, 6*LB)
    deinterleaved view consumed by ``stem_from_xd``.

    The two-phase frozen-stem train path (csn.py) runs the stem matmul
    TWICE on the same input (bare conv for batch stats, then fused
    conv+affine+ReLU+pool); sharing this prep saves one full pad + reshape
    + K1 pass over the ~100 MB padded input per train step (measured
    ~1.1 ms of the bs=8 step as copy/reshape + K1 time)."""
    b, t, h, wd, _ = x.shape
    hp, wp = h // 2, wd // 2                  # output H', W'
    w2 = wp + 3
    assert t % 2 == 0 and hp % (2 * HB) == 0 and w2 <= LB

    # two extra bottom rows: the last tile's 16-row aligned loads extend
    # 2 rows past 2*H'+6; keep them in-bounds (interpret mode clamps OOB
    # dynamic slices, silently shifting data — the TPU reads dead padding)
    xp = jnp.pad(x, [(0, 0), (0, 0), (3, 5), (3, 3), (0, 0)])
    xr = xp.reshape(b, t, h + 8, (wd + 6) * 3).astype(jnp.bfloat16)
    return _deinterleave(xr, w2)


def stem_from_xd(xd, x_shape, out_dtype, w, scale, bias, relu=True,
                  pool=False):
    """K2 on a prepped input: fold scale/bias into the weight matrix and
    run the stem matmul kernel."""
    _, _, h, wd, _ = x_shape
    hp, wp = h // 2, wd // 2
    sc = jnp.tile(scale.astype(jnp.float32), 2)
    if pool:
        a_mat = _weight_matrix_v3(w.astype(jnp.float32))
        a_mat = (a_mat * sc[None, :, None]).astype(jnp.bfloat16)
    else:
        a_mat = _weight_matrix(w.astype(jnp.float32))
        a_mat = (a_mat * sc[:, None]).astype(jnp.bfloat16)
    bi = jnp.tile(bias.astype(jnp.float32), 2).reshape(128, 1)
    if pool:
        bi = bi.reshape(1, 128)
    return _stem_matmul(xd, a_mat, bi.astype(jnp.bfloat16), relu,
                        hp, wp, out_dtype, pool=pool)


def _stem_pallas(x, w, scale, bias, relu=True, pool=False):
    return stem_from_xd(stem_prep(x), x.shape, x.dtype, w, scale, bias,
                         relu=relu, pool=pool)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def stem_conv_bn_relu(x, w, scale, bias, relu=True):
    """Fused stem: relu((x * w) * scale + bias), channels-mid output.

    x (B,T,H,W,3); w (3,7,7,3,64); scale/bias (64,) folded inference BN.
    Returns (B, T, 64, H/2, W/2).
    """
    return _stem_pallas(x, w, scale, bias, relu)


def _fwd(x, w, scale, bias, relu):
    # custom_vjp fwd receives args in their ORIGINAL positions (nondiff
    # args are not moved to the front; only bwd gets them first).
    return stem_conv_bn_relu(x, w, scale, bias, relu), (x, w, scale, bias)


def _bwd(relu, res, g):
    x, w, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _stem_xla(*a, relu=relu), x, w, scale, bias)
    return vjp(g)


stem_conv_bn_relu.defvjp(_fwd, _bwd)


@jax.custom_vjp
def stem_forward(x, w, scale, bias):
    """The whole irCSN stem, fused: conv 3x7x7/(1,2,2) + folded BN + ReLU +
    1x3x3/(2,2) max-pool, channels-last output (B, T, H/4, W/4, 64).

    Reference: ir_CSN_152.py:97-104 (conv1 + bn1 + relu + maxpool).
    """
    return _stem_pallas(x, w, scale, bias, relu=True, pool=True)


def _pfwd(x, w, scale, bias):
    return stem_forward(x, w, scale, bias), (x, w, scale, bias)


def _pbwd(res, g):
    x, w, scale, bias = res
    _, vjp = jax.vjp(
        lambda *a: _stem_xla(*a, relu=True, pool=True), x, w, scale, bias)
    return vjp(g)


stem_forward.defvjp(_pfwd, _pbwd)


def stem_train_supported(x_shape) -> bool:
    """Two-phase train path: phase 1 is the in-kernel stats pass (ghost
    lanes masked for W' < 128), phase 2 the pooled kernel — same shape
    domain as inference (AVA 256 -> W'=128, JHMDB/UCF 224 -> 112)."""
    return stem_supported(x_shape)


def stem_supported(x_shape) -> bool:
    """Kernel (pooled path) constraints: T even, 2*HB | H', W' <= 128 and
    a multiple of 4 (covers AVA 256 -> W'=128 and JHMDB/UCF 224 -> 112)."""
    _, t, h, wd, c = x_shape
    wp = wd // 2
    return (c == 3 and t % 2 == 0 and h % 2 == 0
            and (h // 2) % (2 * HB) == 0 and wp % 4 == 0 and wp <= 128
            and jax.default_backend() == "tpu")
