"""irCSN-50/152 backbone (interaction-reduced channel-separated 3D ResNet).

TPU-native re-implementation of the reference's
``models/backbones/ir_CSN_152.py`` / ``ir_CSN_50.py``: same topology
(stem 3x7x7 stride(1,2,2) + 1x3x3 maxpool; bottlenecks of 1x1x1 -> depthwise
3x3x3 -> 1x1x1 with temporal stride 2 at stages 2-4), but:

  * channels-last (B, T, H, W, C) layout — XLA's preferred TPU conv layout,
  * the depthwise 3x3x3 conv is ``feature_group_count=planes`` in
    ``lax.conv_general_dilated`` (MXU-friendly; a fused Pallas
    depthwise+BN+ReLU kernel is the targeted follow-up optimization),
  * bfloat16 compute with fp32 params/statistics,
  * BatchNorm uses frozen running stats at inference (the reference's
    ``Affine`` mode is exactly folded BN; we keep real BN params and fold).

Reference: ir_CSN_152.py:33-210 (blocks [3,8,36,3]), ir_CSN_50.py ([3,4,6,3]).
Checkpoint loading from the Caffe2 ``.mat`` exports is in
``train/checkpoint.py`` (key scheme ir_CSN_152.py:242-318).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

import jax

from tubelet_transformer_tpu.ops.pallas.bottleneck import (
    bottleneck_fused, bottleneck_supported)
from tubelet_transformer_tpu.ops.pallas.depthwise import depthwise_conv3x3x3
from tubelet_transformer_tpu.ops.pallas.stage import (
    bottleneck_chain, chain_supported, max_chain)
from tubelet_transformer_tpu.ops.pallas.stem import (
    stem_batch_stats, stem_from_xd, stem_forward, stem_prep,
    stem_supported, stem_train_supported)

BN_EPS = 1e-3       # reference ir_CSN_152.py:15
BN_MOMENTUM = 0.9   # flax momentum = 1 - torch momentum (torch bn_mmt = 0.1)


class _StemConv(nn.Module):
    """The stem 3x7x7/(1,2,2) conv with its kernel param exposed so the
    fused Pallas stem (ops/pallas/stem.py) can consume it directly.
    Param tree identical to ``nn.Conv(64, (3,7,7), use_bias=False)``."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (3, 7, 7, 3, 64), jnp.float32)

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.astype(self.dtype), (1, 2, 2),
            [(1, 1), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class _FoldableBN(nn.Module):
    """BatchNorm with the same variable tree as ``nn.BatchNorm`` (params
    scale/bias; batch_stats mean/var) plus ``folded()`` for the fused
    inference kernel.  Semantics mirror flax's BatchNorm (feature-last,
    f32 statistics, compute in ``dtype``)."""

    features: int
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        f = (self.features,)
        self.scale = self.param("scale", nn.initializers.ones, f, jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, f, jnp.float32)
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros(f, jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones(f, jnp.float32))

    def folded(self):
        """Inference-affine (scale', bias') with running stats folded in."""
        mul = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        return mul, self.bias - self.mean.value * mul

    def batch_affine(self, mean, var):
        """Train-affine from externally computed batch stats; also updates
        the running statistics exactly like the train-mode ``__call__``."""
        if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"):
            self.mean.value = (self.momentum * self.mean.value
                               + (1 - self.momentum) * mean)
            self.var.value = (self.momentum * self.var.value
                              + (1 - self.momentum) * var)
        mul = self.scale * jax.lax.rsqrt(var + self.epsilon)
        return mul, self.bias - mean * mul

    def __call__(self, x, train: bool = False):
        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing() and self.is_mutable_collection(
                    "batch_stats"):
                self.mean.value = (self.momentum * self.mean.value
                                   + (1 - self.momentum) * mean)
                self.var.value = (self.momentum * self.var.value
                                  + (1 - self.momentum) * var)
        else:
            mean, var = self.mean.value, self.var.value
        mul = (self.scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        shift = (self.bias - mean * self.scale
                 * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return x * mul + shift

BLOCK_NUMS = {
    "CSN-152": (3, 8, 36, 3),
    "CSN-50": (3, 4, 6, 3),
    # Minimal topology (one block per stage) for fast engine tests / dry
    # runs; same stage/stride structure, not a reference variant.
    "CSN-TINY": (1, 1, 1, 1),
}


class DepthwiseConv3d(nn.Module):
    """Depthwise 3x3x3 conv using the Pallas lane-flattened kernel on TPU
    (stride-1 path); parameter layout identical to nn.Conv with
    feature_group_count=C, so checkpoints are interchangeable."""

    features: int
    strides: tuple = (1, 1, 1)
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, 1, self.features), jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.kernel.reshape(3, 3, 3, self.features).astype(self.dtype)
        return depthwise_conv3x3x3(x.astype(self.dtype), w,
                                   stride=tuple(self.strides),
                                   use_pallas=self.use_pallas)


class _PointwiseConv(nn.Module):
    """1x1x1 conv as a channel matmul, kernel param exposed for the fused
    bottleneck kernel; param tree identical to nn.Conv((1,1,1))."""

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @property
    def matrix(self):
        return self.kernel.reshape(self.in_features, self.features)

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (1, 1, 1, self.in_features, self.features),
                                 jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # conv (not dot) lowering: measured much faster on these shapes
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class CSNBottleneck(nn.Module):
    """ir-bottleneck: 1x1x1 conv -> depthwise 3x3x3 -> 1x1x1, each + BN(+ReLU).

    Reference ir_CSN_152.py:33-90. ``conv3`` is the channel-separated
    (depthwise) spatio-temporal conv: groups == planes.  setup-style (not
    compact) so the stage-chain kernel can stack ``fused_params()`` across
    blocks; param names are unchanged.
    """

    in_planes: int
    planes: int
    stride: int = 1
    temporal_stride: int = 1
    has_downsample: bool = False
    expansion: int = 4
    use_pallas: bool = False
    fused_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv1 = _PointwiseConv(self.in_planes, self.planes,
                                    dtype=self.dtype, name="conv1")
        self.bn1 = _FoldableBN(self.planes, dtype=self.dtype, name="bn1")
        st = (self.temporal_stride, self.stride, self.stride)
        self.conv3 = DepthwiseConv3d(self.planes, strides=st,
                                     use_pallas=self.use_pallas,
                                     dtype=self.dtype, name="conv3")
        self.bn3 = _FoldableBN(self.planes, dtype=self.dtype, name="bn3")
        self.conv4 = _PointwiseConv(self.planes,
                                    self.planes * self.expansion,
                                    dtype=self.dtype, name="conv4")
        self.bn4 = _FoldableBN(self.planes * self.expansion,
                               dtype=self.dtype, name="bn4")
        if self.has_downsample:
            self.downsample_conv = nn.Conv(
                self.planes * self.expansion, (1, 1, 1), strides=st,
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="downsample_conv")
            self.downsample_bn = nn.BatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
                param_dtype=jnp.float32, name="downsample_bn")

    def fused_params(self):
        """(w1, wd, w4, a1, b1, a3, b3, a4, b4) with inference-folded BNs,
        for the fused single-block / stage-chain kernels."""
        a1, b1 = self.bn1.folded()
        a3, b3 = self.bn3.folded()
        a4, b4 = self.bn4.folded()
        return (self.conv1.matrix,
                self.conv3.kernel.reshape(3, 3, 3, self.planes),
                self.conv4.matrix, a1, b1, a3, b3, a4, b4)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (self.fused_blocks and not train and bottleneck_supported(
                x.shape, self.planes, self.stride, self.temporal_stride,
                self.has_downsample)):
            d = self.dtype
            w1, wd, w4, a1, b1, a3, b3, a4, b4 = self.fused_params()
            return bottleneck_fused(
                x.astype(d), w1.astype(d), wd.astype(d), w4.astype(d),
                a1, b1, a3, b3, a4, b4)

        residual = x
        out = nn.relu(self.bn1(self.conv1(x), train=train))
        out = nn.relu(self.bn3(self.conv3(out), train=train))
        out = self.bn4(self.conv4(out), train=train)

        if self.has_downsample:
            residual = self.downsample_conv(x)
            residual = self.downsample_bn(
                residual, use_running_average=not train)

        return nn.relu(out + residual)


class CSN(nn.Module):
    """irCSN trunk. Input (B, T, H, W, 3) -> features (B, T/8, H/16[,32], W/…, 2048).

    ``last_stride=False`` keeps the final spatial stride at 1
    (ir_CSN_152.py:133-135), giving 16x16 features for 256x256 input.
    """

    block_nums: Sequence[int] = (3, 8, 36, 3)
    last_stride: bool = True
    use_pallas: bool = False
    stem_kernel: bool = True
    fused_blocks: bool = False
    fused_stages: bool = False
    remat: bool = False         # TRAIN.REMAT_BACKBONE: checkpoint each block
    stop_grad_stage: int = -1   # train/optimizer.stop_grad_stage(cfg)
    frozen_chunk: int = 0       # TRAIN.FROZEN_CHUNK: chunk the frozen prefix
    dtype: jnp.dtype = jnp.float32

    def _stage_geom(self):
        """Static per-stage (planes, blocks, stride, tstride, in_planes)."""
        stage_planes = (64, 128, 256, 512)
        in_planes = 64
        geoms = []
        for s, (planes, blocks) in enumerate(zip(stage_planes,
                                                 self.block_nums)):
            if s == 0:
                stride, tstride = 1, 1
            elif s == 3:
                stride, tstride = (2 if self.last_stride else 1), 2
            else:
                stride, tstride = 2, 2
            geoms.append((planes, blocks, stride, tstride, in_planes))
            if blocks:
                in_planes = planes * 4
        return geoms

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        nstages = len(self.block_nums)
        ck = self.frozen_chunk
        b = x.shape[0]
        if (train and ck > 0 and self.stop_grad_stage >= 0
                and b > ck and b % ck == 0):
            # TRAIN.FROZEN_CHUNK: run the FROZEN prefix (stem + stages up
            # to the stop_grad boundary) as a lax.scan over fixed-size
            # batch chunks. Rationale: the conv emitter picks 2.5-3.3x
            # slower per-clip tiles once the batch axis grows past 2
            # (BASELINE.md "Batch scaling"); the frozen prefix is pure
            # forward, so chunking it recovers the small-batch kernels —
            # the train-side sibling of MODEL.INFER_CHUNK. BN semantics:
            # each chunk normalizes by ITS OWN batch statistics and the
            # running stats take sequential per-chunk EMA updates
            # (variable_carry) — exactly the reference recipe's unsynced
            # per-GPU BatchNorm3d at per-GPU batch = chunk (its DDP configs
            # train bs=2/GPU; running stats there are rank-0's stream).
            nfrozen = min(self.stop_grad_stage, nstages)

            def body(mdl, carry, xc):
                y = mdl._stem_fwd(xc, train)
                for s in range(nfrozen):
                    y = mdl._stage_fwd(s, y, train)
                return carry, y

            scan_fn = nn.scan(
                body, variable_broadcast="params",
                variable_carry="batch_stats",
                split_rngs={"params": False}, in_axes=0, out_axes=0)
            xs = x.reshape((b // ck, ck) + x.shape[1:])
            _, y = scan_fn(self, (), xs)
            # the whole prefix is frozen: prune the backward here (the
            # per-path stop_grads inside the body also fire, but this one
            # keeps the scan itself out of the autodiff graph entirely)
            x = jax.lax.stop_gradient(y.reshape((b,) + y.shape[2:]))
            start = nfrozen
        else:
            x = self._stem_fwd(x, train)
            start = 0
        for s in range(start, nstages):
            x = self._stage_fwd(s, x, train)
        return x

    def _stem_fwd(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv1 = _StemConv(dtype=self.dtype, name="conv1")
        bn1 = _FoldableBN(64, dtype=self.dtype, name="bn1")
        if self.stem_kernel and not train and stem_supported(x.shape):
            # fused Pallas stem: conv + folded BN + ReLU + 1x3x3 max-pool
            # in one pass (XLA runs this chain at ~13 ms for bs=4 CSN-152 —
            # reduce_window alone is ~4.7 ms; the kernel does it in ~4 ms).
            mul, shift = bn1.folded()
            x = stem_forward(x, conv1.kernel.astype(self.dtype), mul, shift)
        elif (self.stem_kernel and train and self.stop_grad_stage >= 0
              and stem_train_supported(x.shape)):
            # Train with the reference fine-tune recipe (frozen stem,
            # tune_point): two-phase fused stem. Phase 1 accumulates the
            # batch statistics of the bare conv inside the kernel (the
            # conv output never touches HBM); phase 2 reruns the fused
            # conv+affine+ReLU+pool with the batch-stat BN folded in.
            # 2x conv compute, but the kernel conv is cheap next to
            # XLA's C_in=3 conv + reduce_window chain (7.5 -> ~3.5 ms at
            # bs=2, train-step trace). The stem is frozen whenever any
            # stop_grad boundary exists (stop_grad_stage >= 0 freezes the
            # stem and everything up to that stage), so the kernels' VJPs
            # never run — which also makes it safe to share ONE K1 input
            # prep (stem_prep) between the two passes instead of padding/
            # deinterleaving the ~100 MB input twice (round-4 train-step
            # copy attack, BASELINE.md "train step" table). stop_gradient
            # on EVERY kernel input (not just the stage output): the
            # vjp-less pallas_calls would fail JVP tracing for any input
            # carrying a tangent.
            wk = jax.lax.stop_gradient(conv1.kernel.astype(self.dtype))
            xd = jax.lax.stop_gradient(stem_prep(x))
            # phase 1: batch statistics from the in-kernel f32 accumulator
            # (the bare conv output — 537 MB at bs=8 — is never written to
            # or re-read from HBM; round-4 train-step attack)
            mean, var = stem_batch_stats(xd, x.shape, wk)
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            mul, shift = bn1.batch_affine(mean, var)
            x = stem_from_xd(xd, x.shape, x.dtype, wk,
                              jax.lax.stop_gradient(mul),
                              jax.lax.stop_gradient(shift),
                              relu=True, pool=True)
        else:
            x = nn.relu(bn1(conv1(x), train=train))
            x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                            padding=[(0, 0), (1, 1), (1, 1)])
        if train and self.stop_grad_stage == 0:
            # frozen stem: prune the backward here (reference freezes via
            # requires_grad=False at tune_point, ir_CSN_152.py:251-303)
            x = jax.lax.stop_gradient(x)
        return x

    def _stage_fwd(self, s: int, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        planes, blocks, stride, tstride, in_planes = self._stage_geom()[s]
        if blocks == 0:   # truncated trunk (segment benches)
            # keep the stop_grad boundary even when the stage itself
            # is truncated away: the stem-train pallas dispatch above
            # fires whenever stop_grad_stage >= 0, and its vjp-less
            # kernels must not be differentiated through (they would
            # fail at trace time if the boundary silently vanished)
            if train and self.stop_grad_stage == s + 1:
                x = jax.lax.stop_gradient(x)
            return x
        # Activation remat: recompute each bottleneck in the backward
        # instead of storing its activations (train-time, full-backprop
        # memory relief; numerically identical).
        block_cls = (nn.remat(CSNBottleneck, static_argnums=(2,))
                     if (self.remat and train) else CSNBottleneck)
        mods = [block_cls(
            in_planes=in_planes if b == 0 else planes * 4,
            planes=planes,
            stride=stride if b == 0 else 1,
            temporal_stride=tstride if b == 0 else 1,
            has_downsample=(b == 0),
            expansion=4,
            use_pallas=self.use_pallas,
            fused_blocks=self.fused_blocks,
            dtype=self.dtype,
            name=f"layer{s + 1}_{b}",
        ) for b in range(blocks)]

        x = mods[0](x, train)
        if (self.fused_stages and not train and blocks > 1
                and chain_supported(x.shape, planes)):
            # identity tail of the stage as pipelined chain kernels: one
            # HBM read/write per chain instead of ~6 per block
            hw = x.shape[2] * x.shape[3]
            kmax = max_chain(hw, planes * 4, planes)
            b = 1
            while b < blocks:
                g = min(kmax, blocks - b)
                stacked = [jnp.stack(parts) for parts in zip(
                    *(mods[j].fused_params() for j in range(b, b + g)))]
                x = bottleneck_chain(x.astype(self.dtype), *stacked)
                b += g
        else:
            for mod in mods[1:]:
                x = mod(x, train)
        if train and self.stop_grad_stage == s + 1:
            x = jax.lax.stop_gradient(x)
        return x


def build_csn(backbone_name: str, last_stride: bool, dtype=jnp.float32,
              use_pallas: bool = False, stem_kernel: bool = True,
              fused_blocks: bool = False, fused_stages: bool = False,
              remat: bool = False, stop_grad_stage: int = -1,
              frozen_chunk: int = 0) -> CSN:
    if backbone_name not in BLOCK_NUMS:
        raise ValueError(f"unknown backbone {backbone_name!r}; "
                         f"supported: {sorted(BLOCK_NUMS)}")
    return CSN(block_nums=BLOCK_NUMS[backbone_name], last_stride=last_stride,
               use_pallas=use_pallas, stem_kernel=stem_kernel,
               fused_blocks=fused_blocks, fused_stages=fused_stages,
               remat=remat, stop_grad_stage=stop_grad_stage,
               frozen_chunk=frozen_chunk, dtype=dtype)
