"""Mixture-of-Experts FFN with expert parallelism (TPU-native extension).

The reference's transformer FFN is dense (models/transformer/transformer.py:
131-190: linear1 -> relu -> dropout -> linear2). This module is an optional
sparse replacement for the *encoder* FFN: GShard/Switch-style top-k token
routing with a fixed per-row expert capacity, expressed as dense einsum
dispatch/combine so every shape is static (XLA requirement) and the expert
dimension of the stacked kernels can shard over the mesh 'model' axis.
GSPMD keeps each device's expert slice and its per-expert matmuls local and
inserts all-gather (token dispatch) + all-reduce (output combine) over ICI
— verified in the compiled HLO: kernels stay (E/n, D, F) per device. No
reference analog (SURVEY §2.8 is DP-only);
this is a capacity-scaling capability, off by default (MODEL.MOE_EXPERTS=0).

Routing follows the standard recipe (Switch for k=1, GShard for k=2):
  * router logits/softmax in float32 regardless of compute dtype;
  * slot s takes each token's s-th argmax expert; gates are the original
    softmax probs, renormalized over the kept slots when k > 1;
  * per-(batch-row) capacity C = ceil(S * capacity_factor * k / E); tokens
    over capacity are dropped (their combine weight is zero, so the encoder
    residual passes them through unchanged — Switch semantics);
  * load-balance auxiliary loss  E * sum_e f_e * P_e  (Switch eq. 4), sown
    into the 'moe' collection; the train step adds it with LOSS_COFS.MOE_AUX_COF.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEFFN(nn.Module):
    """Drop-in FFN block over (B, S, D) tokens: y has the same shape as x.

    Expert kernels are stacked with a leading expert axis — ``expert_w1``
    (E, D, F), ``expert_w2`` (E, F, D) — so ``parallel/sharding_rules.py``
    can shard dim 0 over 'model' (expert parallelism).
    """

    d_model: int
    dim_feedforward: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from tubelet_transformer_tpu.models.layers import _activation

        b, s, d = x.shape
        e, f, k = self.num_experts, self.dim_feedforward, self.top_k
        assert d == self.d_model
        assert 1 <= k <= e, f"top_k={k} out of range for {e} experts"
        cap = min(s, max(1, math.ceil(s * self.capacity_factor * k / e)))
        # padded tokens (pad_mask True) must not consume expert capacity or
        # bias the load-balance statistics; their output combine weight is
        # zero so the encoder residual passes them through (they are masked
        # out of attention anyway)
        valid = (jnp.ones((b, s), jnp.float32) if pad_mask is None
                 else 1.0 - pad_mask.astype(jnp.float32))       # (B,S)

        # Router: float32 numerics (bf16 softmax routing is noisy enough to
        # flip argmax ties between replicas).
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="router")(
                              x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)                 # (B,S,E)

        # Top-k expert choices per token (static unrolled loop over slots).
        slot_masks, slot_gates = [], []
        remaining = probs
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)                # (B,S)
            onehot = (jax.nn.one_hot(idx, e, dtype=jnp.float32)
                      * valid[..., None])                       # (B,S,E)
            slot_masks.append(onehot)
            slot_gates.append(jnp.sum(probs * onehot, axis=-1))  # (B,S)
            remaining = remaining * (1.0 - onehot)
        if k > 1:
            denom = sum(slot_gates) + 1e-9
            slot_gates = [g / denom for g in slot_gates]

        # Positions within each expert buffer (priority: slot order, then
        # sequence order), capacity-masked dispatch/combine tensors.
        combine = jnp.zeros((b, s, e, cap), jnp.float32)
        taken = jnp.zeros((b, 1, e), jnp.float32)  # tokens already buffered
        for mask, gate in zip(slot_masks, slot_gates):
            pos = jnp.cumsum(mask, axis=1) - mask + taken       # (B,S,E)
            fits = (pos < cap) & (mask > 0)
            oh_pos = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                    dtype=jnp.float32)          # (B,S,E,C)
            oh_pos = oh_pos * fits[..., None].astype(jnp.float32)
            combine = combine + oh_pos * gate[..., None, None]
            taken = taken + jnp.sum(mask, axis=1, keepdims=True)
        dispatch = (combine > 0.0).astype(self.dtype)           # (B,S,E,C)

        # Expert computation: stacked kernels, expert axis shardable.
        xavier = nn.initializers.variance_scaling(
            1.0, "fan_avg", "uniform", batch_axis=(0,))
        w1 = self.param("expert_w1", xavier, (e, d, f), jnp.float32)
        b1 = self.param("expert_b1", nn.initializers.zeros, (e, f), jnp.float32)
        w2 = self.param("expert_w2", xavier, (e, f, d), jnp.float32)
        b2 = self.param("expert_b2", nn.initializers.zeros, (e, d), jnp.float32)
        act = _activation(self.activation)

        dt = self.dtype
        xin = jnp.einsum("bsec,bsd->ebcd", dispatch, x.astype(dt))  # (E,B,C,D)
        h = act(jnp.einsum("ebcd,edf->ebcf", xin, w1.astype(dt))
                + b1.astype(dt)[:, None, None, :])
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        yo = (jnp.einsum("ebcf,efd->ebcd", h, w2.astype(dt))
              + b2.astype(dt)[:, None, None, :])
        y = jnp.einsum("bsec,ebcd->bsd", combine.astype(dt), yo)    # (B,S,D)

        # Switch load-balance loss: fraction routed (first choice) x mean
        # prob, both statistics over VALID tokens only.
        n_valid = jnp.sum(valid) + 1e-9
        f_e = jnp.sum(slot_masks[0], axis=(0, 1)) / n_valid     # (E,)
        p_e = jnp.sum(probs * valid[..., None], axis=(0, 1)) / n_valid
        self.sow("moe", "aux_loss", e * jnp.sum(f_e * p_e))
        return y
