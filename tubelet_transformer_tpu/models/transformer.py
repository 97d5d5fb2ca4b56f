"""DETR-style transformer encoder/decoder over spatio-temporal tokens.

Reimplements the reference ``models/transformer/transformer.py`` (post-norm
6+6 DETR with intermediate decoder outputs) batch-first for TPU. The decoder
returns the LayerNormed hidden state after *every* layer stacked as
(L, B, Q, E) — the reference's ``return_intermediate=True`` path
(transformer.py:110-126; the final pop/re-append there is a no-op value-wise).

Transformer weights use Xavier-uniform init like the reference's
``_reset_parameters`` (transformer.py:44-47).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tubelet_transformer_tpu.models.layers import DecoderLayer, EncoderLayer


class Transformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    # Sparse MoE encoder FFN (models/moe.py); 0 = dense (reference parity).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,          # (B, S, E) flattened (t, h, w)-ordered tokens
        mask: Optional[jnp.ndarray],  # (B, S) True = padded token
        query_embed: jnp.ndarray,  # (Q, E)
        pos_embed: jnp.ndarray,    # (B, S, E)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b = src.shape[0]
        q = query_embed.shape[0]

        memory = src
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype, name=f"encoder_layer_{i}",
            )(memory, key_padding_mask=mask, pos=pos_embed,
              deterministic=deterministic)
        if self.normalize_before:
            memory = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                  name="encoder_norm")(memory)

        query_pos = jnp.broadcast_to(
            query_embed[None].astype(self.dtype), (b, q, self.d_model))
        tgt = jnp.zeros_like(query_pos)
        decoder_norm = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                    name="decoder_norm")
        intermediate = []
        out = tgt
        for i in range(self.num_decoder_layers):
            out = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name=f"decoder_layer_{i}",
            )(out, memory, memory_key_padding_mask=mask, pos=pos_embed,
              query_pos=query_pos, deterministic=deterministic)
            intermediate.append(decoder_norm(out))

        return jnp.stack(intermediate, axis=0)  # (L, B, Q, E)
