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

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tubelet_transformer_tpu.models.layers import DecoderLayer, EncoderLayer
from tubelet_transformer_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
)


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
    # Pipeline parallelism (parallel/pipeline.py): >1 runs the encoder stack
    # as GPipe stages over the mesh 'pipe' axis; params live stacked under
    # 'encoder_stack' (stack_encoder_params converts sequential checkpoints).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 2
    mesh: Optional[Mesh] = None
    dtype: jnp.dtype = jnp.float32

    def _pipelined_encoder(self, src, mask, pos_embed, deterministic):
        """Encoder stack as a GPipe pipeline over the mesh 'pipe' axis.

        Parameters are declared stacked (leading layer axis) under
        ``encoder_stack`` so ``parallel/sharding_rules.py`` can place each
        stage's slice on its stage's devices (P('pipe', ...))."""
        if self.mesh is None:
            raise ValueError("pipeline_stages > 1 requires a mesh "
                             "(build_model(cfg, mesh=...))")
        if self.moe_experts > 0:
            raise NotImplementedError(
                "MoE inside the pipelined encoder is not supported; use "
                "MESH.PIPE=1 with MODEL.MOE_EXPERTS, or dense FFN with PP")
        layer = EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                             self.dropout, self.activation,
                             self.normalize_before, dtype=self.dtype)

        def init_stack(rng_key):
            dummy = jnp.zeros((1, 1, self.d_model), self.dtype)
            keys = jax.random.split(rng_key, self.num_encoder_layers)
            return stack_layer_params(
                [layer.init({"params": k}, dummy)["params"] for k in keys])

        stacked = self.param("encoder_stack", init_stack)
        mask_arr = (mask if mask is not None
                    else jnp.zeros(src.shape[:2], dtype=bool))
        rng_pp = (self.make_rng("dropout")
                  if (not deterministic and self.dropout > 0.0) else None)

        def layer_fn(p, x, aux, r):
            rngs = None if r is None else {"dropout": r}
            return layer.apply({"params": p}, x, aux["mask"], aux["pos"],
                               deterministic, rngs=rngs)

        return pipeline_apply(layer_fn, stacked, src,
                              {"mask": mask_arr, "pos": pos_embed},
                              self.mesh, self.pipeline_microbatches,
                              rng=rng_pp)

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

        if self.pipeline_stages > 1:
            memory = self._pipelined_encoder(src, mask, pos_embed,
                                             deterministic)
        else:
            memory = src
            for i in range(self.num_encoder_layers):
                memory = EncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout, self.activation, self.normalize_before,
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
