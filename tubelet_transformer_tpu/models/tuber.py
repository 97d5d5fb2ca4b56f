"""TubeR: tubelet-query DETR for spatio-temporal action detection.

TPU-native rebuild of the reference ``models/tuber_ava.py`` DETR module:
irCSN backbone -> temporal downsampling (avg/max/learned-decode/middle) ->
DETR encoder-decoder over (T', H', W') tokens with tubelet queries ->
heads for per-frame boxes, binary actorness, and action classes read out via
a context-aware cross-attention over the *un-pooled* backbone features
(through a 1-layer factorized space/time encoder).

Differences from the reference (all intentional, TPU-first):
  * channels-last layouts, batch-first attention, bfloat16 compute option;
  * the class-branch encoder runs once on the un-pooled features instead of
    on a 6x layer-repeated batch (the reference repeats the identical input
    per decoder layer — models/tuber_ava.py:133-135 — which is redundant
    compute; outputs are identical in eval mode);
  * padding masks are carried as explicit boolean arrays, not NestedTensor.

Output dict mirrors the reference: ``pred_logits`` (B, Q, num_classes),
``pred_boxes`` (B, Q, 4) normalized cxcywh, ``pred_logits_b``, plus stacked
per-decoder-layer tensors for aux losses (kept stacked (L, ...) rather than a
list of dicts — friendlier to vmap'd loss computation).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.models.csn import build_csn
from tubelet_transformer_tpu.models.layers import (
    FactorizedSTEncoderLayer,
    LSTRDecoderLayer,
    MLP,
    MultiHeadAttention,
)
from tubelet_transformer_tpu.models.transformer import Transformer
from tubelet_transformer_tpu.ops.position_encoding import position_embedding_sine_3d


def nearest_resize_mask(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize of axes (1, 2) — (B, H, W[, ...]) inputs.

    Matches ``F.interpolate(mode='nearest')`` (backbone_builder.py:85):
    out[i] = in[floor(i * H / out_h)]. The single torch-parity nearest
    resize in the repo: the (B, H, W) pad masks here and the
    (N, H, W, C) FPN maps in models/segmentation.py both route through it.
    """
    x = jnp.asarray(x)
    h, w = x.shape[1], x.shape[2]
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class TubeR(nn.Module):
    """Full TubeR detector. Input clips (B, T, H, W, 3) + pad mask (B, H, W)."""

    num_classes: int = 80
    num_queries: int = 15
    hidden_dim: int = 256
    temporal_length: int = 32
    ds_rate: int = 8
    nhead: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    # Sparse MoE encoder FFN with expert parallelism (models/moe.py); 0 =
    # dense FFN, the reference's architecture.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    # Pipeline parallelism over the encoder stack (parallel/pipeline.py).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 2
    mesh: Optional[object] = None
    backbone_name: str = "CSN-152"
    last_stride: bool = False
    single_frame: bool = True
    temporal_ds_strategy: str = "decode"
    dataset_mode: str = "ava"
    use_pallas: bool = False
    stem_kernel: bool = True
    fused_blocks: bool = False
    fused_stages: bool = False
    remat_backbone: bool = False
    stop_grad_stage: int = -1
    frozen_chunk: int = 0
    use_lfb: bool = False
    generate_lfb: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = build_csn(self.backbone_name, self.last_stride,
                                  dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  stem_kernel=self.stem_kernel,
                                  fused_blocks=self.fused_blocks,
                                  fused_stages=self.fused_stages,
                                  remat=self.remat_backbone,
                                  stop_grad_stage=self.stop_grad_stage,
                                  frozen_chunk=self.frozen_chunk)
        self.transformer = Transformer(
            d_model=self.hidden_dim, nhead=self.nhead,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            normalize_before=self.normalize_before,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            mesh=self.mesh, dtype=self.dtype)

        n_q = (self.num_queries if self.dataset_mode == "ava"
               else self.num_queries * self.temporal_length)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (n_q, self.hidden_dim), jnp.float32)

        # 1x1x1 Conv3d projections == Dense over the channel axis.
        self.input_proj = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                   param_dtype=jnp.float32)
        self.class_proj = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                   param_dtype=jnp.float32)

        # Classification branch: 1-layer factorized space/time encoder +
        # cross-attention from decoder states (tuber_ava.py:60-62).
        self.encoder = FactorizedSTEncoderLayer(
            self.hidden_dim, 8, 2048, 0.1, dtype=self.dtype)
        self.cross_attn = MultiHeadAttention(self.hidden_dim, 8, 0.1,
                                             dtype=self.dtype)

        if self.dataset_mode == "ava":
            self.class_embed_b = nn.Dense(3, dtype=self.dtype,
                                          param_dtype=jnp.float32)
        else:
            self.class_embed_b = nn.Dense(2, dtype=self.dtype,
                                          param_dtype=jnp.float32)
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype)
        n_cls = (self.num_classes if self.dataset_mode == "ava"
                 else self.num_classes + 1)
        self.class_fc = nn.Dense(n_cls, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.head_dropout = nn.Dropout(0.5)

        if self.single_frame and self.temporal_ds_strategy == "decode":
            self.pool_query = self.param(
                "pool_query", nn.initializers.normal(1.0), (1, 2048),
                jnp.float32)
            self.pool_decoder = LSTRDecoderLayer(2048, 8, 2048, 0.1,
                                                 dtype=self.dtype)
            self.pool_norm = nn.LayerNorm(dtype=self.dtype,
                                          param_dtype=jnp.float32)

        if self.use_lfb:
            # Long-term context: decoder states cross-attend over a bank of
            # actor features from surrounding clips (the reference plumbs
            # lfb_features into forward — video_action_recognition.py:109-139
            # — but never shipped the module; this is our implementation of
            # the advertised "+long-term context" capability, README.md:16-26).
            self.lfb_proj = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                     param_dtype=jnp.float32)
            self.lfb_attn = MultiHeadAttention(self.hidden_dim, 8,
                                               self.dropout, dtype=self.dtype)
            self.lfb_norm = nn.LayerNorm(dtype=self.dtype,
                                         param_dtype=jnp.float32)

    def _temporal_pool(self, xs: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """(B, T', H', W', C) -> (B, t, H', W', C); t=1 when single_frame.

        Strategies per reference backbone_builder.py:42-80.
        """
        if not self.single_frame:
            return xs
        b, t, h, w, c = xs.shape
        if self.temporal_ds_strategy == "avg":
            return jnp.mean(xs, axis=1, keepdims=True)
        if self.temporal_ds_strategy == "max":
            return jnp.max(xs, axis=1, keepdims=True)
        if self.temporal_ds_strategy == "decode":
            # Learned pooling: a single query cross-attends over time at each
            # spatial location (LSTR decoder, backbone_builder.py:74-78).
            mem = xs.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
            tgt = jnp.broadcast_to(self.pool_query[None].astype(mem.dtype),
                                   (b * h * w, 1, c))
            out = self.pool_decoder(tgt, mem, deterministic=deterministic)
            out = self.pool_norm(out)
            return out.reshape(b, h, w, 1, c).transpose(0, 3, 1, 2, 4)
        # 'middle': central feature frame slice.
        return xs[:, t // 2: t // 2 + 1]

    def __call__(
        self,
        clips: jnp.ndarray,                 # (B, T, H, W, 3) normalized RGB
        pad_mask: Optional[jnp.ndarray] = None,  # (B, H, W) True = padded
        train: bool = False,
        lfb_features: Optional[jnp.ndarray] = None,  # (B, L_mem, E)
        lfb_mask: Optional[jnp.ndarray] = None,      # (B, L_mem) True = pad
        return_features: bool = False,  # also emit final-layer query features
    ):
        b, t_in, h_in, w_in, _ = clips.shape
        deterministic = not train
        if pad_mask is None:
            pad_mask = jnp.zeros((b, h_in, w_in), dtype=bool)

        xt = self.backbone(clips, train=train)      # (B, T', H', W', 2048)
        xs = self._temporal_pool(xt, deterministic)  # (B, t, H', W', 2048)
        bt, t, h, w, c = xs.shape

        feat_mask = nearest_resize_mask(pad_mask, h, w)          # (B, H', W')
        feat_mask_t = jnp.broadcast_to(feat_mask[:, None], (b, t, h, w))
        pos = position_embedding_sine_3d(
            ~feat_mask_t, self.hidden_dim, dtype=self.dtype)     # (B,t,H',W',E)

        src = self.input_proj(xs)                                # (B,t,H',W',E)
        src_tokens = src.reshape(b, t * h * w, self.hidden_dim)
        pos_tokens = pos.reshape(b, t * h * w, self.hidden_dim)
        mask_tokens = feat_mask_t.reshape(b, t * h * w)

        hs = self.transformer(src_tokens, mask_tokens, self.query_embed,
                              pos_tokens, deterministic=deterministic)
        lay_n, _, nb, dim = hs.shape                             # (L,B,Q,E)

        if self.dataset_mode == "ava":
            outputs_class_b = self.class_embed_b(hs)             # (L,B,Q,3)
        else:
            pooled = jnp.mean(xt, axis=(1, 2, 3))                # (B, 2048)
            cb = self.class_embed_b(pooled)                      # (B, 2)
            outputs_class_b = jnp.broadcast_to(cb[None], (lay_n,) + cb.shape)

        # Classification branch over un-pooled features (tuber_ava.py:126-141).
        src_c = self.class_proj(xt)                              # (B,T',H',W',E)
        tc = xt.shape[1]
        enc = self.encoder(src_c.reshape(b, tc, h * w, self.hidden_dim),
                           deterministic=deterministic)
        enc = enc.reshape(b, tc * h * w, self.hidden_dim)
        # Fold decoder layers into the batch for one big cross-attention.
        hs_q = hs.reshape(lay_n * b, nb, dim)
        enc_rep = jnp.broadcast_to(enc[None], (lay_n,) + enc.shape)
        enc_rep = enc_rep.reshape(lay_n * b, tc * h * w, self.hidden_dim)
        q_class = self.cross_attn(hs_q, enc_rep, enc_rep,
                                  deterministic=deterministic, packing="kv")
        q_class = q_class.reshape(lay_n, b, nb, self.hidden_dim)

        if self.use_lfb and lfb_features is not None:
            # Fuse long-term memory: residual cross-attention from the
            # (layer-folded) query states over the projected bank tokens.
            mem = self.lfb_proj(lfb_features.astype(self.dtype))  # (B,L_mem,E)
            l_mem = mem.shape[1]
            mem_rep = jnp.broadcast_to(
                mem[None], (lay_n,) + mem.shape).reshape(
                    lay_n * b, l_mem, self.hidden_dim)
            if lfb_mask is None:
                lfb_mask = jnp.zeros((b, l_mem), bool)
            mask_rep = jnp.broadcast_to(
                lfb_mask[None], (lay_n, b, l_mem)).reshape(lay_n * b, l_mem)
            qc = q_class.reshape(lay_n * b, nb, self.hidden_dim)
            ltc = self.lfb_attn(qc, mem_rep, mem_rep,
                                key_padding_mask=mask_rep,
                                deterministic=deterministic)
            # fully-padded banks contribute nothing (mask-safe residual)
            any_valid = jnp.any(~mask_rep, axis=-1)[:, None, None]
            qc = self.lfb_norm(qc + jnp.where(any_valid, ltc, 0.0))
            q_class = qc.reshape(lay_n, b, nb, self.hidden_dim)

        q_class = self.head_dropout(q_class, deterministic=deterministic)

        outputs_class = self.class_fc(q_class)                   # (L,B,Q,cls)
        outputs_coord = nn.sigmoid(self.bbox_embed(hs).astype(jnp.float32))

        if self.generate_lfb:
            # Actor features for the bank: final-layer query states after the
            # context cross-attention, with their actor probabilities.
            return {
                "lfb_features": q_class[-1].astype(jnp.float32),  # (B,Q,E)
                "pred_logits_b": outputs_class_b[-1].astype(jnp.float32),
                "pred_boxes": outputs_coord[-1],
            }

        out = {
            "pred_logits": outputs_class[-1].astype(jnp.float32),
            "pred_boxes": outputs_coord[-1],
            "pred_logits_b": outputs_class_b[-1].astype(jnp.float32),
            # Stacked aux outputs, leading axis = decoder layer (first L-1
            # entries are the aux layers; last duplicates the heads above).
            "aux_logits": outputs_class.astype(jnp.float32),
            "aux_boxes": outputs_coord,
            "aux_logits_b": outputs_class_b.astype(jnp.float32),
        }
        if return_features:
            # Final-layer context features per query — the same tensor the
            # generate_lfb path banks; serving uses it to maintain a rolling
            # long-term memory online (serving.StreamingDetector).
            out["lfb_features"] = q_class[-1].astype(jnp.float32)
        return out


def build_model(cfg: Config, mesh=None) -> TubeR:
    from tubelet_transformer_tpu.train.optimizer import stop_grad_stage
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    if cfg.mesh.pipe > 1 and mesh is None:
        raise ValueError("MESH.PIPE > 1 requires build_model(cfg, mesh=...) "
                         "so the pipelined encoder can shard_map over it")
    if cfg.train.frozen_chunk and cfg.mesh.data > 1:
        # chunking splits the global batch axis that DP shards — the scan
        # would reshard every chunk, and with DP the per-device batch is
        # already small enough that the conv emitter's bs>=4 tax (the
        # reason FROZEN_CHUNK exists) does not apply
        raise ValueError("TRAIN.FROZEN_CHUNK is a single-chip optimization;"
                         " disable it when MESH.DATA > 1")
    return TubeR(
        num_classes=cfg.data.num_classes,
        num_queries=cfg.model.query_num,
        hidden_dim=cfg.model.d_model,
        temporal_length=cfg.model.temp_len,
        ds_rate=cfg.model.ds_rate,
        nhead=cfg.model.nhead,
        enc_layers=cfg.model.enc_layers,
        dec_layers=cfg.model.dec_layers,
        dim_feedforward=cfg.model.dim_feedforward,
        dropout=cfg.model.dropout,
        normalize_before=cfg.model.normalize_before,
        moe_experts=cfg.model.moe_experts,
        moe_top_k=cfg.model.moe_top_k,
        moe_capacity_factor=cfg.model.moe_capacity_factor,
        pipeline_stages=cfg.mesh.pipe,
        pipeline_microbatches=cfg.mesh.pipe_microbatches,
        mesh=mesh if cfg.mesh.pipe > 1 else None,
        backbone_name=cfg.model.backbone_name,
        last_stride=cfg.model.last_stride,
        single_frame=cfg.model.single_frame,
        temporal_ds_strategy=cfg.model.temporal_ds_strategy,
        dataset_mode=("ava" if cfg.data.dataset_name not in ("jhmdb", "ucf")
                      else cfg.data.dataset_name),
        use_pallas=cfg.model.pallas_kernels,
        stem_kernel=cfg.model.stem_kernel,
        fused_blocks=cfg.model.fused_blocks,
        fused_stages=cfg.model.fused_stages,
        remat_backbone=cfg.train.remat_backbone,
        stop_grad_stage=stop_grad_stage(cfg),
        frozen_chunk=cfg.train.frozen_chunk,
        use_lfb=cfg.use_lfb,
        generate_lfb=cfg.model.generate_lfb,
        dtype=dtype,
    )
