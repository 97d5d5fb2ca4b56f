"""Transformer building blocks (flax.linen, batch-first, TPU layouts).

Numerics match torch ``nn.MultiheadAttention`` / the reference's custom
``MultiheadAttention`` (models/transformer/transformer_layers.py:170-366):
packed qkv projection, per-head scaled dot product, additive -inf key-padding
mask, attention-weight dropout, output projection. Softmax runs in fp32 even
under bfloat16 compute.

All weights are stored in the jnp (in, out) layout; checkpoint converters
transpose from torch's (out, in).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _large_negative() -> float:
    """Additive -inf substitute for attention scores (f32 min/2 leaves
    headroom so fully-masked softmax rows stay finite). Representable in
    bf16 too (same exponent range), so it serves both the f32 eval
    scores and the train-time compute-dtype scores."""
    return jnp.finfo(jnp.float32).min / 2.0


class MultiHeadAttention(nn.Module):
    """Torch-compatible multi-head attention over (B, S, E) tensors."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,  # (B, Sq, E)
        k: jnp.ndarray,  # (B, Sk, E)
        v: jnp.ndarray,  # (B, Sk, E)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Sk) True = pad
        deterministic: bool = True,
        packing: Optional[str] = None,  # 'qk' | 'kv' | 'qkv': declared shared inputs
    ) -> jnp.ndarray:
        e = self.embed_dim
        h = self.num_heads
        d = e // h
        assert d * h == e, "embed_dim must be divisible by num_heads"

        in_proj = self.param(
            "in_proj",
            nn.initializers.xavier_uniform(),
            (e, 3 * e),
            jnp.float32,
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,), jnp.float32)

        dt = self.dtype
        w3 = in_proj.astype(dt)
        b3 = in_bias.astype(dt)

        # Pack projections sharing an input into ONE matmul (callers pass
        # the same array object for q/k in self-attention and for k/v in
        # the class-branch cross-attention): same per-column dot products,
        # a third of the ops, and N=512/768 fills the MXU better than
        # N=256 (train trace: the three separate projections cost ~4 ms
        # fwd+bwd at bs=8 across the 1215-op transformer group).
        # Dispatch is on object identity (exact in every branch); callers
        # that rely on the fast path DECLARE it via ``packing`` so a
        # refactor that materializes q/k separately fails loudly here
        # instead of silently dropping the packing.
        if packing is not None:
            held = {"qkv": q is k and k is v, "qk": q is k,
                    "kv": k is v}.get(packing)
            if held is None:
                raise ValueError(f"unknown packing {packing!r}")
            if not held:
                raise ValueError(
                    f"packing={packing!r} declared but the arrays are not "
                    "the same object — caller no longer shares the input")
        if q is k and k is v:
            qp, kp, vp = jnp.split(q.astype(dt) @ w3 + b3, 3, axis=-1)
        elif q is k:
            qp, kp = jnp.split(
                q.astype(dt) @ w3[:, :2 * e] + b3[:2 * e], 2, axis=-1)
            vp = v.astype(dt) @ w3[:, 2 * e:] + b3[2 * e:]
        elif k is v:
            qp = q.astype(dt) @ w3[:, :e] + b3[:e]
            kp, vp = jnp.split(
                k.astype(dt) @ w3[:, e:] + b3[e:], 2, axis=-1)
        else:
            wq, wk, wv = jnp.split(w3, 3, axis=1)
            bq, bk, bv = jnp.split(b3, 3)
            qp = q.astype(dt) @ wq + bq
            kp = k.astype(dt) @ wk + bk
            vp = v.astype(dt) @ wv + bv

        b, sq, _ = qp.shape
        sk = kp.shape[1]
        qp = qp.reshape(b, sq, h, d) * (float(d) ** -0.5)
        kp = kp.reshape(b, sk, h, d)
        vp = vp.reshape(b, sk, h, d)

        # TRAIN-time (deterministic=False) score/prob tensors materialize
        # in the compute dtype: at flagship shapes the (B, h, S, S) f32
        # score + prob tensors are the transformer slice's main HBM
        # traffic, and halving them saves ~2 ms of the bs=8 train step
        # (round-5 probe: 94.1 -> 92.1 ms). The softmax itself still
        # reduces in f32 (the astype below fuses into the softmax chain —
        # no f32 tensor is materialized), so only the bf16 rounding of
        # logits/probs differs — noise next to the 0.1 attention dropout,
        # and consistent with the bf16 training regime everywhere else.
        # EVAL keeps the full-f32 materialization the oracle parity tests
        # pin (and f32 configs are unchanged in both modes: sdt == f32).
        sdt = jnp.float32 if deterministic else dt
        scores = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                            preferred_element_type=sdt)
        if key_padding_mask is not None:
            neg = _large_negative()
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(sdt)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(dt), vp).reshape(b, sq, e)
        return nn.Dense(e, dtype=dt, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="out_proj")(out)


class MLP(nn.Module):
    """Stack of Linear+ReLU ending in a plain Linear (criterion.py:485-497)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"layers_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"layers_{self.num_layers - 1}")(x)


def _activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    raise ValueError(f"unsupported activation {name!r}")


class EncoderLayer(nn.Module):
    """DETR post-norm (default) / pre-norm encoder layer
    (reference transformer.py:131-190).

    ``moe_experts > 0`` swaps the dense FFN for a sparse Mixture-of-Experts
    FFN (models/moe.py) — a TPU-native capacity extension with no reference
    analog; the attention block is unchanged."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, S, E)
        key_padding_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = _activation(self.activation)
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype, name="self_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.moe_experts > 0:
            from tubelet_transformer_tpu.models.moe import MoEFFN

            moe = MoEFFN(self.d_model, self.dim_feedforward,
                         self.moe_experts, self.moe_top_k,
                         self.moe_capacity_factor, self.dropout,
                         self.activation, dtype=self.dtype, name="moe_ffn")
            # padded tokens must not consume expert capacity
            ffn = lambda x: moe(x, deterministic=deterministic,
                                pad_mask=key_padding_mask)
        else:
            lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name="linear1")
            lin2 = nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name="linear2")
            ffn = lambda x: lin2(drop(act(lin1(x))))

        def with_pos(x):
            return x if pos is None else x + pos.astype(x.dtype)

        if self.normalize_before:
            s2 = norm1(src)
            qk = with_pos(s2)
            src = src + drop(attn(qk, qk, s2, key_padding_mask, deterministic,
                                  packing="qk"))
            s2 = norm2(src)
            src = src + drop(ffn(s2))
            return src

        qk = with_pos(src)
        src = norm1(src + drop(attn(qk, qk, src, key_padding_mask, deterministic,
                                    packing="qk")))
        src = norm2(src + drop(ffn(src)))
        return src


class DecoderLayer(nn.Module):
    """DETR decoder layer: query self-attn + cross-attn + FFN
    (reference transformer.py:193-285)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,      # (B, Q, E)
        memory: jnp.ndarray,   # (B, S, E)
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,        # (B, S, E)
        query_pos: Optional[jnp.ndarray] = None,  # (B, Q, E)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = _activation(self.activation)
        self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype, name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                        dtype=self.dtype, name="multihead_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm3")
        lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear2")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        def add_pos(x, p):
            return x if p is None else x + p.astype(x.dtype)

        if self.normalize_before:
            t2 = norm1(tgt)
            qk = add_pos(t2, query_pos)
            tgt = tgt + drop(self_attn(qk, qk, t2, None, deterministic,
                                       packing="qk"))
            t2 = norm2(tgt)
            tgt = tgt + drop(cross_attn(add_pos(t2, query_pos), add_pos(memory, pos),
                                        memory, memory_key_padding_mask, deterministic))
            t2 = norm3(tgt)
            tgt = tgt + drop(lin2(drop(act(lin1(t2)))))
            return tgt

        qk = add_pos(tgt, query_pos)
        tgt = norm1(tgt + drop(self_attn(qk, qk, tgt, None, deterministic,
                                         packing="qk")))
        tgt = norm2(tgt + drop(cross_attn(add_pos(tgt, query_pos),
                                          add_pos(memory, pos), memory,
                                          memory_key_padding_mask, deterministic)))
        tgt = norm3(tgt + drop(lin2(drop(act(lin1(tgt))))))
        return tgt


class FactorizedSTEncoderLayer(nn.Module):
    """Factorized space/time self-attention encoder layer.

    Reimplements reference transformer_layers.py:46-119 (``forward_post``):
    one attention over the spatial axis within each (time, batch), one over
    the temporal axis at each (spatial, batch); both branches are layer-normed
    residuals of the input, concatenated channel-wise and fused by an FFN,
    then a final residual + LayerNorm. Cost O(T*(HW)^2 + HW*T^2) instead of
    O((T*HW)^2) — the reference's answer to long-clip scaling (SURVEY §5.7).

    Note the reference's naming is swapped relative to the math: its
    ``self_attn_t`` attends over space and ``self_attn_s`` over time. We keep
    the reference parameter names (attn_t/attn_s) so checkpoints map 1:1, and
    document the actual axis here.
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, T, HW, E) — batch-first spatio-temporal tokens
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t, hw, e = src.shape
        act = _activation(self.activation)
        # "t"-named branch attends over the *spatial* axis (see docstring).
        attn_t = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                    dtype=self.dtype, name="self_attn_t")
        attn_s = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                    dtype=self.dtype, name="self_attn_s")
        norm1_t = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1_t")
        norm1_s = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1_s")
        norm2 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")
        lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear2")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        # Spatial branch: sequences of length HW, batch (B*T).
        xs = src.reshape(b * t, hw, e)
        xs = norm1_t(xs + drop(attn_t(xs, xs, xs, None, deterministic)))
        branch_spatial = xs.reshape(b, t, hw, e)

        # Temporal branch: sequences of length T, batch (B*HW).
        xt = src.transpose(0, 2, 1, 3).reshape(b * hw, t, e)
        xt = norm1_s(xt + drop(attn_s(xt, xt, xt, None, deterministic)))
        branch_temporal = xt.reshape(b, hw, t, e).transpose(0, 2, 1, 3)

        cat = jnp.concatenate([branch_spatial, branch_temporal], axis=-1)
        src = norm2(src + drop(lin2(drop(act(lin1(cat))))))
        return src


class LSTRDecoderLayer(nn.Module):
    """LSTR-style decoder layer used by the learned temporal pooling
    (reference transformer_layers.py:407-448)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,     # (B, Q, E)
        memory: jnp.ndarray,  # (B, S, E)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype, name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                        dtype=self.dtype, name="multihead_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm3")
        lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear2")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        tgt = norm1(tgt + drop(self_attn(tgt, tgt, tgt, None, deterministic,
                                         packing="qkv")))
        tgt = norm2(tgt + drop(cross_attn(tgt, memory, memory, None,
                                          deterministic, packing="kv")))
        tgt = norm3(tgt + drop(lin2(drop(nn.relu(lin1(tgt))))))
        return tgt
