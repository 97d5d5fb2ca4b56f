"""Streaming multi-head attention with a rolling KV cache.

TPU-native equivalent of the reference's ``online_inference`` path
(models/transformer/transformer_layers.py:121-304): LSTR-style incremental
long-memory inference where, each step, the oldest memory token is evicted
and one new token enters the window. The reference caches:
  * the projected query (fixed queries, computed once);
  * content keys/values projected WITHOUT bias, rolled left each step;
  * positional keys/values projected WITH bias (fixed window-position table).
Attention runs over (k_content + k_pos) with output read from
(v_content + v_pos) — so position embeddings stay attached to window slots
while content slides through (transformer_layers.py:132-154, 209-304).

Here that becomes a pure function over an explicit state (jit/scan
friendly): no Python-side mutation, fixed shapes, O(W) per step instead of
re-projecting the whole window.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class StreamingState(NamedTuple):
    q: jnp.ndarray        # (B, Q, E) projected+scaled queries (fixed)
    k: jnp.ndarray        # (B, W, E) content keys (no bias), rolling
    v: jnp.ndarray        # (B, W, E) content values (no bias), rolling
    k_pos: jnp.ndarray    # (B, W, E) positional keys (with bias), fixed
    v_pos: jnp.ndarray    # (B, W, E) positional values (with bias), fixed


def _split_proj(params):
    """Our MultiHeadAttention param dict -> (wq, wk, wv, bq, bk, bv, wo, bo)."""
    w = params["in_proj"]
    b = params["in_proj_bias"]
    e = w.shape[0]
    wq, wk, wv = w[:, :e], w[:, e:2 * e], w[:, 2 * e:]
    bq, bk, bv = b[:e], b[e:2 * e], b[2 * e:]
    wo = params["out_proj"]["kernel"]
    bo = params["out_proj"]["bias"]
    return wq, wk, wv, bq, bk, bv, wo, bo


def streaming_init(params, num_heads: int, queries: jnp.ndarray,
                   memory: jnp.ndarray, pos: jnp.ndarray) -> StreamingState:
    """Build the initial window state.

    queries (B, Q, E); memory (B, W, E) initial window content;
    pos (B, W, E) window position embeddings.
    """
    wq, wk, wv, bq, bk, bv, _, _ = _split_proj(params)
    e = wq.shape[0]
    head_dim = e // num_heads
    q = (queries @ wq + bq) * (float(head_dim) ** -0.5)
    return StreamingState(
        q=q,
        k=memory @ wk,                  # content: NO bias (ref :234, :245)
        v=memory @ wv,                  # content: NO bias (ref :268)
        k_pos=pos @ wk + bk,            # positional: bias attached (:246)
        v_pos=pos @ wv + bv,            # positional: bias attached (:269)
    )


def streaming_attend(params, num_heads: int,
                     state: StreamingState) -> jnp.ndarray:
    """Attend over the current window -> (B, Q, E)."""
    _, _, _, _, _, _, wo, bo = _split_proj(params)
    b, qn, e = state.q.shape
    w = state.k.shape[1]
    h = num_heads
    d = e // h
    qh = state.q.reshape(b, qn, h, d)
    kh = (state.k + state.k_pos).reshape(b, w, h, d)
    vh = (state.v + state.v_pos).reshape(b, w, h, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(vh.dtype), vh)
    return out.reshape(b, qn, e) @ wo + bo


def streaming_step(params, num_heads: int, state: StreamingState,
                   new_token: jnp.ndarray) -> Tuple[jnp.ndarray, StreamingState]:
    """Advance the window by one token and attend.

    new_token (B, 1, E) enters at the window end; the oldest content is
    evicted (reference cat((cached[1:], new)), :234-237). Returns
    (attn_output (B, Q, E), new_state).
    """
    _, wk, wv, _, _, _, _, _ = _split_proj(params)
    k = jnp.concatenate([state.k[:, 1:], new_token @ wk], axis=1)
    v = jnp.concatenate([state.v[:, 1:], new_token @ wv], axis=1)
    state = state._replace(k=k, v=v)
    return streaming_attend(params, num_heads, state), state
