"""3-D sine/cosine position embedding.

Reimplements ``PositionEmbeddingSine_3D`` (reference
models/transformer/position_encoding.py:15-77, duplicated at
models/detr/position_encoding.py) with channels-last output for TPU layouts.

Channel split of ``d_model``: 2/8 temporal, 3/8 y, 3/8 x (so 64/96/96 for 256).
Positions are cumulative sums of valid (non-padded) pixels, normalized to
[0, 2*pi] — so the embedding adapts to the per-sample valid region exactly as
in the reference (padding-aware positions, not absolute grid positions).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(even), cos(odd)).flatten — reference position_encoding.py:64-68."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def position_embedding_sine_3d(
    not_mask: jnp.ndarray,
    d_model: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Compute the 3-D sine position embedding.

    Args:
      not_mask: (B, T, H, W) — 1.0/True on *valid* pixels, 0 on padding.
        (The reference passes ``~mask``; we take validity directly.)
      d_model: embedding channels; must be divisible by 8.

    Returns:
      (B, T, H, W, d_model) float embedding, channels-last.
    """
    if d_model % 8 != 0:
        raise ValueError(f"d_model must be divisible by 8, got {d_model}")
    n_t = d_model // 8 * 2
    n_s = d_model // 8 * 3
    if scale is None:
        scale = 2.0 * math.pi

    nm = not_mask.astype(jnp.float32)
    t_embed = jnp.cumsum(nm, axis=1)
    y_embed = jnp.cumsum(nm, axis=2)
    x_embed = jnp.cumsum(nm, axis=3)
    if normalize:
        eps = 1e-6
        t_embed = t_embed / (t_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale

    dim_t = jnp.arange(n_t, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / n_t)
    dim_s = jnp.arange(n_s, dtype=jnp.float32)
    dim_s = temperature ** (2.0 * jnp.floor(dim_s / 2.0) / n_s)

    pos_t = _interleave_sin_cos(t_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_s)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_s)

    # Reference concatenation order: (t, y, x) — position_encoding.py:70.
    return jnp.concatenate([pos_t, pos_y, pos_x], axis=-1).astype(dtype)


def positional_encoding_1d(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Classic 1-D sinusoidal table (reference transformer_layers.py:451-468).

    Returns (length, d_model). Even channels sin, odd channels cos.
    """
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe.astype(dtype)
