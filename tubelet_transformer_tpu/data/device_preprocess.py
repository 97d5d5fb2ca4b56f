"""On-device (in-jit) photometric preprocessing: uint8 clips in, normalized
compute-dtype clips out.

The reference runs HSV color jitter + ImageNet normalization on the host
with cv2/numpy (datasets/video_transforms.py:308-369) — ~140 ms of numpy
per clip, and float32 clips over the host->device link.  Feeding uint8 and
doing the photometric work on the TPU cuts host CPU per clip ~5x and the
transfer volume 4x; geometric transforms (crop/flip/resize) stay host-side
because they co-transform boxes.

HSV math follows cv2's uint8 convention (H in [0,180), S/V in [0,255]) but
in float: converting through integer HSV quantizes like cv2 does, which is
augmentation noise, not signal — parity with the host path is tested to
within a few 8-bit steps away from hue-sector boundaries.

Jitter magnitudes mirror the reference ColorJitter defaults
(hue_shift=20 -> +-10 H-units, sat/val 0.1 -> +-26 S/V-units), drawn once
per clip like the reference (video_transforms.py:352-360).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# the single canonical copy lives in transforms.py (host path + native C
# canvas path import it from there too) — divergent copies would silently
# split host- and device-normalized inputs
from tubelet_transformer_tpu.data.transforms import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def rgb_to_hsv_cv(rgb):
    """RGB [0,255] float -> cv2-convention HSV (H [0,180), S/V [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    # hue in degrees [0, 360)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe_c,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_c,
                  240.0 + 60.0 * (r - g) / safe_c))
    h = jnp.where(c > 0, jnp.mod(h, 360.0), 0.0)
    s = jnp.where(v > 0, 255.0 * c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h / 2.0, s, v], axis=-1)


def hsv_cv_to_rgb(hsv):
    """cv2-convention HSV -> RGB [0,255] float."""
    h = hsv[..., 0] * 2.0                     # degrees [0, 360)
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [c, x, z, z, x], c)   # sector 5: r = c
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [x, c, c, x, z], z)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [z, z, x, c, c], x)
    m = v - c
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_jitter(clips, key, hue_shift=20.0, sat_shift=0.1, val_shift=0.1):
    """Per-clip random HSV shifts (reference ColorJitter semantics).

    clips (B, T, H, W, 3) float in [0, 255]."""
    b = clips.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    hue_b = int(round(hue_shift / 2))
    sat_b = int(round(sat_shift * 255))
    val_b = int(round(val_shift * 255))
    sh = jax.random.randint(kh, (b, 1, 1, 1), -hue_b, hue_b + 1)
    ss = jax.random.randint(ks, (b, 1, 1, 1), -sat_b, sat_b + 1)
    sv = jax.random.randint(kv, (b, 1, 1, 1), -val_b, val_b + 1)
    hsv = rgb_to_hsv_cv(clips)
    h = jnp.mod(hsv[..., 0] + sh + 180.0, 180.0)
    s = jnp.clip(hsv[..., 1] + ss, 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] + sv, 0.0, 255.0)
    return hsv_cv_to_rgb(jnp.stack([h, s, v], axis=-1))


def device_preprocess(clips, key=None, jitter=False, dtype=jnp.float32,
                      hue_shift=20.0, sat_shift=0.1, val_shift=0.1,
                      pad_mask=None):
    """uint8 (B,T,H,W,3) -> ImageNet-normalized ``dtype`` clips, in-graph.

    ``pad_mask`` (B,H,W, True = canvas padding) zeroes the padded region
    AFTER normalization, matching the host path exactly (there,
    pad_to_canvas fills zeros post-normalize — DETR NestedTensor
    semantics). Without the mask, canvas zeros would land at normalized
    black (~-2.1 sigma) and train-time jitter would turn them into random
    gray — a silent input divergence between the two preprocess modes.
    No-op pass-through for float inputs (host already normalized)."""
    if clips.dtype != jnp.uint8:
        return clips.astype(dtype)
    x = clips.astype(jnp.float32)
    if jitter:
        assert key is not None
        x = hsv_jitter(x, key, hue_shift, sat_shift, val_shift)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    out = (x - mean) / std
    if pad_mask is not None:
        out = jnp.where(pad_mask[:, None, :, :, None], 0.0, out)
    return out.astype(dtype)
