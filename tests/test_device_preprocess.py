"""Device-side photometric preprocessing vs the host (cv2/numpy) path.

The device path (data/device_preprocess.py) runs HSV jitter + ImageNet
normalization inside the jitted step on uint8 clips; the host path
(data/transforms.py) is the reference-parity implementation.  The host
path quantizes through cv2's integer HSV, so jitter parity is statistical
(a few 8-bit steps near hue-sector boundaries); normalization parity is
exact.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.data import device_preprocess as D
from tubelet_transformer_tpu.data import transforms as T


def test_normalize_matches_host():
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 256, (2, 3, 16, 16, 3), dtype=np.uint8)
    dev = np.asarray(D.device_preprocess(jnp.asarray(clip)), np.float32)
    host = np.stack([
        T.normalize_clip(c, np.zeros((0, 4), np.float32))[0] for c in clip])
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_float_passthrough():
    x = jnp.ones((1, 2, 4, 4, 3), jnp.float32) * 0.5
    out = D.device_preprocess(x, dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.5)


def test_hsv_roundtrip_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 256, (64, 64, 3)), jnp.float32)
    back = D.hsv_cv_to_rgb(D.rgb_to_hsv_cv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-2)


def test_hsv_jitter_matches_cv2_statistically():
    import cv2

    rng = np.random.default_rng(2)
    clip = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    for hue_s, sat_s, val_s in [(7, -20, 13), (-10, 26, -26), (0, 0, 0)]:
        # host: cv2 integer HSV pipeline with fixed shifts
        hsv = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2HSV)
                        for f in clip]).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + hue_s + 180) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] + sat_s, 0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] + val_s, 0, 255)
        host = np.stack([cv2.cvtColor(f, cv2.COLOR_HSV2RGB)
                         for f in hsv.astype(np.uint8)]).astype(np.float32)

        # device: float HSV with the same shifts
        x = jnp.asarray(clip, jnp.float32)
        h0 = D.rgb_to_hsv_cv(x)
        h = jnp.mod(h0[..., 0] + hue_s + 180.0, 180.0)
        s = jnp.clip(h0[..., 1] + sat_s, 0.0, 255.0)
        v = jnp.clip(h0[..., 2] + val_s, 0.0, 255.0)
        dev = np.asarray(D.hsv_cv_to_rgb(jnp.stack([h, s, v], -1)),
                         np.float32)

        diff = np.abs(dev - host)
        assert np.median(diff) <= 2.0, np.median(diff)
        assert (diff > 6.0).mean() < 0.05, (diff > 6.0).mean()


def test_jitter_is_per_clip_and_bounded():
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.integers(40, 200, (4, 2, 8, 8, 3)), jnp.uint8)
    out = D.device_preprocess(clip, key=jax.random.PRNGKey(0), jitter=True)
    base = D.device_preprocess(clip)
    # jitter changes pixels but keeps the normalized range sane
    assert not np.allclose(np.asarray(out), np.asarray(base))
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out, np.float32)).max() < 4.0


def test_pad_mask_zeroes_padding_like_host_path(rng):
    """Device mode must feed the backbone the SAME padded region as the
    host path (0.0 post-normalization, DETR NestedTensor semantics) — not
    normalized black (~-2.1 sigma), and never jittered gray."""
    h = w = 16
    clip = rng.integers(0, 256, (1, 2, h, w, 3), dtype=np.uint8)
    clip[:, :, h // 2:, :] = 0          # canvas padding
    pad = np.zeros((1, h, w), bool)
    pad[:, h // 2:, :] = True

    out = np.asarray(D.device_preprocess(jnp.asarray(clip),
                                         pad_mask=jnp.asarray(pad)))
    assert np.abs(out[0, :, h // 2:, :]).max() == 0.0
    # valid region still ImageNet-normalized
    ref = (clip[0, :, : h // 2].astype(np.float32) / 255.0
           - np.asarray(D.IMAGENET_MEAN)) / np.asarray(D.IMAGENET_STD)
    np.testing.assert_allclose(out[0, :, : h // 2], ref, rtol=1e-5,
                               atol=1e-5)

    # jittered padding is zeroed too
    out_j = np.asarray(D.device_preprocess(
        jnp.asarray(clip), key=jax.random.PRNGKey(0), jitter=True,
        pad_mask=jnp.asarray(pad)))
    assert np.abs(out_j[0, :, h // 2:, :]).max() == 0.0
