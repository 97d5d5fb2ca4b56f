"""Native C++ JPEG decoder vs PIL (skipped when the toolchain is absent)."""

import io

import numpy as np
import pytest
from PIL import Image

from tubelet_transformer_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_bytes():
    x = np.linspace(0, 1, 320)
    y = np.linspace(0, 1, 240)
    img = (np.stack(np.meshgrid(x, y), -1).sum(-1, keepdims=True) * 127
           ).repeat(3, -1).astype(np.uint8)
    img[..., 1] = 255 - img[..., 1]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


needs_native = pytest.mark.skipif(not native.is_available(),
                                  reason="libclipdec.so unavailable")


@needs_native
def test_dims(jpeg_bytes):
    assert native.jpeg_dims(jpeg_bytes) == (320, 240)


@needs_native
def test_decode_close_to_pil(jpeg_bytes):
    out = native.decode_jpeg(jpeg_bytes, 160, 120)
    ref = np.asarray(Image.open(io.BytesIO(jpeg_bytes))
                     .resize((160, 120), Image.BILINEAR))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4        # DCT prescale + resampler differences
    assert diff.mean() < 0.5


@needs_native
def test_decode_to_canvas_normalizes_and_pads(jpeg_bytes):
    canvas = np.zeros((140, 200, 3), np.float32)
    native.decode_to_canvas(jpeg_bytes, 160, 120, canvas)
    ref = native.decode_jpeg(jpeg_bytes, 160, 120).astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(canvas[:120, :160], (ref - mean) / std,
                               rtol=1e-4, atol=1e-5)
    assert np.abs(canvas[120:]).max() == 0
    assert np.abs(canvas[:, 160:]).max() == 0


@needs_native
def test_corrupt_jpeg_raises(jpeg_bytes):
    # libjpeg tolerates truncated scan data (partial decode); a garbage
    # header is a hard error.
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg at all" * 10, 64, 64)
