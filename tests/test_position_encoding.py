"""Parity: jnp 3-D sine position embedding vs reference PositionEmbeddingSine_3D."""

import numpy as np
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.ops.position_encoding import (
    position_embedding_sine_3d,
    positional_encoding_1d,
)


def _ref_posenc(mask_np):
    ref = load_ref("models.transformer.position_encoding")
    misc = load_ref("models.transformer.util.misc")
    pe = ref.PositionEmbeddingSine_3D(256, normalize=True)
    t = torch.zeros((*mask_np.shape, 1))  # only device/dtype are read from x
    x = torch.zeros(mask_np.shape[0], 256, *mask_np.shape[1:])
    nt = misc.NestedTensor(x, torch.from_numpy(mask_np))
    with torch.no_grad():
        return pe(nt).numpy()  # (B, C, T, H, W)


def test_posenc_matches_reference_no_padding(rng):
    mask = np.zeros((2, 4, 5, 6), dtype=bool)
    ref_out = _ref_posenc(mask)
    ours = np.asarray(position_embedding_sine_3d(~mask, 256))
    ours_cf = np.transpose(ours, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_cf, ref_out, rtol=1e-4, atol=5e-4)


def test_posenc_matches_reference_with_padding(rng):
    mask = np.zeros((2, 4, 8, 8), dtype=bool)
    mask[0, :, 5:, :] = True   # bottom rows padded
    mask[1, :, :, 6:] = True   # right columns padded
    ref_out = _ref_posenc(mask)
    ours = np.asarray(position_embedding_sine_3d(~mask, 256))
    ours_cf = np.transpose(ours, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_cf, ref_out, rtol=1e-4, atol=5e-4)


def test_positional_encoding_1d_matches_reference():
    ref = load_ref("models.transformer.transformer_layers")
    pe_mod = ref.PositionalEncoding(128, dropout=0.0, max_len=64)
    ref_pe = pe_mod.pe.squeeze(1).numpy()  # (max_len, d)
    ours = np.asarray(positional_encoding_1d(64, 128))
    np.testing.assert_allclose(ours, ref_pe, rtol=1e-4, atol=2e-4)
