"""Streaming KV-cache attention: parity with the reference online_inference
first-pass math, and self-consistency of the rolling window.

Note: the reference's *subsequent-call* cache update (transformer_layers.py
:250-271) re-projects v with the bias it omitted on the first call — an
inconsistency in code the shipped models never exercise (the LFB/streaming
model is not released, SURVEY §5.7). We verify our rolling step against a
full-window recompute instead of replicating that defect.
"""

import numpy as np
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.ops import streaming
from tubelet_transformer_tpu.train import torch_convert as tc

E, H, B, Q, W = 64, 4, 2, 3, 6


def _setup(rng):
    ref_tl = load_ref("models.transformer.transformer_layers")
    torch.manual_seed(0)
    ref = ref_tl.MultiheadAttention(E, H, dropout=0.0)
    ref.eval()
    params = tc.mha_params(
        {f"x.{k}": v for k, v in ref.state_dict().items()}, "x")
    q = rng.normal(0, 1, (B, Q, E)).astype(np.float32)
    mem = rng.normal(0, 1, (B, W, E)).astype(np.float32)
    pos = rng.normal(0, 1, (B, W, E)).astype(np.float32)
    return ref, params, q, mem, pos


def test_first_pass_matches_reference(rng):
    ref, params, q, mem, pos = _setup(rng)
    state = streaming.streaming_init(params, H, q, mem, pos)
    out = streaming.streaming_attend(params, H, state)

    with torch.no_grad():
        ref_out, _ = ref.online_inference(
            torch.from_numpy(q).transpose(0, 1),
            torch.from_numpy(mem).transpose(0, 1),
            torch.from_numpy(mem).transpose(0, 1),
            torch.from_numpy(pos).transpose(0, 1))
    ref_out = ref_out.transpose(0, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)


def test_rolling_equals_full_recompute(rng):
    _, params, q, mem, pos = _setup(rng)
    state = streaming.streaming_init(params, H, q, mem, pos)

    toks = rng.normal(0, 1, (4, B, 1, E)).astype(np.float32)
    window = mem.copy()
    for t in range(4):
        out_step, state = streaming.streaming_step(params, H, state, toks[t])
        window = np.concatenate([window[:, 1:], toks[t]], axis=1)
        fresh = streaming.streaming_init(params, H, q, window, pos)
        out_full = streaming.streaming_attend(params, H, fresh)
        np.testing.assert_allclose(np.asarray(out_step), np.asarray(out_full),
                                   rtol=1e-4, atol=1e-5)
