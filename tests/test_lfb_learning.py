"""LFB learning evidence: the long-term-context fusion can carry
label-relevant information from the memory bank into the action logits.

The reference advertises "+long-term context" as a trained capability
(+~2 mAP, README.md:16-26) but ships no bank; our implementation
(models/tuber.py lfb_attn fusion + eval/lfb.py bank) is mechanically tested
in test_lfb.py. This test supplies the missing *learning* evidence on a
synthetic task: clips are pure noise, the true labels are readable only
from the supplied lfb memory. A model trained WITH the bank must drive the
classification loss far below one trained with an all-padded (hence
unused) bank — i.e. gradients flow through the fusion path and the model
learns to exploit long-term context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from test_lfb import _cfg
from tubelet_transformer_tpu.models.tuber import build_model

B, T, IMG, C, L_MEM, E_MEM = 8, 8, 32, 5, 6, 32


def _train(use_bank: bool, steps: int = 60) -> float:
    """Copy-from-memory task: every step draws FRESH random labels, clips
    are constant noise, and the labels are encoded only in the lfb memory.
    Without the bank the best possible loss is chance BCE (~0.693); with
    the bank the model must learn to read the labels out of the memory."""
    rng = np.random.default_rng(0)
    cfg = _cfg(use_lfb=True)
    model = build_model(cfg)

    clips = jnp.asarray(rng.normal(0, 0.3, (B, T, IMG, IMG, 3)), jnp.float32)
    proj = jnp.asarray(rng.normal(0, 1, (C, E_MEM)), jnp.float32)
    if use_bank:
        mask = jnp.zeros((B, L_MEM), bool)           # all rows valid
    else:
        mask = jnp.ones((B, L_MEM), bool)            # all padded -> unused

    mem0 = jnp.zeros((B, L_MEM, E_MEM), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, clips,
                           train=False, lfb_features=mem0, lfb_mask=mask)
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, i):
        key = jax.random.fold_in(jax.random.PRNGKey(42), i)
        labels = jax.random.bernoulli(key, 0.5, (B, C)).astype(jnp.float32)
        mem = jnp.tile((labels @ proj)[:, None, :], (1, L_MEM, 1))

        def loss_fn(p):
            out = model.apply({"params": p, **others}, clips, train=False,
                              lfb_features=mem, lfb_mask=mask)
            logits = out["pred_logits"].mean(axis=1)  # (B, C) over queries
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, i)
        losses.append(float(loss))
    return float(np.mean(losses[-5:]))  # tail average, fresh labels each


def test_lfb_bank_carries_labels():
    with_bank = _train(use_bank=True)
    without_bank = _train(use_bank=False)
    # chance BCE on fresh random labels is ln(2) ~ 0.693: the no-bank
    # control cannot beat it, the bank path must
    assert without_bank > 0.5, without_bank
    assert with_bank < 0.6 * without_bank, (with_bank, without_bank)
