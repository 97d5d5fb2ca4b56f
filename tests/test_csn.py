"""Parity: flax irCSN backbone vs the reference torch ResNeXt (random init,
weights copied), eval and train BN modes."""

import numpy as np
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.models.csn import CSN
from tubelet_transformer_tpu.train import torch_convert as tc

BLOCKS = (1, 1, 2, 1)  # tiny CSN for test speed (same topology rules)


def _build_ref(last_stride=True):
    ref = load_ref("models.backbones.ir_CSN_152")
    torch.manual_seed(0)
    model = ref.ResNeXt(ref.ResNeXtBottleneck, sample_size=64,
                        sample_duration=8, block_nums=list(BLOCKS),
                        use_affine=False, last_stride=last_stride)
    # randomize BN running stats so eval-mode parity is a real check
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return model


def _ours_from_ref(model, last_stride=True):
    params, stats = tc.csn_params_from_torch_state(
        model.state_dict(), BLOCKS)
    ours = CSN(block_nums=BLOCKS, last_stride=last_stride)
    return ours, {"params": params, "batch_stats": stats}


def test_csn_eval_parity(rng):
    for last_stride in (True, False):
        model = _build_ref(last_stride)
        model.eval()
        ours, variables = _ours_from_ref(model, last_stride)

        x = rng.normal(0, 1, (1, 8, 64, 64, 3)).astype(np.float32)
        out = np.asarray(ours.apply(variables, x, train=False))
        with torch.no_grad():
            ref_out, _ = model(torch.from_numpy(
                x.transpose(0, 4, 1, 2, 3)))   # (B, C, T, H, W)
        ref_out = ref_out.numpy().transpose(0, 2, 3, 4, 1)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)


def test_csn_train_mode_parity(rng):
    """Train mode uses batch statistics; outputs must still agree."""
    model = _build_ref()
    model.train()
    ours, variables = _ours_from_ref(model)

    x = rng.normal(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    out, new_vars = ours.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    with torch.no_grad():
        ref_out, _ = model(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-3)

    # Running-stat update parity on the stem BN (momentum semantics).
    ref_mean = model.bn1.running_mean.numpy()
    our_mean = np.asarray(new_vars["batch_stats"]["bn1"]["mean"])
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-3, atol=1e-4)


def test_frozen_chunk_matches_sequential_composition(rng):
    """TRAIN.FROZEN_CHUNK semantics: the chunked frozen prefix must equal
    running the unchunked model on each chunk in sequence — per-chunk
    batch statistics for normalization, sequential EMA chaining for the
    running stats (the reference recipe's unsynced per-GPU BN at per-GPU
    batch = chunk)."""
    import jax

    x = rng.normal(0, 1, (4, 4, 32, 32, 3)).astype(np.float32)
    blocks = (1, 1, 0, 0)
    base = CSN(block_nums=blocks, last_stride=True, stem_kernel=False,
               stop_grad_stage=5)          # whole trunk frozen
    variables = base.init(jax.random.PRNGKey(0), x[:1], train=False)

    chunked = CSN(block_nums=blocks, last_stride=True, stem_kernel=False,
                  stop_grad_stage=5, frozen_chunk=2)
    out_c, st_c = chunked.apply(variables, x, train=True,
                                mutable=["batch_stats"])

    y0, s0 = base.apply(variables, x[:2], train=True,
                        mutable=["batch_stats"])
    y1, s1 = base.apply({"params": variables["params"], **s0}, x[2:],
                        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_c[:2]), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c[2:]), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        st_c["batch_stats"], s1["batch_stats"])


def test_frozen_chunk_partial_freeze_grads(rng):
    """With a partial freeze (stop_grad_stage=1) the chunked prefix covers
    stem+layer1 only; layer2+ run full-batch. Gradients: zero for every
    prefix param, nonzero for the trainable suffix."""
    import jax
    import jax.numpy as jnp

    x = rng.normal(0, 1, (4, 4, 32, 32, 3)).astype(np.float32)
    blocks = (1, 1, 0, 0)
    model = CSN(block_nums=blocks, last_stride=True, stem_kernel=False,
                stop_grad_stage=1, frozen_chunk=2)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        gn = float(jnp.sum(jnp.abs(g)))
        frozen = name.startswith(("conv1", "bn1", "layer1_"))
        if frozen:
            assert gn == 0.0, f"frozen param {name} got grad {gn}"
        else:
            assert gn > 0.0, f"trainable param {name} has zero grad"
