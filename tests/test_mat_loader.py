"""Parity of the Caffe2 ``.mat`` CSN loader: a synthetic .mat with the
reference key scheme is loaded (a) by the reference's own load_weights into
its torch model and (b) by our csn_params_from_mat — outputs must agree."""

import numpy as np
import pytest
import scipy.io as sio
import torch

from ref_loader import load_ref
from tubelet_transformer_tpu.models.csn import CSN
from tubelet_transformer_tpu.train import torch_convert as tc

BLOCKS = (3, 4, 6, 3)  # CSN-50 layout (start_count (0,3,7,13))


def _synth_mat(path, rng):
    """Random weights under the Caffe2 export key scheme
    (ir_CSN_50.py:246-321)."""
    w = {}
    w["conv1_w"] = rng.normal(0, 0.1, (64, 3, 3, 7, 7)).astype(np.float32)

    def put_bn(name, c):
        w[name + "_s"] = rng.normal(1, 0.1, (c, 1)).astype(np.float32)
        w[name + "_b"] = rng.normal(0, 0.1, (c, 1)).astype(np.float32)
        w[name + "_rm"] = rng.normal(0, 0.5, (c, 1)).astype(np.float32)
        w[name + "_riv"] = rng.uniform(0.5, 2.0, (c, 1)).astype(np.float32)

    put_bn("conv1_spatbn_relu", 64)
    in_planes = 64
    count = 0
    for s, blocks in enumerate(BLOCKS):
        planes = 64 * 2 ** s
        for b in range(blocks):
            inp = in_planes if b == 0 else planes * 4
            w[f"comp_{count}_conv_1_w"] = rng.normal(
                0, 0.1, (planes, inp, 1, 1, 1)).astype(np.float32)
            w[f"comp_{count}_conv_3_w"] = rng.normal(
                0, 0.1, (planes, 1, 3, 3, 3)).astype(np.float32)
            w[f"comp_{count}_conv_4_w"] = rng.normal(
                0, 0.1, (planes * 4, planes, 1, 1, 1)).astype(np.float32)
            put_bn(f"comp_{count}_spatbn_1", planes)
            put_bn(f"comp_{count}_spatbn_3", planes)
            put_bn(f"comp_{count}_spatbn_4", planes * 4)
            if b == 0:
                w[f"shortcut_projection_{count}_w"] = rng.normal(
                    0, 0.1, (planes * 4, inp, 1, 1, 1)).astype(np.float32)
                put_bn(f"shortcut_projection_{count}_spatbn", planes * 4)
            count += 1
        in_planes = planes * 4
    sio.savemat(path, w)


def test_mat_loader_parity(tmp_path, rng):
    mat_path = str(tmp_path / "csn50.mat")
    _synth_mat(mat_path, rng)

    ref = load_ref("models.backbones.ir_CSN_50")
    torch.manual_seed(0)
    model = ref.ResNeXt(ref.ResNeXtBottleneck, sample_size=64,
                        sample_duration=8, block_nums=list(BLOCKS),
                        use_affine=False, last_stride=True)
    ref.load_weights(model, mat_path, load_fc=False, use_affine=False,
                     tune_point=4)
    model.eval()

    params, stats = tc.csn_params_from_mat(mat_path, BLOCKS)
    ours = CSN(block_nums=BLOCKS, last_stride=True)

    x = rng.normal(0, 1, (1, 8, 32, 32, 3)).astype(np.float32)
    out = np.asarray(ours.apply({"params": params, "batch_stats": stats},
                                x, train=False))
    with torch.no_grad():
        ref_out, _ = model(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)
