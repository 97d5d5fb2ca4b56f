"""Name-mapped conversion of reference checkpoints to flax param pytrees.

Three foreign formats are supported (SURVEY §5.4), all load-bearing for
reproducing the published numbers:

  1. Caffe2 CSN ``.mat`` backbone exports (``conv1_w``, ``comp_N_conv_i_w``,
     ``shortcut_projection_N_w``, BN ``_s/_b/_rm/_riv`` — key scheme at
     reference ir_CSN_152.py:242-318) -> ``csn_params_from_mat``.
  2. COCO DETR ``detr.pth`` transformer seed (utils/model_utils.py:10-36)
     -> ``seed_from_detr_state``.
  3. Released TubeR training checkpoints (``ckpt['model']`` with DDP
     ``module.`` prefixes) -> ``tuber_params_from_torch_state``.

Tensor layout conventions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out): .T
  torch Conv3d weight (O, I/g, t, h, w)-> flax Conv kernel (t, h, w, I/g, O)
  torch MultiheadAttention in_proj_weight (3E, E) -> our 'in_proj' (E, 3E)
  torch BatchNorm {weight,bias,running_mean,running_var}
      -> flax {scale,bias} + batch_stats {mean,var}

Values are converted exactly (fp32); no resampling or renormalization.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def t_conv3d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def t_conv2d(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def conv2d_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"kernel": t_conv2d(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def gn_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def mh_attention_map_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference MHAttentionMap (segmentation.py:140-156) -> our module."""
    return {"q_linear": dense_params(sd, f"{prefix}.q_linear"),
            "k_linear": dense_params(sd, f"{prefix}.k_linear")}


def mask_head_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference MaskHeadSmallConv (segmentation.py:75-100) -> our module."""
    p: Dict[str, Any] = {}
    for i in range(1, 6):
        p[f"lay{i}"] = conv2d_params(sd, f"{prefix}.lay{i}")
        p[f"gn{i}"] = gn_params(sd, f"{prefix}.gn{i}")
    for i in range(1, 4):
        p[f"adapter{i}"] = conv2d_params(sd, f"{prefix}.adapter{i}")
    p["out_lay"] = conv2d_params(sd, f"{prefix}.out_lay")
    return p


def mha_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch (custom or nn.) MultiheadAttention -> our MultiHeadAttention."""
    return {
        "in_proj": t_linear(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": np.asarray(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": {
            "kernel": t_linear(sd[f"{prefix}.out_proj.weight"]),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def dense_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"kernel": t_linear(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def ln_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def bn_params(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def encoder_layer_params(sd, prefix) -> Dict[str, Any]:
    return {
        "self_attn": mha_params(sd, f"{prefix}.self_attn"),
        "linear1": dense_params(sd, f"{prefix}.linear1"),
        "linear2": dense_params(sd, f"{prefix}.linear2"),
        "norm1": ln_params(sd, f"{prefix}.norm1"),
        "norm2": ln_params(sd, f"{prefix}.norm2"),
    }


def decoder_layer_params(sd, prefix) -> Dict[str, Any]:
    p = encoder_layer_params(sd, prefix)
    p["multihead_attn"] = mha_params(sd, f"{prefix}.multihead_attn")
    p["norm3"] = ln_params(sd, f"{prefix}.norm3")
    return p


def factorized_layer_params(sd, prefix) -> Dict[str, Any]:
    return {
        "self_attn_t": mha_params(sd, f"{prefix}.self_attn_t"),
        "self_attn_s": mha_params(sd, f"{prefix}.self_attn_s"),
        "norm1_t": ln_params(sd, f"{prefix}.norm1_t"),
        "norm1_s": ln_params(sd, f"{prefix}.norm1_s"),
        "norm2": ln_params(sd, f"{prefix}.norm2"),
        "linear1": dense_params(sd, f"{prefix}.linear1"),
        "linear2": dense_params(sd, f"{prefix}.linear2"),
    }


def lstr_layer_params(sd, prefix) -> Dict[str, Any]:
    return {
        "self_attn": mha_params(sd, f"{prefix}.self_attn"),
        "multihead_attn": mha_params(sd, f"{prefix}.multihead_attn"),
        "linear1": dense_params(sd, f"{prefix}.linear1"),
        "linear2": dense_params(sd, f"{prefix}.linear2"),
        "norm1": ln_params(sd, f"{prefix}.norm1"),
        "norm2": ln_params(sd, f"{prefix}.norm2"),
        "norm3": ln_params(sd, f"{prefix}.norm3"),
    }


def mlp_params(sd, prefix, num_layers=3) -> Dict[str, Any]:
    return {f"layers_{i}": dense_params(sd, f"{prefix}.layers.{i}")
            for i in range(num_layers)}


def conv_bn(sd, conv_prefix, bn_prefix) -> Tuple[Dict, Dict, Dict]:
    conv = {"kernel": t_conv3d(sd[f"{conv_prefix}.weight"])}
    bnp, bns = bn_params(sd, bn_prefix)
    return conv, bnp, bns


# ---------------------------------------------------------------------------
# CSN torch state_dict -> flax (used for parity tests and .pth loading)
# ---------------------------------------------------------------------------

def csn_params_from_torch_state(
    sd: Mapping[str, Any], block_nums, prefix: str = ""
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ResNeXt state-dict (ir_CSN_*.py module names) -> our CSN tree."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = {"kernel": t_conv3d(sd[f"{prefix}conv1.weight"])}
    params["bn1"], stats["bn1"] = bn_params(sd, f"{prefix}bn1")
    for s, blocks in enumerate(block_nums):
        for b in range(blocks):
            rp = f"{prefix}layer{s + 1}.{b}"
            name = f"layer{s + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for conv in ("conv1", "conv3", "conv4"):
                bn = "bn" + conv[-1]
                blk_p[conv] = {"kernel": t_conv3d(sd[f"{rp}.{conv}.weight"])}
                blk_p[bn], blk_s[bn] = bn_params(sd, f"{rp}.{bn}")
            if b == 0:
                blk_p["downsample_conv"] = {
                    "kernel": t_conv3d(sd[f"{rp}.down_sample.0.weight"])}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn_params(
                    sd, f"{rp}.down_sample.1")
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


# ---------------------------------------------------------------------------
# CSN Caffe2 .mat -> flax
# ---------------------------------------------------------------------------

# Per-stage starting block index in the flat Caffe2 numbering
# (ir_CSN_152.py:269 / ir_CSN_50.py:272).
MAT_START_COUNT = {
    (3, 8, 36, 3): (0, 3, 11, 47),   # CSN-152
    (3, 4, 6, 3): (0, 3, 7, 13),     # CSN-50
}


def csn_params_from_mat(path: str, block_nums) -> Tuple[Dict, Dict]:
    """Load a Caffe2 CSN ``.mat`` export into our CSN param/batch_stats trees."""
    import scipy.io as sio

    w = sio.loadmat(path)
    block_nums = tuple(block_nums)
    start = MAT_START_COUNT[block_nums]

    def bn_from(name):
        return (
            {"scale": np.asarray(w[name + "_s"]).reshape(-1),
             "bias": np.asarray(w[name + "_b"]).reshape(-1)},
            {"mean": np.asarray(w[name + "_rm"]).reshape(-1),
             "var": np.asarray(w[name + "_riv"]).reshape(-1)},
        )

    params: Dict[str, Any] = {"conv1": {"kernel": t_conv3d(w["conv1_w"])}}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn_from("conv1_spatbn_relu")

    for s, blocks in enumerate(block_nums):
        count = start[s]
        for b in range(blocks):
            name = f"layer{s + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for conv_i, conv in (("1", "conv1"), ("3", "conv3"), ("4", "conv4")):
                blk_p[conv] = {
                    "kernel": t_conv3d(w[f"comp_{count}_conv_{conv_i}_w"])}
                blk_p[f"bn{conv_i}"], blk_s[f"bn{conv_i}"] = bn_from(
                    f"comp_{count}_spatbn_{conv_i}")
            if b == 0:
                blk_p["downsample_conv"] = {
                    "kernel": t_conv3d(w[f"shortcut_projection_{count}_w"])}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn_from(
                    f"shortcut_projection_{count}_spatbn")
            params[name] = blk_p
            stats[name] = blk_s
            count += 1
    return params, stats


# ---------------------------------------------------------------------------
# Full TubeR torch state_dict -> flax variables
# ---------------------------------------------------------------------------

def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DDP ``module.`` prefix (model_utils.py:20-25)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def tuber_params_from_torch_state(
    sd: Mapping[str, Any], *, block_nums, enc_layers: int = 6,
    dec_layers: int = 6,
    temporal_ds_strategy: str = "decode", single_frame: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Released TubeR ``.pth`` (reference module names) -> our variables.

    Returns (params, batch_stats) trees matching models/tuber.py naming.
    """
    sd = strip_module_prefix(sd)

    params: Dict[str, Any] = {}
    bb_params, bb_stats = csn_params_from_torch_state(
        sd, block_nums, prefix="backbone.body.")
    params["backbone"] = bb_params
    batch_stats = {"backbone": bb_stats}

    params["query_embed"] = np.asarray(sd["query_embed.weight"])
    # 1x1x1 Conv3d (O, I, 1, 1, 1) -> Dense kernel (I, O).
    for ours, theirs in (("input_proj", "input_proj"),
                         ("class_proj", "class_proj")):
        wt = np.asarray(sd[f"{theirs}.weight"])[:, :, 0, 0, 0]
        params[ours] = {"kernel": t_linear(wt),
                        "bias": np.asarray(sd[f"{theirs}.bias"])}

    tr: Dict[str, Any] = {}
    for i in range(enc_layers):
        tr[f"encoder_layer_{i}"] = encoder_layer_params(
            sd, f"transformer.encoder.layers.{i}")
    for i in range(dec_layers):
        tr[f"decoder_layer_{i}"] = decoder_layer_params(
            sd, f"transformer.decoder.layers.{i}")
    tr["decoder_norm"] = ln_params(sd, "transformer.decoder.norm")
    params["transformer"] = tr

    params["encoder"] = factorized_layer_params(sd, "encoder.layers.0")
    params["cross_attn"] = mha_params(sd, "cross_attn")
    params["class_embed_b"] = dense_params(sd, "class_embed_b")
    params["class_fc"] = dense_params(sd, "class_fc")
    params["bbox_embed"] = mlp_params(sd, "bbox_embed")

    if single_frame and temporal_ds_strategy == "decode":
        params["pool_query"] = np.asarray(sd["backbone.query_pool.weight"])
        params["pool_decoder"] = lstr_layer_params(
            sd, "backbone.pool_decoder.layers.0")
        params["pool_norm"] = ln_params(sd, "backbone.pool_decoder.norm")

    return params, batch_stats


# ---------------------------------------------------------------------------
# Export: our variables -> reference-format torch state dict / .pth
# ---------------------------------------------------------------------------
# Inverse of ``tuber_params_from_torch_state``: lets a reference user load
# weights trained in this framework through the reference's own
# ``utils/model_utils.py:load_model`` (which intersect-loads ``ckpt['model']``
# against the DDP ``module.``-prefixed state dict). The reference CSN's dead
# ``out_fc`` head (never called in forward, ir_CSN_50.py:184-186) is not
# emitted; intersect-loading skips it.

def _inv_linear(k) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(k, np.float32).T)


def _inv_conv3d(k) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(np.asarray(k, np.float32), (4, 3, 0, 1, 2)))


def _put_dense(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = _inv_linear(p["kernel"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _put_ln(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    out[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _put_bn(out: Dict, prefix: str, p: Mapping, s: Mapping) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    out[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"], np.float32)
    out[f"{prefix}.running_var"] = np.asarray(s["var"], np.float32)
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_mha(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.in_proj_weight"] = _inv_linear(p["in_proj"])
    out[f"{prefix}.in_proj_bias"] = np.asarray(p["in_proj_bias"], np.float32)
    _put_dense(out, f"{prefix}.out_proj", p["out_proj"])


def _put_encoder_layer(out: Dict, prefix: str, p: Mapping) -> None:
    _put_mha(out, f"{prefix}.self_attn", p["self_attn"])
    _put_dense(out, f"{prefix}.linear1", p["linear1"])
    _put_dense(out, f"{prefix}.linear2", p["linear2"])
    _put_ln(out, f"{prefix}.norm1", p["norm1"])
    _put_ln(out, f"{prefix}.norm2", p["norm2"])


def _put_decoder_layer(out: Dict, prefix: str, p: Mapping) -> None:
    _put_encoder_layer(out, prefix, p)
    _put_mha(out, f"{prefix}.multihead_attn", p["multihead_attn"])
    _put_ln(out, f"{prefix}.norm3", p["norm3"])


def tuber_torch_state_from_params(
    params: Mapping[str, Any], batch_stats: Mapping[str, Any], *,
    block_nums, enc_layers: int = 6, dec_layers: int = 6,
    temporal_ds_strategy: str = "decode", single_frame: bool = True,
    ddp_prefix: bool = True,
) -> Dict[str, np.ndarray]:
    """Our (params, batch_stats) -> reference module-named state dict.

    ``ddp_prefix`` adds the ``module.`` prefix the released checkpoints
    carry (saved from DDP-wrapped models, model_utils.py:20-25).
    """
    sd: Dict[str, np.ndarray] = {}

    bb_p, bb_s = params["backbone"], batch_stats["backbone"]
    sd["backbone.body.conv1.weight"] = _inv_conv3d(bb_p["conv1"]["kernel"])
    _put_bn(sd, "backbone.body.bn1", bb_p["bn1"], bb_s["bn1"])
    for s, blocks in enumerate(tuple(block_nums)):
        for b in range(blocks):
            name = f"layer{s + 1}_{b}"
            rp = f"backbone.body.layer{s + 1}.{b}"
            blk_p, blk_s = bb_p[name], bb_s[name]
            for conv in ("conv1", "conv3", "conv4"):
                bn = "bn" + conv[-1]
                sd[f"{rp}.{conv}.weight"] = _inv_conv3d(
                    blk_p[conv]["kernel"])
                _put_bn(sd, f"{rp}.{bn}", blk_p[bn], blk_s[bn])
            if b == 0:
                sd[f"{rp}.down_sample.0.weight"] = _inv_conv3d(
                    blk_p["downsample_conv"]["kernel"])
                _put_bn(sd, f"{rp}.down_sample.1",
                        blk_p["downsample_bn"], blk_s["downsample_bn"])

    sd["query_embed.weight"] = np.asarray(params["query_embed"], np.float32)
    for ours, theirs in (("input_proj", "input_proj"),
                         ("class_proj", "class_proj")):
        # Dense kernel (I, O) -> 1x1x1 Conv3d weight (O, I, 1, 1, 1)
        sd[f"{theirs}.weight"] = _inv_linear(
            params[ours]["kernel"])[:, :, None, None, None]
        sd[f"{theirs}.bias"] = np.asarray(params[ours]["bias"], np.float32)

    tr = params["transformer"]
    for i in range(enc_layers):
        _put_encoder_layer(sd, f"transformer.encoder.layers.{i}",
                           tr[f"encoder_layer_{i}"])
    for i in range(dec_layers):
        _put_decoder_layer(sd, f"transformer.decoder.layers.{i}",
                           tr[f"decoder_layer_{i}"])
    _put_ln(sd, "transformer.decoder.norm", tr["decoder_norm"])

    fe = params["encoder"]
    _put_mha(sd, "encoder.layers.0.self_attn_t", fe["self_attn_t"])
    _put_mha(sd, "encoder.layers.0.self_attn_s", fe["self_attn_s"])
    _put_ln(sd, "encoder.layers.0.norm1_t", fe["norm1_t"])
    _put_ln(sd, "encoder.layers.0.norm1_s", fe["norm1_s"])
    _put_ln(sd, "encoder.layers.0.norm2", fe["norm2"])
    _put_dense(sd, "encoder.layers.0.linear1", fe["linear1"])
    _put_dense(sd, "encoder.layers.0.linear2", fe["linear2"])

    _put_mha(sd, "cross_attn", params["cross_attn"])
    _put_dense(sd, "class_embed_b", params["class_embed_b"])
    _put_dense(sd, "class_fc", params["class_fc"])
    for i in range(3):
        _put_dense(sd, f"bbox_embed.layers.{i}",
                   params["bbox_embed"][f"layers_{i}"])

    if single_frame and temporal_ds_strategy == "decode":
        sd["backbone.query_pool.weight"] = np.asarray(
            params["pool_query"], np.float32)
        lp = params["pool_decoder"]
        _put_mha(sd, "backbone.pool_decoder.layers.0.self_attn",
                 lp["self_attn"])
        _put_mha(sd, "backbone.pool_decoder.layers.0.multihead_attn",
                 lp["multihead_attn"])
        _put_dense(sd, "backbone.pool_decoder.layers.0.linear1",
                   lp["linear1"])
        _put_dense(sd, "backbone.pool_decoder.layers.0.linear2",
                   lp["linear2"])
        _put_ln(sd, "backbone.pool_decoder.layers.0.norm1", lp["norm1"])
        _put_ln(sd, "backbone.pool_decoder.layers.0.norm2", lp["norm2"])
        _put_ln(sd, "backbone.pool_decoder.layers.0.norm3", lp["norm3"])
        _put_ln(sd, "backbone.pool_decoder.norm", params["pool_norm"])

    if ddp_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def export_tuber_pth(path: str, params, batch_stats, cfg,
                     ddp_prefix: bool = True) -> str:
    """Write a reference-format ``.pth`` ({"model": state_dict}) from our
    trained variables; loadable by the reference's ``load_model``."""
    import jax
    import torch

    from tubelet_transformer_tpu.models.csn import BLOCK_NUMS

    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    sd = tuber_torch_state_from_params(
        params, batch_stats,
        block_nums=BLOCK_NUMS[cfg.model.backbone_name],
        enc_layers=cfg.model.enc_layers, dec_layers=cfg.model.dec_layers,
        temporal_ds_strategy=cfg.model.temporal_ds_strategy,
        single_frame=cfg.model.single_frame, ddp_prefix=ddp_prefix)
    # copy: jax.device_get leaves can be non-writable views, which torch
    # tensors must not alias
    torch.save({"model": {k: torch.from_numpy(np.array(v, copy=True))
                          for k, v in sd.items()}}, path)
    return path


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth`` checkpoint into numpy arrays (CPU torch as dev tool)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
