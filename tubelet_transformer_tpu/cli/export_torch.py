"""CLI: export a checkpoint to the reference's ``.pth`` format.

Usage:
  python -m tubelet_transformer_tpu.cli.export_torch \
      --config-file <yaml> --out tuber_export.pth

Weights come from ``MODEL.PRETRAINED_PATH`` (an orbax training checkpoint
directory or a ``.pth``), exactly as the eval CLIs load them. The output is
``{"model": {module.<reference names>: tensors}}`` — loadable by the
reference's ``utils/model_utils.py:load_model`` — so work trained in this
framework flows back to reference users (the reverse of our three foreign
checkpoint readers, SURVEY §5.4).
"""

import argparse

from tubelet_transformer_tpu.config import load_config


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Export TubeR-TPU weights to reference .pth format")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--out", default="tuber_export.pth")
    parser.add_argument("--no-ddp-prefix", action="store_true",
                        help="emit bare module names (no 'module.' prefix)")
    args = parser.parse_args()

    import numpy as np

    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import checkpoint as ckpt_lib
    from tubelet_transformer_tpu.train.torch_convert import export_tuber_pth

    cfg = load_config(args.config_file)
    if not (cfg.model.load and cfg.model.pretrained_path):
        raise ValueError("export requires MODEL.LOAD with PRETRAINED_PATH")
    # export always materializes the sequential per-layer encoder layout;
    # a pipeline-parallel (stacked) checkpoint unstacks inside
    # load_pretrained, so the PP mesh knob is irrelevant here
    cfg.mesh.pipe = 1
    if cfg.model.moe_experts > 0:
        # the reference encoder FFN is dense linear1/linear2; MoE expert
        # stacks and the router have no slot in its state dict
        raise NotImplementedError(
            "cannot export a MODEL.MOE_EXPERTS checkpoint to reference "
            "format: the reference transformer has no MoE module; export "
            "a dense-FFN model instead")
    if cfg.use_lfb:
        # the reference model has no LFB fusion modules, so lfb_proj/
        # lfb_attn/lfb_norm cannot be represented in its state dict —
        # exporting would silently drop the trained long-term-context path
        raise NotImplementedError(
            "cannot export a USE_LFB checkpoint to reference format: the "
            "reference ships no LFB module to receive the fusion weights; "
            "export the base model (USE_LFB: false) instead")

    import jax

    model = build_model(cfg)
    clips = np.zeros((1, cfg.data.temp_len, cfg.data.img_size,
                      cfg.data.img_size, 3), np.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, clips, train=False)
    )(jax.random.PRNGKey(0))
    variables = {"params": jax.device_get(variables["params"]),
                 "batch_stats": jax.device_get(
                     variables.get("batch_stats", {}))}
    variables = ckpt_lib.load_pretrained(cfg, variables)
    out = export_tuber_pth(args.out, variables["params"],
                           variables["batch_stats"], cfg,
                           ddp_prefix=not args.no_ddp_prefix)
    print(f"exported reference-format checkpoint to {out}")


if __name__ == "__main__":
    main()
