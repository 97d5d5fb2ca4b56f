from tubelet_transformer_tpu.ops import box_ops, position_encoding  # noqa: F401
