from tubelet_transformer_tpu.models.tuber import TubeR, build_model  # noqa: F401
