"""TubeR-TPU: a TPU-native spatio-temporal action-detection framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
amazon-science/tubelet-transformer (TubeR, CVPR 2022): irCSN-50/152 3D-CNN
backbones feeding a DETR-style transformer over tubelet queries, Hungarian-
matched set losses, and AVA / JHMDB / UCF24 detection evaluation.

Unlike the PyTorch/DDP/NCCL reference, everything here is designed for TPU:
  * functional flax.linen models compiled with jit/pjit over a
    ``jax.sharding.Mesh`` (data-parallel over ICI; XLA emits the collectives),
  * static shapes end-to-end (padded boxes + validity masks instead of
    per-sample Python lists),
  * the Hungarian assignment solved *on device* inside the training step
    (the reference round-trips to scipy on CPU every step),
  * collective-based distributed evaluation (the reference exchanges results
    through per-rank text files on a shared filesystem).
"""

__version__ = "0.1.0"
