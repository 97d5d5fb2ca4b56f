"""Generic video-classification trainer.

Counterpart of the reference's ``train_classification``
(``utils/video_action_recognition.py:26-75``) — unused by the reference's
entry points but part of its loop surface, so rebuilt live and TPU-first:
the per-iteration body (forward + CE + backward + step) is one compiled XLA
program over the data mesh instead of the reference's eager loop, and the
observability contract (AverageMeters, rank-0 display every
``LOG.DISPLAY_FREQ`` steps, scalar tags ``train_loss_iteration`` /
``train_batch_size_iteration`` / ``learning_rate``) is kept tag-for-tag.

``VideoClassifier`` is the matching model surface: the irCSN trunk
(models/csn.py) + global average pool + linear head — the classification use
the reference's ``image_classification_config.py`` tree provisions for
(that file is byte-identical to the action config, so our single typed
``Config`` serves both; see PARITY.md).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.core import FrozenDict

from tubelet_transformer_tpu.models.csn import build_csn
from tubelet_transformer_tpu.train.engine import TrainState
from tubelet_transformer_tpu.utils import AverageMeter, MetricsWriter


class VideoClassifier(nn.Module):
    """irCSN trunk -> global average pool -> linear logits head."""

    backbone_name: str = "CSN-50"
    num_classes: int = 400
    last_stride: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clips: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """clips: (B, T, H, W, 3) -> logits (B, num_classes)."""
        trunk = build_csn(self.backbone_name, self.last_stride,
                          dtype=self.dtype, stem_kernel=False)
        feats = trunk(clips, train=train)            # (B, T', H', W', C)
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2, 3))
        return nn.Dense(self.num_classes, name="head")(pooled)


def create_classifier_state(model: VideoClassifier, rng, sample_clips,
                            tx) -> TrainState:
    variables = jax.jit(
        lambda r: model.init({"params": r}, sample_clips, train=False))(rng)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", FrozenDict()),
                      opt_state=tx.init(params))


def make_classification_train_step(model: VideoClassifier, tx) -> Callable:
    """One XLA program: forward + CE + grad + optimizer update."""

    @jax.jit
    def step(state: TrainState, clips, labels):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mut = model.apply(variables, clips, train=True,
                                      mutable=["batch_stats"])
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels))
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = state.replace(step=state.step + 1, params=params,
                            opt_state=opt_state,
                            batch_stats=mut.get("batch_stats",
                                                state.batch_stats))
        return new, loss

    return step


def train_classification(base_iter: int, state: TrainState, train_step,
                         loader, epoch: int, display_freq: int = 20,
                         lr_fn: Optional[Callable[[int], float]] = None,
                         writer: Optional[MetricsWriter] = None,
                         is_main: bool = True):
    """One classification epoch (reference video_action_recognition.py:26-75).

    ``loader`` yields dicts (or pairs) with ``clips`` (B, T, H, W, 3) and
    integer ``labels`` (B,). Returns (base_iter, state) — the reference
    returns only base_iter; the state must travel too in a functional world.
    """
    batch_time = AverageMeter("batch_time")
    data_time = AverageMeter("data_time")
    losses = AverageMeter("loss")

    n = len(loader) if hasattr(loader, "__len__") else None
    end = time.time()
    for step_i, data in enumerate(loader):
        base_iter += 1
        if isinstance(data, dict):
            clips, labels = data["clips"], data["labels"]
        else:
            clips, labels = data
        data_time.update(time.time() - end)

        state, loss = train_step(state, jnp.asarray(clips),
                                 jnp.asarray(labels))
        # loss stays a device future between display steps: a per-step
        # float() fetch costs a ~30 ms relay round trip and serializes
        # the pipeline (same policy as loop.train_one_epoch)
        if step_i % display_freq == 0:
            losses.update(float(loss), len(labels))

        batch_time.update(time.time() - end)
        end = time.time()
        if step_i % display_freq == 0 and is_main:
            lr = lr_fn(base_iter) if lr_fn else float("nan")
            total = f"/{n}" if n is not None else ""
            print("-" * 55)
            print(f"lr:  {lr}")
            print(f"Epoch: [{epoch}][{step_i + 1}{total}]")
            print(f"data_time: {data_time.val:.3f}, "
                  f"batch time: {batch_time.val:.3f}")
            print(f"loss: {losses.avg:.5f}")
            if writer is not None:
                writer.add_scalar("train_loss_iteration", losses.avg,
                                  base_iter)
                writer.add_scalar("train_batch_size_iteration", len(labels),
                                  base_iter)
                writer.add_scalar("learning_rate", lr, base_iter)
    return base_iter, state
