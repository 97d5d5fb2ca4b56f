"""Learning-rate schedules (per-step closures for optax).

Reproduces the three policies the reference entry points use:
  * 'step': torch MultiStepLR stepped per epoch (train_tuber_ava.py:61-62 —
    NB the reference hardcodes milestones [30, 60]/0.1 and ignores the YAML's
    LR_MILESTONE; we honour the config values instead, defaulting to the
    same hardcoded ones).
  * 'cosine': timm CosineLRScheduler per-iteration (utils/lr_scheduler.py:
    20-31): linear warmup from warmup_start_lr, then cosine on the *absolute*
    step count (timm warmup_prefix=False) down to min_lr.
  * 'linear': the custom LinearLRScheduler (utils/lr_scheduler.py:92-141):
    linear warmup then linear decay to lr * lr_min_rate.
"""

from __future__ import annotations

import jax.numpy as jnp


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int):
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        k = jnp.sum(epoch >= ms)
        return base_lr * gamma ** k

    return fn


def cosine_schedule(base_lr: float, min_lr: float, total_steps: int,
                    warmup_steps: int, warmup_start_lr: float):
    def fn(step):
        # clamp: steps past the horizon (resume with a shorter config,
        # changed steps_per_epoch) hold min_lr — unclamped, the cosine
        # would climb back toward base_lr (timm cycle_limit=1 semantics)
        step = jnp.minimum(jnp.asarray(step, jnp.float32),
                           float(total_steps))
        warm = warmup_start_lr + step * (
            (base_lr - warmup_start_lr) / jnp.maximum(warmup_steps, 1))
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * step / jnp.maximum(total_steps, 1)))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def linear_schedule(base_lr: float, total_steps: int, warmup_steps: int,
                    warmup_start_lr: float, lr_min_rate: float = 0.01):
    def fn(step):
        # clamp: past the horizon the unclamped line goes NEGATIVE, which
        # would silently flip updates into gradient ascent
        step = jnp.minimum(jnp.asarray(step, jnp.float32),
                           float(total_steps))
        warm = warmup_start_lr + step * (
            (base_lr - warmup_start_lr) / jnp.maximum(warmup_steps, 1))
        t = step - warmup_steps
        total = jnp.maximum(total_steps - warmup_steps, 1)
        lin = base_lr - (base_lr - base_lr * lr_min_rate) * (t / total)
        return jnp.where(step < warmup_steps, warm, lin)

    return fn


def build_schedule(cfg, steps_per_epoch: int):
    t = cfg.train
    total = t.epoch_num * steps_per_epoch
    warm = t.warmup_epochs * steps_per_epoch if t.use_warmup else 0
    if t.lr_policy == "step":
        return multistep_schedule(t.lr, t.lr_milestone or [30, 60],
                                  t.step, steps_per_epoch)
    if t.lr_policy == "cosine":
        return cosine_schedule(t.lr, t.min_lr, total, warm, t.warmup_start_lr)
    if t.lr_policy == "linear":
        return linear_schedule(t.lr, total, warm, t.warmup_start_lr)
    raise ValueError(f"unknown lr policy {t.lr_policy!r}")
