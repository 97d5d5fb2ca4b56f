"""Train/eval engine: jit-compiled steps over the device mesh.

Replaces the reference's per-iteration Python loop body
(utils/video_action_recognition.py:77-220: host-side matcher sync, DDP
backward, explicit clip/step/schedule calls) with one compiled XLA program:
forward + on-device Hungarian matching + loss + grad + clip + AdamW + LR
schedule, with the batch sharded over the 'data' mesh axis. XLA inserts the
gradient all-reduce over ICI (the NCCL-DDP equivalent).

The loss_ce weight swap after epoch WEIGHT_CHANGE
(video_action_recognition.py:145-146) enters the step as a traced scalar so
no recompile happens at the swap epoch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.data.device_preprocess import device_preprocess
from tubelet_transformer_tpu.train import criterion as crit
from tubelet_transformer_tpu.train.optimizer import build_optimizer
from tubelet_transformer_tpu.train.postprocess import (
    postprocess_ava,
    postprocess_softmax,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _lfb_kwargs(batch) -> dict:
    """Long-term-memory forward kwargs when the loader ships a bank window
    (reference USE_LFB plumbing, video_action_recognition.py:109-139)."""
    if "lfb_features" not in batch:
        return {}
    return {"lfb_features": jnp.asarray(batch["lfb_features"]),
            "lfb_mask": jnp.asarray(batch["lfb_mask"])}


def create_train_state(cfg: Config, model, rng, sample_batch,
                       steps_per_epoch: int):
    # jit the init: eager flax init dispatches every op separately, which is
    # pathologically slow over a remote-TPU tunnel (minutes for CSN-152).
    pad_mask = sample_batch.get("pad_mask")
    clips = device_preprocess(jnp.asarray(sample_batch["clips"]),
                              pad_mask=None if pad_mask is None
                              else jnp.asarray(pad_mask))
    # flax init only creates params for modules actually called: a bank
    # batch must be present at init or the lfb fusion params would be
    # missing when the train step later feeds lfb_features
    lfb_kwargs = _lfb_kwargs(sample_batch)
    variables = jax.jit(
        lambda r: model.init({"params": r}, clips, pad_mask, train=False,
                             **lfb_kwargs)
    )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx, sched = build_optimizer(cfg, params, steps_per_epoch)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    return state, tx, sched


def is_ava_mode(cfg: Config) -> bool:
    """Everything but the tubelet (JHMDB/UCF) datasets uses AVA semantics."""
    return cfg.data.dataset_name not in ("jhmdb", "ucf")


def _targets_from_batch(cfg: Config, batch: Dict[str, jnp.ndarray]):
    if is_ava_mode(cfg):
        return crit.TargetsAVA(boxes=batch["boxes"], labels=batch["labels"],
                               valid=batch["valid"])
    return crit.TargetsUCF(boxes=batch["boxes"], labels=batch["labels"],
                           valid=batch["valid"], vis=batch["vis"],
                           key_pos=batch["key_pos"])


def compute_losses(cfg: Config, outputs, targets, evaluation: bool = False):
    if is_ava_mode(cfg):
        return crit.criterion_ava(
            outputs, targets,
            cost_class=cfg.matcher.cost_class, cost_bbox=cfg.matcher.cost_bbox,
            cost_giou=cfg.matcher.cost_giou, weight=cfg.loss.weight,
            eos_coef=cfg.loss.eos_cof, aux_loss=cfg.train.aux_loss,
            evaluation=evaluation)
    return crit.criterion_ucf(
        outputs, targets,
        cost_class=cfg.matcher.cost_class, cost_bbox=cfg.matcher.cost_bbox,
        cost_giou=cfg.matcher.cost_giou, eos_coef=cfg.loss.eos_cof,
        num_classes=cfg.data.num_classes, num_queries=cfg.model.query_num,
        aux_loss=cfg.train.aux_loss)


def weighted_total(cfg: Config, loss_dict, loss_ce_weight):
    """Weighted loss sum with the (traced) last-layer loss_ce weight."""
    wd = crit.build_weight_dict(cfg)
    total = loss_ce_weight * loss_dict["loss_ce"]
    for k, w in wd.items():
        if k == "loss_ce" or k not in loss_dict:
            continue
        total = total + w * loss_dict[k]
    return total


def make_train_step(cfg: Config, model, tx, state_out_shardings=None):
    """Build the jitted train step: (state, batch, rng, loss_ce_w) -> ...

    ``state_out_shardings`` (a TrainState pytree of NamedShardings, from
    parallel.sharding_rules.state_shardings) pins the output state layout.
    Required under ZeRO-1: it keeps the Adam-moment updates shard-local
    over 'data' and makes GSPMD emit exactly one all-gather for the param
    delta; without a pin, sharding propagation would either gather the
    moments (defeating ZeRO) or shard the params (recompiling every step).

    With TRAIN.ACCUM_STEPS > 1 the batch is split into microbatches inside
    the step (lax.scan): gradients average and losses are the microbatch
    means — matching the reference's multi-GPU DDP loss/grad averaging
    (its per-GPU criterion normalizes per shard too) — at 1/ACCUM_STEPS
    the activation memory. BatchNorm running stats take ACCUM_STEPS
    sequential small-batch EMA updates per optimizer step (the semantics
    of actually training at the smaller per-device batch), not one
    full-batch update.
    """
    accum = max(1, cfg.train.accum_steps)

    def microbatch_loss(params, batch_stats, batch, clips, step_rng,
                        loss_ce_weight):
        def loss_fn(params):
            outputs, new_model_state = model.apply(
                {"params": params, "batch_stats": batch_stats},
                clips, batch.get("pad_mask"), train=True,
                mutable=["batch_stats", "moe"], rngs={"dropout": step_rng},
                **_lfb_kwargs(batch))
            targets = _targets_from_batch(cfg, batch)
            loss_dict = compute_losses(cfg, outputs, targets)
            total = weighted_total(cfg, loss_dict, loss_ce_weight)
            # MoE load-balance auxiliary (models/moe.py sows one scalar per
            # MoE layer into the 'moe' collection); mean over layers.
            moe_leaves = jax.tree.leaves(new_model_state.get("moe", {}))
            if moe_leaves:
                aux = sum(moe_leaves) / len(moe_leaves)
                loss_dict["loss_moe_aux"] = aux
                total = total + cfg.loss.moe_aux_cof * aux
            return total, (new_model_state["batch_stats"], loss_dict)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch, rng, loss_ce_weight):
        step_rng = jax.random.fold_in(rng, state.step)

        # photometric stage for uint8 clips (host shipped raw pixels);
        # no-op for float inputs
        clips = device_preprocess(batch["clips"], key=jax.random.fold_in(
            step_rng, 1), jitter=True, pad_mask=batch.get("pad_mask"))

        if accum == 1:
            (total, (new_bs, loss_dict)), grads = microbatch_loss(
                state.params, state.batch_stats, batch, clips, step_rng,
                loss_ce_weight)
        else:
            b = clips.shape[0]
            if b % accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"TRAIN.ACCUM_STEPS={accum}")

            def to_mb(x):
                return jnp.reshape(x, (accum, b // accum) + x.shape[1:])

            # every device key except clips (preprocessed + split above)
            # microbatches alongside, so new loss inputs can't silently
            # vanish in the accumulation path
            mb_keys = [k for k in batch if k != "clips"]
            scan_in = ({k: to_mb(jnp.asarray(batch[k])) for k in mb_keys},
                       to_mb(clips), jnp.arange(accum))

            def body(carry, inp):
                grads_acc, bstats, total_acc, ld_acc = carry
                mb_batch, mb_clips, i = inp
                (total, (bstats, loss_dict)), grads = microbatch_loss(
                    state.params, bstats, mb_batch, mb_clips,
                    jax.random.fold_in(step_rng, 2 + i), loss_ce_weight)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                ld_acc = {k: ld_acc[k] + v for k, v in loss_dict.items()}
                return (grads_acc, bstats, total_acc + total, ld_acc), None

            # the first microbatch runs unscanned to seed the carry pytree
            # structures (grads, BN stats, the loss_dict key set); the
            # remaining accum-1 microbatches run under one lax.scan so the
            # compiled program stays O(1) in ACCUM_STEPS
            (t0, (bs0, ld0)), g0 = microbatch_loss(
                state.params, state.batch_stats,
                jax.tree.map(lambda x: x[0], scan_in[0]), scan_in[1][0],
                jax.random.fold_in(step_rng, 2), loss_ce_weight)
            carry = (g0, bs0, t0, ld0)
            rest = jax.tree.map(lambda x: x[1:], scan_in)
            (grads, new_bs, total, loss_dict), _ = jax.lax.scan(
                body, carry, rest)
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            total = total * inv
            loss_dict = {k: v * inv for k, v in loss_dict.items()}

        updates, new_opt = tx.update(grads, state.opt_state, state.params)

        # NaN guard (reference exits on non-finite loss,
        # video_action_recognition.py:195-198): skip the update instead and
        # surface the flag in metrics so the host loop can decide. The skip
        # must cover the WHOLE state: keeping params but committing Adam
        # moments/BN stats updated with NaN grads would turn the next
        # (finite) step's update into NaN and kill the run anyway.
        # Mechanism: scalar selects at the UPDATE level, applied before
        # apply_updates. Each select's "new" operand is elementwise-computed
        # from its "old" operand inside the same fusion, so XLA folds the
        # select in with no extra HBM traffic. (A lax.cond over the state
        # was measured at 6.5 ms/step on v5e: TPU conditionals cannot alias
        # buffers across branches, so the taken branch *copies* the whole
        # params+moments+BN tuple. A post-hoc jnp.where over the param trees
        # reads both operand trees — same problem, ~2.2 GB extra.)
        finite = jnp.isfinite(total)
        new_opt = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                               new_opt, state.opt_state)
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_params = optax.apply_updates(state.params, updates)
        new_bs = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                              new_bs, state.batch_stats)

        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        metrics["finite"] = finite.astype(jnp.float32)
        metrics["grad_norm"] = optax.global_norm(grads)

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    if state_out_shardings is None:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,),
                   out_shardings=(state_out_shardings, None))


def make_eval_step(cfg: Config, model, mesh=None):
    """Jitted eval step: forward + on-device postprocess, plus criterion
    losses for logging unless VAL.COMPUTE_LOSSES is off (mAP needs only
    the postprocess; skipping losses roughly halves the step).

    MODEL.INFER_CHUNK > 0 runs the batch as lax.map over fixed-size chunks
    (postprocess + losses inside the chunk): the conv emitter's
    small-batch kernels are 12-15% faster per clip on v5e (BASELINE.md
    "Batch scaling"). Detection outputs are bit-equal to the unchunked
    step; logged loss scalars are chunk-averaged — each chunk normalizes
    by its own box count, the reference's per-GPU DDP loss-averaging
    semantics. Chunking is skipped automatically when ``mesh`` has a
    'data' axis > 1 (the batch axis is mesh-parallel there; lax.map would
    serialize what GSPMD parallelizes — same guard as serving's
    _detect_fn)."""
    postprocess = (postprocess_ava if is_ava_mode(cfg)
                   else postprocess_softmax)

    def eval_body(state: TrainState, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            device_preprocess(batch["clips"],
                              pad_mask=batch.get("pad_mask")),
            batch.get("pad_mask"),
            train=False, **_lfb_kwargs(batch))
        if cfg.val.compute_losses:
            targets = _targets_from_batch(cfg, batch)
            loss_dict = compute_losses(cfg, outputs, targets,
                                       evaluation=True)
        else:
            loss_dict = {k: jnp.float32(0.0) for k in
                         ("loss_ce", "loss_ce_b", "loss_bbox", "loss_giou")}
        scores, boxes, binary = postprocess(outputs, batch["sizes"])
        return {"scores": scores, "boxes": boxes, "binary": binary,
                "losses": loss_dict}

    data_axis = mesh.shape.get("data", 1) if mesh is not None else 1

    def eval_step(state: TrainState, batch):
        ck = cfg.model.infer_chunk
        b = batch["clips"].shape[0]
        if not ck or b <= ck or b % ck or data_axis > 1:
            return eval_body(state, batch)
        chunked = {k: jnp.reshape(jnp.asarray(v),
                                  (b // ck, ck) + jnp.asarray(v).shape[1:])
                   for k, v in batch.items()}
        out = jax.lax.map(lambda mb: eval_body(state, mb), chunked)
        return {
            "scores": jnp.reshape(out["scores"],
                                  (b,) + out["scores"].shape[2:]),
            "boxes": jnp.reshape(out["boxes"],
                                 (b,) + out["boxes"].shape[2:]),
            "binary": jnp.reshape(out["binary"],
                                  (b,) + out["binary"].shape[2:]),
            "losses": jax.tree.map(lambda x: jnp.mean(x, 0), out["losses"]),
        }

    return jax.jit(eval_step)


def make_forward(cfg: Config, model):
    """Plain jitted inference forward (benchmark / serving path)."""

    def forward(variables, clips, pad_mask=None):
        return model.apply(variables,
                           device_preprocess(clips, pad_mask=pad_mask),
                           pad_mask,
                           train=False)

    return jax.jit(forward)
