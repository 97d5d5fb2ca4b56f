"""Epoch-level orchestration: training loop and distributed validation.

Reference: ``utils/video_action_recognition.py`` (train_tuber_detection /
validate_tuber_detection / validate_tuber_ucf_detection) re-architected:
  * the per-iteration body is one compiled step (see train/engine.py);
  * cross-rank detection exchange uses collectives on fixed-shape arrays
    (parallel/mesh.all_gather_host) instead of per-rank txt files + barrier;
  * the txt dumps remain available as an optional debug artifact.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.eval.ava_eval import (
    AVADetectionEvaluator,
    PersonDetectionEvaluator,
    dump_detections_txt,
    load_excluded_keys,
)
from tubelet_transformer_tpu.parallel import mesh as mesh_lib
from tubelet_transformer_tpu.utils import AverageMeter, MetricsWriter


_DEVICE_KEYS = ("clips", "pad_mask", "boxes", "labels", "valid", "sizes",
                "vis", "key_pos", "lfb_features", "lfb_mask")


def device_batch(batch: Dict, mesh, spatial: bool = False) -> Dict:
    db = {k: v for k, v in batch.items() if k in _DEVICE_KEYS}
    return mesh_lib.shard_batch(db, mesh, spatial=spatial)


def train_one_epoch(cfg: Config, train_step, state, loader, mesh, rng,
                    epoch: int, writer: Optional[MetricsWriter] = None):
    """One training epoch (reference train_tuber_detection:77-220)."""
    loader.set_epoch(epoch)
    # one device scalar for the whole epoch: a fresh jnp.float32 per step
    # would re-dispatch a convert + transfer every iteration (~3 ms/step
    # measured over the TPU relay)
    loss_ce_w = jnp.float32(
        cfg.loss.loss_change_cof if epoch > cfg.loss.weight_change
        else cfg.loss.dice_cof)
    meters = {k: AverageMeter(k) for k in
              ("total_loss", "loss_ce", "loss_ce_b", "loss_bbox",
               "loss_giou", "class_error")}
    data_time = AverageMeter("data")
    step_time = AverageMeter("step")
    is_main = mesh_lib.is_main_process()
    n_batches = len(loader)

    end = time.time()
    # LOG.PROFILE_STEPS: device-trace a few steady-state steps of the first
    # epoch (step 0 is the compile; start after it) — SURVEY §5.1 upgrade
    # over the reference's wall-clock-only meters
    prof_steps = cfg.log.profile_steps if epoch == 0 else 0
    prof_active = False

    metrics = {}
    for it, batch in enumerate(loader):
        if prof_steps and is_main:
            if it == 1:
                from tubelet_transformer_tpu import profiling

                _prof = profiling.trace(os.path.join(
                    writer.log_dir if writer else ".", "profile"))
                _prof.__enter__()
                prof_active = True
            elif prof_active and it == 1 + prof_steps:
                jax.device_get(metrics)  # flush queued device work
                _prof.__exit__(None, None, None)
                prof_active = False
        data_time.update(time.time() - end)
        db = device_batch(batch, mesh, cfg.mesh.spatial)
        state, metrics = train_step(state, db, rng, loss_ce_w)
        if (it + 1) % cfg.log.display_freq == 0 or it + 1 == n_batches:
            metrics = jax.device_get(metrics)  # sync point for logging only
            if not metrics["finite"]:
                print(f"WARNING: non-finite loss at epoch {epoch} it {it}; "
                      "update skipped")
            bs = batch["clips"].shape[0]
            for k, m in meters.items():
                if k in metrics:
                    m.update(float(metrics[k]), bs)
            step_time.update(time.time() - end)
            if is_main:
                gstep = int(state.step)
                print(f"Epoch: [{epoch}][{it + 1}/{n_batches}] "
                      f"loss {meters['total_loss'].avg:.4f} "
                      f"ce {meters['loss_ce'].avg:.4f} "
                      f"bbox {meters['loss_bbox'].avg:.4f} "
                      f"giou {meters['loss_giou'].avg:.4f} "
                      f"ce_b {meters['loss_ce_b'].avg:.4f} "
                      f"data {data_time.avg:.3f}s step {step_time.avg:.3f}s")
                if writer:
                    for k, m in meters.items():
                        writer.add_scalar(f"train/{k}", m.val, gstep)
        end = time.time()
    if prof_active:
        jax.device_get(metrics)  # flush queued device work into the trace
        _prof.__exit__(None, None, None)
    return state, {k: m.avg for k, m in meters.items()}


def validate_ava(cfg: Config, eval_step, state, loader, mesh, epoch: int,
                 writer: Optional[MetricsWriter] = None,
                 dump_dir: Optional[str] = None,
                 label_path: Optional[str] = None,
                 exclude_keys=()) -> Dict[str, float]:
    """AVA validation -> frame mAP + person AP
    (reference validate_tuber_detection:222-454).

    Detections/GT are exchanged as fixed-shape arrays across hosts; only
    process 0 runs the (numpy) evaluator.
    """
    dataset = loader.dataset
    is_main = mesh_lib.is_main_process()
    if not exclude_keys and cfg.data.exclude_path:
        exclude_keys = load_excluded_keys(cfg.data.exclude_path)
    evaluator = AVADetectionEvaluator(
        label_path=label_path or (cfg.data.label_path or None),
        class_num=cfg.data.num_classes, exclude_keys=exclude_keys)
    person_eval = PersonDetectionEvaluator()
    # size-banded person-AP breakdown (the reference's size-window family:
    # STDetectionEvaluaterSinglePerson(threshold_size_min/max))
    band_evals = [(lo, hi, PersonDetectionEvaluator(size_min=lo, size_max=hi))
                  for lo, hi in (cfg.val.person_size_bands or ())]
    loss_meters = {k: AverageMeter(k) for k in
                   ("loss_ce", "loss_ce_b", "loss_bbox", "loss_giou")}
    dump_rows = []
    dumped_keys = set()

    def submit(batch):
        """Dispatch the (async) device work for one batch."""
        db = device_batch(batch, mesh, cfg.mesh.spatial)
        out = eval_step(state, db)
        arrays = {
            "scores": out["scores"], "boxes": out["boxes"],
            "binary": out["binary"], "sizes": db["sizes"],
            "gt_boxes": db["boxes"], "gt_labels": db["labels"],
            "gt_valid": db["valid"],
            "key_idx": jnp.asarray(batch["key_idx"]),
        }
        return out, arrays, batch["clips"].shape[0]

    def consume(out, arrays, bs):
        for k, m in loss_meters.items():
            m.update(float(out["losses"][k]), bs)
        # full global batch on every host (multi-host: allgather; the
        # model outputs are globally sharded and cannot be device_get)
        gathered = mesh_lib.gather_global_tree(arrays)
        if not is_main:
            return
        _accumulate(gathered)

    def _accumulate(gathered):
        b = gathered["scores"].shape[0]
        for i in range(b):
            idx = int(gathered["key_idx"][i])
            image_key = dataset.keys[idx].replace(",", "_") if hasattr(
                dataset, "keys") else f"idx_{idx}"
            h, w = gathered["sizes"][i]
            scale = np.array([w, h, w, h], np.float64)
            # detections (already scaled on device by sizes)
            det_boxes = gathered["boxes"][i]
            evaluator.add_detections(image_key, det_boxes,
                                     gathered["scores"][i])
            person_eval.add_detections(image_key, det_boxes,
                                       gathered["binary"][i][:, 0])
            for _, _, bev in band_evals:
                bev.add_detections(image_key, det_boxes,
                                   gathered["binary"][i][:, 0])
            # ground truth: denormalize cxcywh -> absolute xyxy
            gv = gathered["gt_valid"][i]
            gb = gathered["gt_boxes"][i][gv]
            cx, cy, bw, bh = gb.T if gb.size else (np.zeros(0),) * 4
            gxyxy = np.stack([cx - bw / 2, cy - bh / 2,
                              cx + bw / 2, cy + bh / 2], 1) * scale \
                if gb.size else np.zeros((0, 4))
            gl = gathered["gt_labels"][i][gv]
            evaluator.add_ground_truth(image_key, gxyxy, gl)
            person_eval.add_ground_truth(image_key, gxyxy)
            for _, _, bev in band_evals:
                bev.add_ground_truth(image_key, gxyxy)
            if dump_dir is not None and image_key not in dumped_keys:
                # pad_to_batch wrap-duplicates samples; the evaluators
                # dedupe per add() call but the dump must too, or the
                # txt cross-check counts the duplicates as extra FPs
                dumped_keys.add(image_key)
                for q in range(det_boxes.shape[0]):
                    dump_rows.append((image_key, list(det_boxes[q]) +
                                      list(gathered["scores"][i][q]) +
                                      [gathered["binary"][i][q, 0]]))

    # 1-deep software pipeline: the next batch's device work is dispatched
    # before the current results are fetched and fed to the (numpy)
    # evaluator, so the chip never waits for the host accumulation.
    pending = None
    for batch in loader:
        cur = submit(batch)
        if pending is not None:
            consume(*pending)
        pending = cur
    if pending is not None:
        consume(*pending)

    result: Dict[str, float] = {k: m.avg for k, m in loss_meters.items()}
    if is_main:
        if dump_dir is not None:
            os.makedirs(dump_dir, exist_ok=True)
            dump_detections_txt(os.path.join(dump_dir, "0.txt"), dump_rows)
            try:
                # PR-curve panel next to the dumps (plots.py counterpart of
                # the reference's util/plot_utils.py:plot_precision_recall)
                from tubelet_transformer_tpu.plots import plot_pr_curves
                plot_pr_curves(evaluator.precision_recall_curves(),
                               os.path.join(dump_dir, f"pr_epoch_{epoch}.png"))
            except Exception as exc:  # plotting must never fail validation
                print(f"PR plot skipped: {exc}")
        maps, _ = evaluator.evaluate()
        person_ap = person_eval.evaluate()
        result["mAP"] = maps[0]
        result["person_AP"] = person_ap[0]
        print(f"Validation epoch {epoch}: frame mAP {maps[0]:.4f} "
              f"person AP {person_ap[0]:.4f}")
        if writer:
            writer.add_scalar("val/val_mAP_epoch", maps[0], epoch)
            writer.add_scalar("val/val_person_AP_epoch", person_ap[0], epoch)
        for lo, hi, bev in band_evals:
            band_ap = bev.evaluate()[0]
            tag = f"person_AP_size_{int(lo)}_{int(hi)}"
            result[tag] = band_ap
            print(f"  person AP (area {int(lo)}..{int(hi)}): {band_ap:.4f}")
            if writer:
                writer.add_scalar(f"val/{tag}", band_ap, epoch)
    return result


def validate_ucf(cfg: Config, eval_step, state, loader, mesh, epoch: int,
                 writer: Optional[MetricsWriter] = None,
                 iou_thresholds=(0.5,),
                 video_map_thresholds=(0.2, 0.5)) -> Dict[str, float]:
    """JHMDB/UCF validation -> frame mAP over tubelet key-frame queries
    (reference validate_tuber_ucf_detection:456-689) + video-mAP via tube
    linking (eval/video_map.py; the reference publishes video-mAP numbers,
    README.md:31, but ships no linking code).

    Per-sample, the Q queries at ``key_pos`` are sliced from the Q*T tubelet
    layout (video_action_recognition.py:553-557) before scoring; the UCF
    evaluator applies the argmax/no-object and tiny-GT exclusion rules.
    """
    from tubelet_transformer_tpu.eval.ucf_eval import UCFDetectionEvaluator
    from tubelet_transformer_tpu.eval.video_map import VideoMAPEvaluator

    dataset = loader.dataset
    is_main = mesh_lib.is_main_process()
    evaluator = UCFDetectionEvaluator(class_num=cfg.data.num_classes,
                                      iou_thresholds=iou_thresholds)
    q = cfg.model.query_num
    n_cls = cfg.data.num_classes
    do_video = bool(video_map_thresholds) and hasattr(dataset, "dataset") \
        and "gttubes" in getattr(dataset, "dataset", {})
    video_eval = (VideoMAPEvaluator(n_cls, video_map_thresholds)
                  if do_video else None)

    def submit(batch):
        db = device_batch(batch, mesh, cfg.mesh.spatial)
        out = eval_step(state, db)
        return {
            "scores": out["scores"], "boxes": out["boxes"],
            "sizes": db["sizes"], "key_pos": db["key_pos"],
            "gt_boxes": db["boxes"], "gt_labels": db["labels"],
            "gt_valid": db["valid"], "vis": db["vis"],
            "key_idx": jnp.asarray(batch["key_idx"]),
        }

    def consume(arrays):
        gathered = mesh_lib.gather_global_tree(arrays)
        if not is_main:
            return
        _accumulate(gathered)

    def _accumulate(gathered):
        b = gathered["scores"].shape[0]
        for i in range(b):
            idx = int(gathered["key_idx"][i])
            if hasattr(dataset, "samples"):
                vid, fid = dataset.samples[idx]
                image_key = str(vid).replace("/", "_") + "-" + str(fid)
            else:
                image_key = f"idx_{idx}"
            kp = int(gathered["key_pos"][i])
            sl = slice(kp * q, (kp + 1) * q)
            det_boxes = gathered["boxes"][i][sl]
            det_scores = gathered["scores"][i][sl]      # (Q, C+1) softmax
            evaluator.add_detections(image_key, det_boxes, det_scores)

            if video_eval is not None and hasattr(dataset, "samples"):
                # per-frame argmax-class detections for tube linking (same
                # no-object rule as the frame evaluator)
                keep = np.argmax(det_scores, axis=1) != det_scores.shape[1] - 1
                if keep.any():
                    fg = det_scores[keep][:, :n_cls]
                    cls = np.argmax(fg, axis=1)
                    video_eval.add_frame_detections(
                        str(vid), int(fid), det_boxes[keep], cls,
                        fg[np.arange(len(cls)), cls])

            h, w = gathered["sizes"][i]
            scale = np.array([w, h, w, h], np.float64)
            gv = gathered["gt_valid"][i]
            gb = gathered["gt_boxes"][i][gv]
            if gb.size and int(gathered["vis"][i]):
                cx, cy, bw, bh = gb.T
                gxyxy = np.stack([cx - bw / 2, cy - bh / 2,
                                  cx + bw / 2, cy + bh / 2], 1) * scale
                onehot = np.zeros((len(gb), n_cls), np.float32)
                onehot[np.arange(len(gb)),
                       gathered["gt_labels"][i][gv]] = 1.0
                evaluator.add_ground_truth(image_key, gxyxy, onehot)

    # 1-deep pipeline (see validate_ava): overlap device work with the
    # host-side evaluator accumulation
    pending = None
    for batch in loader:
        cur = submit(batch)
        if pending is not None:
            consume(pending)
        pending = cur
    if pending is not None:
        consume(pending)

    result: Dict[str, float] = {}
    if is_main:
        maps, _ = evaluator.evaluate()
        for t, m in zip(iou_thresholds, maps):
            result[f"mAP@{t}"] = m
        result["mAP"] = maps[0]
        print(f"UCF/JHMDB validation epoch {epoch}: " +
              " ".join(f"mAP@{t}={m:.4f}" for t, m in
                       zip(iou_thresholds, maps)))
        if writer:
            writer.add_scalar("val/val_mAP_epoch", maps[0], epoch)

        if video_eval is not None:
            # GT tubes from the pkl, scaled to the eval (resized) frame
            vids = {v for v, _ in dataset.samples}
            for v in vids:
                oh, ow = dataset.dataset["resolution"][v]
                # the dataset's own resize policy: GT tubes must land on
                # exactly the frame the detections were scaled to
                nh, nw = dataset._video_resize(v)
                sc = np.array([nw / ow, nh / oh, nw / ow, nh / oh])
                for ilabel, tubes in dataset.dataset["gttubes"][v].items():
                    for tube in tubes:
                        video_eval.add_gt_tube(
                            str(v), int(ilabel), tube[:, 0].astype(int),
                            tube[:, 1:5] * sc)
            vmaps = video_eval.evaluate()
            for t, m in vmaps.items():
                result[f"video_mAP@{t}"] = m
            print("video-mAP: " + " ".join(
                f"@{t}={m:.4f}" for t, m in vmaps.items()))
            if writer:
                for t, m in vmaps.items():
                    writer.add_scalar(f"val/video_mAP@{t}", m, epoch)
    return result
