"""Long-term feature bank (LFB) storage and window gathering.

The reference advertises "+long-term context" checkpoints (+~2 mAP,
README.md:16-26) and plumbs ``lfb_features`` through collate and forward
(utils/misc.py:284-308, video_action_recognition.py:109-139) but never ships
the bank itself. This module provides it:

  * ``generate``: run the model in ``generate_lfb`` mode over a dataset and
    store, per keyframe, the final-layer query features of confident actors
    (P(actor) over a threshold, padded to a fixed per-frame slot count);
  * ``window``: for a (video, second) key, gather the stored features from
    the surrounding +-window seconds into a fixed-shape (L_mem, D) memory
    with a validity mask — static shapes for XLA.

Bank files are plain .npz keyed by "vid,ssss" AVA keys.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class FeatureBank:
    def __init__(self, feat_dim: int, slots_per_frame: int = 5):
        self.feat_dim = feat_dim
        self.slots = slots_per_frame
        self._bank: Dict[str, np.ndarray] = {}    # key -> (slots, D)
        self._valid: Dict[str, np.ndarray] = {}   # key -> (slots,) bool

    def __len__(self) -> int:
        return len(self._bank)

    def add(self, key: str, features: np.ndarray,
            actor_prob: np.ndarray, threshold: float = 0.8) -> None:
        """features (Q, D); actor_prob (Q,). Keeps top slots by probability,
        validity-gated at the threshold."""
        order = np.argsort(-actor_prob)[: self.slots]
        feats = np.zeros((self.slots, self.feat_dim), np.float32)
        valid = np.zeros((self.slots,), bool)
        n = len(order)
        feats[:n] = features[order]
        valid[:n] = actor_prob[order] > threshold
        self._bank[key] = feats
        self._valid[key] = valid

    def window(self, vid: str, second: int, half_window: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Gather features of ``vid`` seconds [s-hw, s+hw] (excluding s)
        -> ((2*hw) * slots, D) memory + True-means-PAD mask (fixed shape)."""
        secs = [s for s in range(second - half_window, second + half_window + 1)
                if s != second]
        mem = np.zeros((len(secs) * self.slots, self.feat_dim), np.float32)
        pad = np.ones((len(secs) * self.slots,), bool)
        for i, s in enumerate(secs):
            key = f"{vid},{s:04d}"
            if key in self._bank:
                sl = slice(i * self.slots, (i + 1) * self.slots)
                mem[sl] = self._bank[key]
                pad[sl] = ~self._valid[key]
        return mem, pad

    def save(self, path: str) -> None:
        keys = list(self._bank)
        np.savez_compressed(
            path, keys=np.array(keys),
            feats=np.stack([self._bank[k] for k in keys]) if keys
            else np.zeros((0, self.slots, self.feat_dim), np.float32),
            valid=np.stack([self._valid[k] for k in keys]) if keys
            else np.zeros((0, self.slots), bool))

    @classmethod
    def load(cls, path: str) -> "FeatureBank":
        data = np.load(path, allow_pickle=False)
        feats = data["feats"]
        bank = cls(feat_dim=feats.shape[-1] if feats.size else 256,
                   slots_per_frame=feats.shape[1] if feats.size else 5)
        for i, k in enumerate(data["keys"]):
            bank._bank[str(k)] = feats[i]
            bank._valid[str(k)] = data["valid"][i]
        return bank


class BankAttachDataset:
    """Dataset wrapper that ships a long-term memory window with each sample.

    The counterpart of the reference's USE_LFB collate variants
    (utils/misc.py:284-308): there the loader delivers ``lfb_features``
    alongside the clip and the loops forward them into the model
    (video_action_recognition.py:109-139). Here the wrapper attaches a
    fixed-shape ``(L_mem, D)`` memory + True-means-pad mask gathered from a
    precomputed :class:`FeatureBank` around the sample's keyframe, so the
    batch stays static-shape for XLA end to end.
    """

    def __init__(self, base, bank: FeatureBank, half_window: int = 10):
        if not hasattr(base, "keys"):
            raise ValueError(
                "BankAttachDataset needs a dataset with 'vid,ssss' keys")
        self.base = base
        self.bank = bank
        self.half_window = half_window

    def __len__(self) -> int:
        return len(self.base)

    def __getattr__(self, name):
        return getattr(self.base, name)

    def get(self, index: int, rng) -> Dict:
        sample = self.base.get(index, rng)
        # the base dataset resamples a different random index on empty
        # targets (ava.py:194-202); the window must follow the keyframe
        # actually returned, which the sample names via key_idx
        real_index = int(sample.get("key_idx", index))
        vid, sec = self.base.keys[real_index].rsplit(",", 1)
        mem, pad = self.bank.window(vid, int(sec), self.half_window)
        sample["lfb_features"] = mem
        sample["lfb_mask"] = pad
        return sample


def generate_bank(cfg, model, variables, loader, mesh,
                  threshold: float = 0.8) -> FeatureBank:
    """Run the generate_lfb forward over a loader and fill a bank.

    Batches go through the same device path as validation: photometric
    ``device_preprocess`` (the loader ships uint8 by default) and the mesh
    batch sharding; features gather globally so on multi-host runs every
    process fills the FULL bank (each host's loader only sees its shard).
    """
    import jax
    import numpy as np

    from tubelet_transformer_tpu.data.device_preprocess import (
        device_preprocess,
    )
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib

    @jax.jit
    def gen_step(variables, clips, pad_mask):
        out = model.apply(variables,
                          device_preprocess(clips, pad_mask=pad_mask),
                          pad_mask, train=False)
        prob = jax.nn.softmax(out["pred_logits_b"], axis=-1)[..., 1]
        return out["lfb_features"], prob

    if mesh is None:  # single-device convenience path (tests, notebooks)
        mesh = mesh_lib.create_mesh(data=1, model=1,
                                    devices=jax.devices()[:1])
    bank = FeatureBank(feat_dim=cfg.model.d_model,
                       slots_per_frame=min(cfg.model.query_num, 5))
    dataset = loader.dataset
    for batch in loader:
        db = mesh_lib.shard_batch(
            {"clips": np.asarray(batch["clips"]),
             "pad_mask": np.asarray(batch["pad_mask"])}, mesh)
        feats, prob = gen_step(variables, db["clips"], db["pad_mask"])
        feats = mesh_lib.gather_global(feats)
        prob = mesh_lib.gather_global(prob)
        key_idx = mesh_lib.gather_global(np.asarray(batch["key_idx"]))
        for i in range(feats.shape[0]):
            idx = int(key_idx[i])
            key = dataset.keys[idx] if hasattr(dataset, "keys") else str(idx)
            bank.add(key, feats[i], prob[i], threshold)
    return bank
