"""Threaded prefetching data loader with per-host sharding.

Replaces torch DataLoader + DistributedSampler (ava_frame.py:269-283):
  * per-host index shard (keys[rank::world]) with per-epoch shuffling,
    drop_last batching — the DistributedSampler contract;
  * a thread pool decodes/augments samples ahead of consumption (JPEG decode
    of 32 frames/sample is the host-side bottleneck — SURVEY §7 hard part 5);
  * batches are stacked numpy arrays ready for ``jax.device_put`` with a
    batch-axis NamedSharding (string fields travel alongside, not on device).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np

_STRING_KEYS = ("image_key",)


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of fixed-shape sample dicts into one batch dict."""
    out: Dict = {}
    for k in samples[0]:
        if k in _STRING_KEYS:
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 seed: int = 0, rank: int = 0, world: int = 1,
                 num_workers: int = 8, drop_last: bool = True,
                 prefetch: int = 4, pad_to_batch: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world = world
        # threads beyond the core count only add GIL contention (measured
        # 0.2x scaling with 8 threads on a 1-core host)
        import multiprocessing

        self.num_workers = max(1, min(num_workers,
                                      multiprocessing.cpu_count()))
        self.drop_last = drop_last
        # Validation: wrap-pad the tail so every sample is seen while all
        # batches stay full (static XLA shapes). The duplicated leading
        # samples are deduped by the evaluators (keyed by image_key),
        # matching the reference DistributedSampler+dict-overwrite effect.
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # DistributedSampler contract: pad to a multiple of world, then
        # shard. np.resize wraps cyclically, covering pad > n (a dataset
        # smaller than the host count) — a single idx[:pad] slice would
        # underfill there, give ranks unequal batch counts, and hang the
        # multi-host eval collectives.
        if self.world > 1:
            per = (n + self.world - 1) // self.world
            idx = np.resize(idx, per * self.world)
            idx = idx[self.rank::self.world]
        if self.pad_to_batch and len(idx) and len(idx) % self.batch_size:
            # np.resize wraps cyclically, so shards smaller than the pad
            # (tiny val shard, large batch) still fill a whole batch —
            # a single idx[:pad] wrap would leave a partial batch for
            # drop_last to silently discard
            target = -(-len(idx) // self.batch_size) * self.batch_size
            idx = np.resize(idx, target)
        return idx.tolist()

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        def load_one(args):
            epoch_seed, index = args
            rng = np.random.default_rng(
                (self.seed * 1_000_003 + epoch_seed) ^ (index * 2_654_435_761))
            return self.dataset.get(index, rng)

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending = []
            ahead = min(self.prefetch, len(batches))
            for b in range(ahead):
                pending.append([pool.submit(load_one, (self.epoch, i))
                                for i in batches[b]])
            for b in range(len(batches)):
                if b + ahead < len(batches):
                    pending.append([pool.submit(load_one, (self.epoch, i))
                                    for i in batches[b + ahead]])
                futs = pending[b]
                pending[b] = None  # release consumed futures: each retains
                # its full decoded sample, so keeping the whole epoch's list
                # alive leaks ~batch x sample-size per step on real datasets
                yield collate([f.result() for f in futs])
        finally:
            # Abandoning the iterator (early break, exception, one-batch
            # sample probe) must not decode the queued prefetch batches:
            # the `with` form shuts down with wait=True and no cancel,
            # stalling the caller for ~prefetch full batch decodes of
            # thrown-away work — e.g. delaying the preemption checkpoint.
            pool.shutdown(wait=False, cancel_futures=True)
