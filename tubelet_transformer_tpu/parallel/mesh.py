"""Device mesh and sharding layout.

Replaces the reference's NCCL DDP runtime (pipelines/launch.py: one process
per GPU, TCP rendezvous, IP-list rank matching) with the TPU-native model:
one ``jax.sharding.Mesh`` over all chips, batch-dim ``NamedSharding`` for
data parallelism over ICI, parameters replicated; XLA emits the gradient
all-reduce inside the compiled train step. Multi-host initialization is
``jax.distributed.initialize()`` + per-host data feeding.

The mesh is declared 2-D ('data', 'model'): the 'model' axis is available
for tensor-parallel sharding of the transformer (attention heads / FFN) when
scaling beyond pure DP; size 1 by default, matching the reference's
capability surface (DP only — SURVEY §2.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, pipe: int = 1,
                devices: Optional[list] = None) -> Mesh:
    """('data', 'model', 'pipe') mesh. 'pipe' (default 1) carries pipeline
    stages for the pipelined encoder (parallel/pipeline.py); size-1 axes
    cost nothing and keep every PartitionSpec valid on every layout."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // (model * pipe)
    if data * model * pipe != n:
        raise ValueError(f"mesh {data}x{model}x{pipe} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, pipe)
    return Mesh(dev_array, ("data", "model", "pipe"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def clip_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, T, H, W, C) clips: batch over 'data'; with
    ``spatial``, also the H axis over 'model' (GSPMD emits
    collective-permute halo exchanges for the convolutions)."""
    if spatial and mesh.shape.get("model", 1) > 1:
        return NamedSharding(mesh, P("data", None, "model"))
    return batch_sharding(mesh)


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Place a host batch pytree onto the mesh, batch axis over 'data'
    (clips additionally H-sharded over 'model' when ``spatial``).

    Single-process: a plain sharded device_put. Multi-host: each host's
    loader feeds its own shard (batch_size x local chips — the reference's
    per-GPU DDP batching), assembled into one global array per leaf."""
    def spec(k):
        return clip_sharding(mesh, spatial) if k == "clips" \
            else batch_sharding(mesh)

    if jax.process_count() == 1:
        return {k: jax.device_put(v, spec(k)) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(spec(k), np.asarray(v))
            for k, v in batch.items()}


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_host(x):
    """Gather a per-host array across processes (fixed shape), replacing the
    reference's filesystem-based rank exchange
    (utils/video_action_recognition.py:404-453)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)


def gather_global_tree(tree) -> dict:
    """gather_global over a pytree in ONE collective (multi-host issues a
    single process_allgather for the whole dict instead of one blocking
    collective per array — the eval loops gather 8-9 arrays per batch)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, jax.device_get(tree))
    from jax.experimental import multihost_utils

    return jax.tree.map(np.asarray,
                        multihost_utils.process_allgather(tree, tiled=True))


def broadcast_string(s: str, max_len: int = 4096) -> str:
    """Rank 0's string on every host (fixed-size uint8 broadcast).

    Resume paths must agree on ONE checkpoint: on a shared FS each host's
    directory listing can lag (NFS/GCS-fuse attribute caches), so hosts
    globbing independently may pick different 'newest' checkpoints and
    offset their epoch loops — a collective deadlock."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    b = s.encode()
    if len(b) > max_len:
        raise ValueError(f"string exceeds broadcast buffer ({len(b)} bytes)")
    buf = np.zeros((max_len,), np.uint8)
    buf[:len(b)] = np.frombuffer(b, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def gather_global(x) -> np.ndarray:
    """Full value of ``x`` on every host, as numpy.

    ``x`` may be a globally-sharded jax.Array (batch over 'data' across
    hosts — plain device_get cannot fetch non-addressable shards) or a
    host-local numpy array (per-host loader fields like key indices):
    both gather to the same global batch order (process-major, matching
    make_array_from_process_local_data placement)."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
