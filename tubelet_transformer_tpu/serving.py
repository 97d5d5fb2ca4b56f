"""Online (streaming) inference for TubeR-TPU.

The reference ships streaming machinery — the ``online_inference`` KV-cache
attention (models/transformer/transformer_layers.py:132-154, 209-304) and
LFB forward plumbing (utils/video_action_recognition.py:109-139) — but no
serving entry point uses it.  This module is that missing serving loop,
built TPU-first:

  * ``StreamingDetector`` consumes raw frames one at a time, maintains the
    rolling clip window (``TEMP_LEN`` frames at ``FRAME_RATE`` stride, the
    AVA sampling of datasets/ava_frame.py:39-43), and runs one jitted
    detection per keyframe cadence;
  * every compiled shape is static — frames are aspect-resized onto a fixed
    ``IMG_SIZE`` canvas with a padding mask, uint8 travels to the device and
    photometric normalization runs in-graph (data/device_preprocess.py);
  * with ``CONFIG.USE_LFB`` on, the detector carries a rolling *long-term
    memory* across clips: each detection's final-layer query features for
    confident actors enter a fixed-shape memory window that the next
    detection cross-attends over (the advertised "+long-term context"
    capability, reference README.md:16-26, served online instead of from a
    precomputed bank).

A detection for video time t is emitted once the clip window centered at t
is complete — i.e. with an inherent delay of half a clip
(TEMP_LEN/2 * FRAME_RATE raw frames), matching the reference's keyframe-
centered clip semantics (ava_frame.py:43).

Measured (flagship CSN-152, 256 px, T=32, one v5e chip behind a network
relay): 191 ms steady-state per keyframe, dominated by the 6.3 MB uint8
clip upload over the relay link — the on-chip forward is ~5 ms, so a
locally attached chip serves at ~10 ms/keyframe. All outputs come back in
one host fetch (four separate fetches cost ~4x the relay RTT).
"""

from __future__ import annotations

import functools
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.data.device_preprocess import device_preprocess
from tubelet_transformer_tpu.models.tuber import build_model
from tubelet_transformer_tpu.train.postprocess import (
    postprocess_ava,
    postprocess_softmax,
)


@dataclass
class Detection:
    """One detected actor at a keyframe."""

    box: np.ndarray          # (4,) xyxy in source-frame pixels
    actor_prob: float
    scores: np.ndarray       # (num_classes,) per-action scores


@dataclass
class KeyframeResult:
    frame_index: int         # source frame index of the keyframe
    time_s: float            # frame_index / fps
    detections: List[Detection]
    latency_ms: float        # host wall-clock of the detection call
    memory_size: int = 0     # valid long-term memory tokens used
    waited_ms: float = 0.0   # time spent due before being scheduled (pool)
    deadline_met: Optional[bool] = None  # vs set_deadline SLO; None = no SLO


@dataclass
class _Memory:
    """Rolling long-term memory: per past keyframe, ``slots`` feature rows."""

    slots: int
    keyframes: int
    feat_dim: int
    feats: deque = field(default_factory=deque)
    valid: deque = field(default_factory=deque)

    def push(self, features: np.ndarray, actor_prob: np.ndarray,
             threshold: float) -> None:
        order = np.argsort(-actor_prob)[: self.slots]
        f = np.zeros((self.slots, self.feat_dim), np.float32)
        v = np.zeros((self.slots,), bool)
        f[: len(order)] = features[order]
        v[: len(order)] = actor_prob[order] > threshold
        self.feats.append(f)
        self.valid.append(v)
        while len(self.feats) > self.keyframes:
            self.feats.popleft()
            self.valid.popleft()

    def window(self):
        """Fixed-shape (keyframes*slots, D) memory + True-is-pad mask."""
        l_mem = self.keyframes * self.slots
        feats = np.zeros((l_mem, self.feat_dim), np.float32)
        mask = np.ones((l_mem,), bool)
        for i, (f, v) in enumerate(zip(self.feats, self.valid)):
            feats[i * self.slots:(i + 1) * self.slots] = f
            mask[i * self.slots:(i + 1) * self.slots] = ~v
        return feats, mask


def _per_query_binary(binary_row, n_queries: int) -> "np.ndarray":
    """Per-query actor probabilities from a postprocess binary row:
    AVA emits (Q, 1); JHMDB/UCF emit a clip-level (1,) visibility, which
    broadcasts to every query."""
    b = np.asarray(binary_row).reshape(-1)
    if b.shape[0] == n_queries:
        return b
    return np.full((n_queries,), float(b[0]), np.float32)


class StreamingDetector:
    """Streaming TubeR detector over a live frame feed.

    Args:
      cfg: framework config; ``cfg.use_lfb`` enables the online long-term
        memory (requires lfb parameters in ``variables``).
      variables: flax variables dict; if None, randomly initialized (demo).
      detect_every: run one detection per this many pushed frames
        (default ``fps`` -> one detection per source second, the AVA
        keyframe cadence).
      fps: source frame rate, for timestamps and the default cadence.
      memory_keyframes / memory_slots: long-term memory extent (past
        keyframes remembered x actor slots per keyframe).
    """

    def __init__(self, cfg: Config, variables=None, *,
                 detect_every: Optional[int] = None, fps: float = 30.0,
                 memory_keyframes: int = 10, memory_slots: int = 5,
                 actor_threshold: float = 0.8, rng_seed: int = 0,
                 mesh=None, infer_chunk: Optional[int] = None):
        self.cfg = cfg
        # None -> follow MODEL.INFER_CHUNK; the pool overrides to 2 so its
        # >= 4-stream buckets never pay the conv emitter's batch tax
        # (BASELINE.md "Batch scaling"); _detect_fn still disables chunking
        # when the batch axis is sharded over a 'data' mesh axis.
        self._infer_chunk = (cfg.model.infer_chunk if infer_chunk is None
                             else infer_chunk)
        self.fps = fps
        self.t_len = cfg.data.temp_len
        self.stride = max(1, cfg.data.frame_rate)
        self.img_size = cfg.data.img_size
        self.detect_every = int(detect_every or round(fps))
        self.actor_threshold = actor_threshold
        self.is_ava = cfg.data.dataset_name not in ("jhmdb", "ucf")

        # serving always runs the sequential encoder; a pipeline-parallel
        # training YAML still serves (PP checkpoints unstack inside
        # checkpoint.load_pretrained)
        cfg.mesh.pipe = 1
        self.model = build_model(cfg)
        if variables is None:
            init_clip = np.zeros(
                (1, self.t_len, self.img_size, self.img_size, 3), np.float32)
            kw = {}
            if cfg.use_lfb:
                kw = dict(
                    lfb_features=np.zeros(
                        (1, memory_keyframes * memory_slots,
                         cfg.model.d_model), np.float32),
                    lfb_mask=np.ones(
                        (1, memory_keyframes * memory_slots), bool))
            variables = jax.jit(
                functools.partial(self.model.init, train=False, **kw)
            )(jax.random.PRNGKey(rng_seed), init_clip)
        self.variables = variables

        # Multi-chip serving: Megatron-style TP over the mesh's 'model'
        # axis (parallel/sharding_rules.py) — params sharded once here,
        # GSPMD inserts the ICI collectives in the jitted detect step.
        # Inputs stay replicated (single-stream batch=1); the pool
        # additionally shards its batch axis over 'data' when divisible.
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tubelet_transformer_tpu.parallel.sharding_rules import (
                param_shardings,
            )

            repl = NamedSharding(mesh, P())
            shardings = {
                k: (param_shardings(v, mesh) if k == "params"
                    else jax.tree.map(lambda _: repl, v))
                for k, v in self.variables.items()}
            self.variables = jax.device_put(self.variables, shardings)
            self._data_sharding = NamedSharding(mesh, P("data"))

        self.memory = _Memory(memory_slots, memory_keyframes,
                              cfg.model.d_model) if cfg.use_lfb else None
        self._frames: deque = deque(maxlen=self.t_len * self.stride)
        self._frame_count = 0
        self._since_detect = 0
        self._src_hw = None
        self._scale = 1.0
        self._detect = jax.jit(self._detect_fn)

    # -- device step ------------------------------------------------------

    def _detect_fn(self, variables, clip_u8, pad_mask, lfb_feats, lfb_mask):
        # MODEL.INFER_CHUNK: run the padded bucket as lax.map over
        # fixed-size chunks — the conv emitter's bs=2 kernels are 12-15%
        # faster per clip than its bs>=4 kernels (BASELINE.md "Batch
        # scaling"), so big serving buckets pay no batch tax. Skipped when
        # the batch is sharded over a 'data' mesh axis (chunking would
        # serialize what the mesh parallelizes).
        ck = self._infer_chunk
        b = clip_u8.shape[0]
        data_axis = (self.mesh.shape.get("data", 1)
                     if self.mesh is not None else 1)
        if ck and b > ck and b % ck == 0 and data_axis == 1:
            args = (clip_u8, pad_mask, lfb_feats, lfb_mask)
            outs = jax.lax.map(
                lambda a: self._detect_core(variables, *a),
                tuple(x.reshape(b // ck, ck, *x.shape[1:]) for x in args))
            return tuple(o.reshape(b, *o.shape[2:]) for o in outs)
        return self._detect_core(variables, clip_u8, pad_mask, lfb_feats,
                                 lfb_mask)

    def _detect_core(self, variables, clip_u8, pad_mask, lfb_feats,
                     lfb_mask):
        clips = device_preprocess(clip_u8, dtype=jnp.float32,
                                  pad_mask=pad_mask)
        kw = {}
        if self.memory is not None:
            kw = dict(lfb_features=lfb_feats, lfb_mask=lfb_mask)
        out = self.model.apply(variables, clips, pad_mask, train=False,
                               return_features=True, **kw)
        size = jnp.asarray([[self.img_size, self.img_size]], jnp.float32)
        if self.is_ava:
            # gate action scores at the serving threshold (postprocess's
            # 0.8 default is the offline-eval reference value; a lower
            # serving threshold would otherwise emit all-zero scores)
            scores, boxes, binary = postprocess_ava(
                out, size, binary_gate=self.actor_threshold)
        else:
            scores, boxes, binary = postprocess_softmax(out, size)
        return scores, boxes, binary, out["lfb_features"]

    # -- host loop --------------------------------------------------------

    def _prep_frame(self, frame: np.ndarray) -> np.ndarray:
        """Aspect-preserving resize onto the fixed canvas (top-left)."""
        h, w = frame.shape[:2]
        if self._src_hw != (h, w):
            # (re)compute on first frame AND on mid-stream resolution
            # changes — a stale scale would map boxes to wrong geometry.
            # Buffered frames were canvas-resized at the OLD scale; a
            # mixed-scale window would anchor detections on old-geometry
            # content, so the clip window restarts at the new resolution.
            if self._src_hw is not None:
                self._frames.clear()
            self._src_hw = (h, w)
            self._scale = self.img_size / max(h, w)
        nh = max(1, int(round(h * self._scale)))
        nw = max(1, int(round(w * self._scale)))
        if (nh, nw) != (h, w):
            from PIL import Image

            frame = np.asarray(Image.fromarray(frame).resize(
                (nw, nh), Image.BILINEAR))
        canvas = np.zeros((self.img_size, self.img_size, 3), np.uint8)
        canvas[:nh, :nw] = frame
        self._valid_hw = (nh, nw)
        return canvas

    def reset(self) -> None:
        self._frames.clear()
        self._frame_count = 0
        self._since_detect = 0
        if self.memory is not None:
            self.memory.feats.clear()
            self.memory.valid.clear()

    def push_frame(self, frame: np.ndarray) -> Optional[KeyframeResult]:
        """Feed one (H, W, 3) uint8 RGB frame; returns a result when a
        keyframe detection fires, else None."""
        self._frames.append(self._prep_frame(frame))
        self._frame_count += 1
        self._since_detect += 1
        window = self.t_len * self.stride
        if len(self._frames) < window or self._since_detect < self.detect_every:
            return None
        self._since_detect = 0
        return self._run_detection()

    def flush(self) -> Optional[KeyframeResult]:
        """Run a final detection on the current (possibly short) buffer by
        repeating the last frame to fill the window."""
        if not self._frames:
            return None
        while len(self._frames) < self._frames.maxlen:
            self._frames.append(self._frames[-1])
        return self._run_detection()

    def _run_detection(self) -> KeyframeResult:
        t0 = time.perf_counter()
        frames = list(self._frames)
        clip = np.stack(frames[:: self.stride])[None]       # (1,T,H,W,3)
        nh, nw = self._valid_hw
        pad = np.ones((1, self.img_size, self.img_size), bool)
        pad[:, :nh, :nw] = False

        if self.memory is not None:
            mem, mmask = self.memory.window()
            mem, mmask = mem[None], mmask[None]
            mem_size = int((~mmask).sum())
        else:
            l0 = 1  # unused placeholder shapes
            mem = np.zeros((1, l0, self.cfg.model.d_model), np.float32)
            mmask = np.ones((1, l0), bool)
            mem_size = 0

        # one host fetch for all outputs: each np.asarray is its own
        # device round trip (~30 ms each over a TPU relay)
        scores, boxes, binary, feats = jax.device_get(
            self._detect(self.variables, clip, pad, mem, mmask))
        scores, boxes = scores[0], boxes[0]
        binary = _per_query_binary(binary[0], scores.shape[0])
        feats = feats[0]

        if self.memory is not None:
            self.memory.push(feats, binary, self.actor_threshold)

        # Map canvas-pixel boxes back to source-frame pixels.
        boxes = boxes / self._scale
        sh, sw = self._src_hw
        boxes = np.clip(boxes, 0, [sw, sh, sw, sh])

        dets = [
            Detection(box=boxes[q], actor_prob=float(binary[q]),
                      scores=scores[q])
            for q in range(len(binary))
            if binary[q] > self.actor_threshold
        ]
        # keyframe = center of the clip window (ava_frame.py:43)
        key_idx = self._frame_count - self.t_len * self.stride // 2
        return KeyframeResult(
            frame_index=key_idx,
            time_s=key_idx / self.fps,
            detections=dets,
            latency_ms=(time.perf_counter() - t0) * 1e3,
            memory_size=mem_size,
        )


class StreamingDetectorPool:
    """Multi-stream serving: many concurrent video streams share one model,
    and all streams whose keyframe is due are detected in ONE padded batched
    forward (compiled per power-of-two bucket, so at most log2(max_batch)
    programs exist).

    Usage: ``push_frame(stream_id, frame)`` per stream per tick, then
    ``step()`` — returns ``{stream_id: KeyframeResult}`` for every stream
    that fired. Per-stream rolling clip windows and (with ``cfg.use_lfb``)
    per-stream long-term memories are kept independently.

    Thread-safe: per-stream receiver threads may call ``push_frame`` /
    ``close_stream`` / ``set_deadline`` concurrently with a scheduler
    thread calling ``step()``. The pool lock is NOT held across the device
    forward — stream state is snapshotted per chunk, so frames keep
    flowing while a batch is on the chip; a stream closed mid-forward
    simply drops its result.
    """

    def __init__(self, cfg: Config, variables=None, *, max_batch: int = 8,
                 detect_every: Optional[int] = None, fps: float = 30.0,
                 memory_keyframes: int = 10, memory_slots: int = 5,
                 actor_threshold: float = 0.8, rng_seed: int = 0,
                 mesh=None, instrument: bool = False,
                 infer_chunk: Optional[int] = None):
        self.max_batch = max_batch
        # instrument=True decomposes each step's latency into host-assemble /
        # upload / execute+fetch (one extra tiny fetch per chunk to fence the
        # upload — measurement only, keep off in production). Per-chunk dicts
        # land in ``self.last_timing`` after every step().
        self.instrument = instrument
        self.last_timing: List[Dict] = []
        # template detector owns the model/variables and the prep logic;
        # the pool defaults to bs=2 chunked inference (measured no-batch-tax
        # path; detections numerically equivalent within float tolerance —
        # the chunked kernels differ from the bs>=4 kernels, parity tests
        # assert atol 1e-3/1e-4) unless the config pins a chunk size or
        # the caller overrides (0 disables)
        if infer_chunk is None:
            infer_chunk = cfg.model.infer_chunk or 2
        self._tpl = StreamingDetector(
            cfg, variables, detect_every=detect_every, fps=fps,
            memory_keyframes=memory_keyframes, memory_slots=memory_slots,
            actor_threshold=actor_threshold, rng_seed=rng_seed, mesh=mesh,
            infer_chunk=infer_chunk)
        self._mk = (memory_keyframes, memory_slots)
        self._streams: Dict = {}
        import threading

        # guards _streams and all per-stream mutable state (frame deques,
        # cadence counters, memory); never held across the device forward
        self._lock = threading.RLock()

    def warmup(self) -> None:
        """Pre-compile the batched detect for every bucket ``step()`` can
        emit (powers of two below ``max_batch``, plus ``max_batch``), so the
        first live keyframe never pays a cold jit against its deadline."""
        t = self._tpl
        buckets, b = {self.max_batch}, 1
        while b < self.max_batch:
            buckets.add(b)
            b *= 2
        l_mem = (t.memory.keyframes * t.memory.slots
                 if t.memory is not None else 1)
        for n in sorted(buckets):
            batch = [
                np.zeros((n, t.t_len, t.img_size, t.img_size, 3), np.uint8),
                np.zeros((n, t.img_size, t.img_size), bool),
                np.zeros((n, l_mem, t.cfg.model.d_model), np.float32),
                np.ones((n, l_mem), bool),
            ]
            if (t._data_sharding is not None and t.mesh is not None
                    and n % t.mesh.shape.get("data", 1) == 0):
                batch = [jax.device_put(a, t._data_sharding) for a in batch]
            jax.block_until_ready(t._detect(t.variables, *batch))

    def _stream(self, sid):
        if sid not in self._streams:
            t = self._tpl
            s = StreamingDetector.__new__(StreamingDetector)
            s.__dict__.update(t.__dict__)      # share model/jit/config
            s._frames = deque(maxlen=t.t_len * t.stride)
            s._frame_count = 0
            s._since_detect = 0
            s._src_hw = None
            s._scale = 1.0
            s._deadline_ms = None
            s._due_at = None
            s._priority = 0
            s.memory = (_Memory(self._mk[1], self._mk[0],
                                t.cfg.model.d_model)
                        if t.memory is not None else None)
            self._streams[sid] = s
        return self._streams[sid]

    def close_stream(self, sid) -> None:
        """Drop a finished stream's frame buffer and long-term memory. The
        pool never evicts on its own — a server with churning stream ids
        must close streams or the per-stream canvases (~12 MB each at
        256px/T=32) accumulate unboundedly."""
        with self._lock:
            self._streams.pop(sid, None)

    def set_deadline(self, sid, deadline_ms: Optional[float]) -> None:
        """Latency SLO for one stream: maximum milliseconds between a
        keyframe becoming due and its detection being served. Streams with
        tighter remaining slack are scheduled first when more streams are
        due than ``max_batch`` can serve in one forward (deadline-monotonic
        admission; None = best-effort, scheduled after all SLO streams)."""
        with self._lock:
            self._stream(sid)._deadline_ms = deadline_ms

    def set_priority(self, sid, priority: int) -> None:
        """Priority class for one stream (default 0; higher = served
        first). Scheduling order is (priority class desc, deadline slack
        asc): priority partitions streams into strict tiers, and within a
        tier the deadline-monotonic rule applies — so a priority-1 stream
        is admitted before ANY priority-0 stream, even one about to miss
        its SLO. Use priorities for product tiers (paying camera vs
        best-effort) and deadlines for latency targets within a tier."""
        with self._lock:
            self._stream(sid)._priority = int(priority)

    def push_frame(self, sid, frame: np.ndarray) -> None:
        """Feed one frame of one stream (no detection yet; see step())."""
        with self._lock:
            s = self._stream(sid)
            s._frames.append(s._prep_frame(frame))
            s._frame_count += 1
            s._since_detect += 1
            window = s.t_len * s.stride
            if (s._due_at is None and len(s._frames) >= window
                    and s._since_detect >= s.detect_every):
                s._due_at = time.perf_counter()

    def _due(self):
        """Due streams: highest priority class first, then tightest
        remaining deadline slack (see set_priority / set_deadline)."""
        now = time.perf_counter()
        out = []
        for sid, s in self._streams.items():
            window = s.t_len * s.stride
            if (len(s._frames) >= window
                    and s._since_detect >= s.detect_every):
                dl = getattr(s, "_deadline_ms", None)
                waited = (now - s._due_at) * 1e3 \
                    if getattr(s, "_due_at", None) is not None else 0.0
                slack = float("inf") if dl is None else dl - waited
                out.append((-getattr(s, "_priority", 0), slack, sid))
        out.sort(key=lambda p: p[:2])
        return [sid for _, _, sid in out]

    def step(self, max_chunks: Optional[int] = None) -> Dict:
        """Run padded batched detections over the due streams, tightest
        deadline first. ``max_chunks`` bounds the forwards per call
        (overflow streams stay due and lead the next step)."""
        with self._lock:
            due = self._due()
        self.last_timing = []
        if not due:
            return {}
        if max_chunks is not None:
            due = due[: max_chunks * self.max_batch]
        results: Dict = {}
        t = self._tpl
        for chunk_start in range(0, len(due), self.max_batch):
            chunk = due[chunk_start:chunk_start + self.max_batch]
            # snapshot each stream's inputs + geometry under the lock; the
            # device forward runs unlocked so receiver threads keep pushing
            clips, pads, mems, mmasks, snaps = [], [], [], [], []
            with self._lock:
                for sid in chunk:
                    s = self._streams.get(sid)
                    if s is None:       # closed since _due()
                        continue
                    clips.append(np.stack(list(s._frames)[:: s.stride]))
                    nh, nw = s._valid_hw
                    p = np.ones((t.img_size, t.img_size), bool)
                    p[:nh, :nw] = False
                    pads.append(p)
                    if s.memory is not None:
                        f, m = s.memory.window()
                    else:
                        f = np.zeros((1, t.cfg.model.d_model), np.float32)
                        m = np.ones((1,), bool)
                    mems.append(f)
                    mmasks.append(m)
                    snaps.append((sid, s._frame_count, s._scale, s._src_hw,
                                  s._since_detect, s._due_at, s._deadline_ms,
                                  s.memory is not None))
            n = len(snaps)
            if not n:
                continue
            bucket = 1
            while bucket < n:
                bucket *= 2
            # max_batch bounds the compiled batch even when it is not a
            # power of two (chunk of 5, max_batch 6: bucket 6, not 8)
            bucket = min(bucket, self.max_batch)
            pad_n = bucket - n
            if pad_n:
                clips += [np.zeros_like(clips[0])] * pad_n
                pads += [pads[0]] * pad_n
                mems += [mems[0]] * pad_n
                mmasks += [mmasks[0]] * pad_n
            t0 = time.perf_counter()
            batch = [np.stack(clips), np.stack(pads),
                     np.stack(mems), np.stack(mmasks)]
            t_assemble = time.perf_counter() - t0
            t_up = 0.0
            if (t._data_sharding is not None and t.mesh is not None
                    and bucket % t.mesh.shape.get("data", 1) == 0):
                # split the padded bucket over the 'data' axis so every
                # chip works a slice (TP chips still cooperate per slice)
                batch = [jax.device_put(a, t._data_sharding) for a in batch]
            if self.instrument:
                # fence the host->device transfer so upload and execute
                # separate: a 1-element fetch that depends on the clip
                # tensor cannot return before the upload lands (the relay
                # never blocks on block_until_ready, only on a fetch)
                t1 = time.perf_counter()
                batch = [jax.device_put(a) if isinstance(a, np.ndarray)
                         else a for a in batch]
                jax.device_get(batch[0].ravel()[0])
                t_up = time.perf_counter() - t1
            t2 = time.perf_counter()
            scores, boxes, binary, feats = jax.device_get(t._detect(
                t.variables, *batch))
            lat = (time.perf_counter() - t0) * 1e3
            self.last_timing.append({
                "bucket": bucket, "streams": n,
                "assemble_ms": round(t_assemble * 1e3, 2),
                "upload_ms": round(t_up * 1e3, 2),
                "exec_fetch_ms": round((time.perf_counter() - t2) * 1e3, 2),
            })
            now = time.perf_counter()
            with self._lock:
                for i, (sid, frame_count, scale, src_hw, sd0, due_at, dl,
                        has_mem) in enumerate(snaps):
                    s = self._streams.get(sid)
                    if s is None:
                        continue        # closed mid-forward: drop result
                    # cadence resets only now that a result exists: an
                    # exception from the forward leaves the streams due,
                    # so a retried step() serves the same keyframes
                    # instead of silently skipping a full detect_every
                    # interval. Subtract the snapshot (not =0) to keep
                    # frames pushed mid-forward.
                    s._since_detect -= sd0
                    s._due_at = None
                    bin_i = _per_query_binary(binary[i], scores.shape[1])
                    if s.memory is not None:
                        s.memory.push(feats[i], bin_i, s.actor_threshold)
                    b = boxes[i] / scale
                    sh, sw = src_hw
                    b = np.clip(b, 0, [sw, sh, sw, sh])
                    dets = [Detection(box=b[q], actor_prob=float(bin_i[q]),
                                      scores=scores[i][q])
                            for q in range(len(bin_i))
                            if bin_i[q] > t.actor_threshold]
                    key_idx = frame_count - t.t_len * t.stride // 2
                    waited = ((now - due_at) * 1e3
                              if due_at is not None else 0.0)
                    results[sid] = KeyframeResult(
                        frame_index=key_idx, time_s=key_idx / t.fps,
                        detections=dets, latency_ms=lat,
                        memory_size=int((~np.asarray(mmasks[i])).sum()
                                        if has_mem else 0),
                        waited_ms=waited,
                        deadline_met=None if dl is None else waited <= dl)
        return results
