"""Streaming serving loop: rolling clip window, keyframe cadence, static
shapes, online long-term memory feedback (serving.StreamingDetector)."""

import numpy as np

from tubelet_transformer_tpu.config import Config
from tubelet_transformer_tpu.serving import StreamingDetector


def _cfg(use_lfb=False):
    cfg = Config()
    cfg.data.dataset_name = "ava"
    cfg.data.num_classes = 5
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.data.frame_rate = 2
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 2
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    cfg.use_lfb = use_lfb
    return cfg


def _frames(n, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_streaming_cadence_and_shapes():
    det = StreamingDetector(_cfg(), fps=8.0, detect_every=8)
    results = [r for f in _frames(40) if (r := det.push_frame(f))]
    # window fills at frame 16 (T=8 * stride 2); detections at the
    # detect_every cadence afterwards
    assert len(results) == 4  # window fills at frame 16; then every 8
    for r in results:
        # keyframe is the window center
        assert r.frame_index > 0
        for d in r.detections:
            assert d.box.shape == (4,)
            assert d.scores.shape == (5,)
            # boxes are in source pixels
            assert 0 <= d.box[0] <= 64 and 0 <= d.box[3] <= 48
    # timestamps increase with the cadence
    assert results[1].frame_index - results[0].frame_index == 8


def test_streaming_lfb_memory_grows():
    det = StreamingDetector(_cfg(use_lfb=True), fps=8.0, detect_every=4,
                            memory_keyframes=3, memory_slots=2,
                            actor_threshold=-1.0)  # admit everything
    sizes = [r.memory_size
             for f in _frames(48) if (r := det.push_frame(f))]
    assert len(sizes) >= 4
    # memory starts empty, grows by <= slots per keyframe, caps at 3*2
    assert sizes[0] == 0
    assert max(sizes) <= 6
    assert sizes[-1] == 6
    det.reset()
    assert det.push_frame(_frames(1)[0]) is None


def test_flush_pads_short_buffer():
    det = StreamingDetector(_cfg(), fps=8.0)
    for f in _frames(5):
        assert det.push_frame(f) is None
    res = det.flush()
    assert res is not None and res.latency_ms > 0


def test_pool_batches_streams_and_matches_single():
    """The multi-stream pool must produce the same detections as a
    standalone detector fed the same frames (padded batching is invisible),
    with independent per-stream windows."""
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    cfg = _cfg()
    single = StreamingDetector(cfg, fps=8.0, detect_every=8)
    pool = StreamingDetectorPool(cfg, single.variables, fps=8.0,
                                 detect_every=8, max_batch=4)

    frames_a = _frames(24, seed=1)
    frames_b = _frames(24, h=32, w=48, seed=2)   # different geometry
    singles = []
    for f in frames_a:
        r = single.push_frame(f)
        if r:
            singles.append(r)

    pooled = []
    for fa, fb in zip(frames_a, frames_b):
        pool.push_frame("a", fa)
        pool.push_frame("b", fb)
        out = pool.step()
        if "a" in out:
            pooled.append(out["a"])
        if "b" in out:
            # stream b fires too and has its own geometry
            assert out["b"].detections is not None

    assert len(pooled) == len(singles) == 2
    for rs, rp in zip(singles, pooled):
        assert rs.frame_index == rp.frame_index
        assert len(rs.detections) == len(rp.detections)
        for ds, dp in zip(rs.detections, rp.detections):
            np.testing.assert_allclose(ds.box, dp.box, atol=1e-3)
            np.testing.assert_allclose(ds.scores, dp.scores, atol=1e-4)


def test_pool_deadline_scheduling():
    """Deadline-monotonic admission: when more streams are due than one
    step may serve (max_chunks bound), the tightest-slack SLO streams go
    first; best-effort (no-SLO) streams wait; served results report
    waited_ms and deadline_met."""
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    cfg = _cfg()
    pool = StreamingDetectorPool(cfg, fps=8.0, detect_every=8, max_batch=2)
    # generous absolute values: the subject is the ORDERING (tight < loose)
    # and the reporting fields; the first step pays a jit compile that can
    # exceed 10 s on a loaded CI host (observed flake in the fast tier)
    pool.set_deadline("tight", 120_000.0)
    pool.set_deadline("loose", 600_000.0)
    # "easy" has no SLO -> scheduled last

    frames = _frames(16, seed=3)
    for f in frames:
        for sid in ("easy", "tight", "loose"):
            pool.push_frame(sid, f)

    due_order = pool._due()
    assert due_order == ["tight", "loose", "easy"]

    out = pool.step(max_chunks=1)           # one forward of max_batch=2
    assert set(out) == {"tight", "loose"}
    assert out["tight"].deadline_met is True
    assert out["tight"].waited_ms >= 0.0

    out2 = pool.step(max_chunks=1)          # overflow stream next
    assert set(out2) == {"easy"}
    assert out2["easy"].deadline_met is None  # best-effort stream
    assert pool._due() == []                  # everything served


def test_pool_priority_classes_override_deadlines():
    """set_priority partitions scheduling into strict tiers: a priority-1
    stream is admitted before ANY priority-0 stream (even one with a tight
    SLO); within a tier the deadline-monotonic order still applies."""
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    cfg = _cfg()
    pool = StreamingDetectorPool(cfg, fps=8.0, detect_every=8, max_batch=2)
    pool.set_deadline("tight0", 1_000.0)      # priority 0, tight SLO
    pool.set_priority("vip", 1)               # priority 1, best-effort
    pool.set_priority("vip_loose", 1)
    pool.set_deadline("vip_loose", 60_000.0)  # priority 1, loose SLO

    for f in _frames(16, seed=4):
        for sid in ("tight0", "vip", "vip_loose"):
            pool.push_frame(sid, f)

    # tier 1 first (vip_loose has a deadline so it precedes best-effort
    # vip inside its tier), tier 0 last regardless of its tight SLO
    assert pool._due() == ["vip_loose", "vip", "tight0"]

    out = pool.step(max_chunks=1)            # one forward of max_batch=2
    assert set(out) == {"vip_loose", "vip"}
    out2 = pool.step(max_chunks=1)
    assert set(out2) == {"tight0"}
    assert pool._due() == []


def test_tp_serving_matches_single_device():
    """Multi-chip serving: params sharded over the 'model' mesh axis must
    reproduce the replicated detector's outputs (single stream and pool)."""
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    cfg = _cfg(use_lfb=True)
    base = StreamingDetector(cfg, fps=8.0, detect_every=8)
    mesh = mesh_lib.create_mesh(2, 4)   # 2 data x 4 model over 8 CPU devs
    tp = StreamingDetector(cfg, base.variables, fps=8.0, detect_every=8,
                           mesh=mesh)

    frames = _frames(24, seed=3)
    got_base = [r for f in frames if (r := base.push_frame(f))]
    got_tp = [r for f in frames if (r := tp.push_frame(f))]
    assert len(got_base) == len(got_tp) == 2  # window fills @16, fires @24
    for rb, rt in zip(got_base, got_tp):
        assert rb.frame_index == rt.frame_index
        assert len(rb.detections) == len(rt.detections)
        for db, dt in zip(rb.detections, rt.detections):
            np.testing.assert_allclose(db.box, dt.box, atol=1e-3)
            np.testing.assert_allclose(db.scores, dt.scores, atol=1e-4)

    # pool over the mesh: bucket 2 divides the data axis -> sharded batch
    pool = StreamingDetectorPool(cfg, base.variables, fps=8.0,
                                 detect_every=8, max_batch=4, mesh=mesh)
    pooled_a = []
    for f in frames:
        pool.push_frame("a", f)
        pool.push_frame("b", f)
        out = pool.step()
        if "a" in out:
            pooled_a.append(out["a"])
    assert len(pooled_a) == len(got_base)
    for rp, rb in zip(pooled_a, got_base):
        assert len(rp.detections) == len(rb.detections)
        for dp, db in zip(rp.detections, rb.detections):
            np.testing.assert_allclose(dp.box, db.box, atol=1e-3)
            np.testing.assert_allclose(dp.scores, db.scores, atol=1e-4)


def test_streaming_jhmdb_clip_level_binary():
    """Non-AVA serving: postprocess_softmax emits a clip-level visibility
    (B, 1), not per-query actorness — the detector must broadcast it
    instead of crashing on a (B, Q, 1) index (review regression)."""
    cfg = _cfg()
    cfg.data.dataset_name = "jhmdb"
    cfg.data.num_classes = 4
    det = StreamingDetector(cfg, fps=8.0, detect_every=8,
                            actor_threshold=0.0)
    results = [r for f in _frames(24) if (r := det.push_frame(f))]
    assert results, "no detection fired"
    for r in results:
        # threshold 0.0 -> every tubelet query (Q * T for non-AVA)
        # becomes a detection with the broadcast clip-level visibility
        assert len(r.detections) == (cfg.model.query_num
                                     * cfg.model.temp_len)
        probs = {round(d.actor_prob, 6) for d in r.detections}
        assert len(probs) == 1  # clip-level prob broadcast to all queries


def test_streaming_resolution_change_restarts_window():
    """A mid-stream source-resolution change must flush the buffered
    canvases (mixed-scale windows corrupt box geometry) and restart."""
    det = StreamingDetector(_cfg(), fps=8.0, detect_every=8)
    for f in _frames(10, h=48, w=64):
        det.push_frame(f)
    assert len(det._frames) == 10
    det.push_frame(_frames(1, h=24, w=32, seed=1)[0])
    assert len(det._frames) == 1  # restarted at the new geometry
    assert det._src_hw == (24, 32)


def test_pool_close_stream_releases_state():
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    pool = StreamingDetectorPool(_cfg(), max_batch=2, fps=8.0,
                                 detect_every=8)
    for f in _frames(4):
        pool.push_frame("a", f)
        pool.push_frame("b", f)
    assert set(pool._streams) == {"a", "b"}
    pool.close_stream("a")
    assert set(pool._streams) == {"b"}
    pool.close_stream("missing")  # no-op


def test_pool_failed_forward_keeps_streams_due():
    """A transient device error mid-step must not consume the streams'
    keyframe cadence: the retried step() serves the SAME due keyframes
    instead of silently skipping a full detect_every interval."""
    import pytest

    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    pool = StreamingDetectorPool(_cfg(), fps=8.0, detect_every=8,
                                 max_batch=2)
    for f in _frames(16):
        pool.push_frame("a", f)
    assert pool._due() == ["a"]
    orig = pool._tpl._detect

    def boom(*a, **k):
        raise RuntimeError("transient device error")

    pool._tpl._detect = boom
    with pytest.raises(RuntimeError):
        pool.step()
    # still due: cadence resets only once a result exists
    assert pool._due() == ["a"]
    pool._tpl._detect = orig
    out = pool.step()
    assert "a" in out and pool._due() == []


def test_pool_concurrent_push_and_step():
    """Receiver threads pushing/closing streams while a scheduler thread
    runs step(): no dict-mutation crashes, no torn state, results flow."""
    import threading
    import time as _time

    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    pool = StreamingDetectorPool(_cfg(), fps=8.0, detect_every=8,
                                 max_batch=4)
    stop = threading.Event()
    errors = []

    def feeder(sid, seed):
        frames = _frames(8, seed=seed)
        i = 0
        try:
            while not stop.is_set():
                pool.push_frame(sid, frames[i % 8])
                i += 1
                if sid == "churn" and i % 40 == 0:
                    pool.close_stream(sid)
                _time.sleep(0.001)
        except Exception as exc:  # pragma: no cover - the assertion target
            errors.append(exc)

    threads = [threading.Thread(target=feeder, args=(sid, k))
               for k, sid in enumerate(["a", "b", "c", "churn"])]
    for th in threads:
        th.start()
    n_results = 0
    deadline = _time.time() + 60.0
    try:
        while n_results < 6 and _time.time() < deadline:
            out = pool.step()
            n_results += len(out)
            if not out:
                _time.sleep(0.002)
    finally:
        stop.set()
        for th in threads:
            th.join()
    assert not errors, errors
    assert n_results >= 6


def test_pool_infer_chunk_matches_unchunked():
    """MODEL.INFER_CHUNK in the pool's batched detect (lax.map over bs=2
    chunks) must not change any detection."""
    from tubelet_transformer_tpu.serving import StreamingDetectorPool

    cfg = _cfg()
    # infer_chunk=0 forces the monolithic batch (the pool now defaults to
    # bs=2 chunks, so the unchunked side must opt out explicitly)
    base = StreamingDetectorPool(cfg, fps=8.0, detect_every=8, max_batch=4,
                                 infer_chunk=0)
    cfg2 = _cfg()
    cfg2.model.infer_chunk = 2
    chunked = StreamingDetectorPool(cfg2, base._tpl.variables, fps=8.0,
                                    detect_every=8, max_batch=4)

    frames = {s: _frames(24, seed=10 + s) for s in range(4)}
    outs, outs_ck = [], []
    for i in range(24):
        for s in range(4):
            base.push_frame(s, frames[s][i])
            chunked.push_frame(s, frames[s][i])
        outs.append(base.step())
        outs_ck.append(chunked.step())

    fired = 0
    for o, oc in zip(outs, outs_ck):
        assert set(o) == set(oc)
        for sid in o:
            fired += 1
            assert len(o[sid].detections) == len(oc[sid].detections)
            for d, dc in zip(o[sid].detections, oc[sid].detections):
                np.testing.assert_allclose(dc.box, d.box, atol=1e-3)
                np.testing.assert_allclose(dc.scores, d.scores, atol=1e-4)
    assert fired > 0, "no keyframes fired"
