"""HTTP serving front-end (serving_http.DetectionServer): stream lifecycle,
JPEG and raw frame ingestion, long-poll result delivery, stats, and
concurrent-client batching through the scheduler thread."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tubelet_transformer_tpu.config import Config


def _cfg():
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
    return cfg


def _req(method, url, body=None, headers=None, timeout=120):
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    from tubelet_transformer_tpu.serving_http import DetectionServer

    # admit everything so random weights still emit detections; tight
    # cadence so a handful of frames fires a keyframe
    srv = DetectionServer(_cfg(), host="127.0.0.1", port=0, max_batch=4,
                          detect_every=4, fps=8.0, actor_threshold=-1.0)
    srv.start()
    yield srv
    srv.stop()


def _base(server):
    return f"http://127.0.0.1:{server.port}"


def _frame(h=48, w=64, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def _push_raw(base, sid, frame):
    h, w, _ = frame.shape
    return _req("POST", f"{base}/v1/streams/{sid}/frames",
                body=frame.tobytes(),
                headers={"Content-Type": "application/octet-stream",
                         "X-Frame-Shape": f"{h}x{w}x3"})


def test_health_and_stats(server):
    base = _base(server)
    code, health = _req("GET", f"{base}/healthz")
    assert code == 200 and health["status"] == "ok"
    code, stats = _req("GET", f"{base}/v1/stats")
    assert code == 200 and stats["max_batch"] == 4


def test_stream_lifecycle_and_detections(server):
    base = _base(server)
    code, r = _req("POST", f"{base}/v1/streams",
                   body=json.dumps({"deadline_ms": 5000}).encode())
    assert code == 201
    sid = r["stream_id"]

    # window = T(8) * stride(2) = 16 frames; detect_every=4
    frame = _frame()
    for _ in range(16):
        code, r = _push_raw(base, sid, frame)
        assert code == 200
    assert r["frames"] == 16

    # long-poll: the scheduler thread must deliver within the timeout
    code, res = _req(
        "GET", f"{base}/v1/streams/{sid}/results?timeout_s=60")
    assert code == 200
    assert len(res["results"]) >= 1
    kf = res["results"][0]
    assert kf["deadline_met"] is True          # SLO was set and generous
    assert kf["detections"], "threshold -1 admits every query"
    det = kf["detections"][0]
    assert len(det["box"]) == 4
    assert len(det["top_actions"]) == 5        # num_classes=5 -> all of them
    # boxes map back to SOURCE pixels (64x48 frame, not the 32px canvas)
    assert all(0 <= det["box"][i] <= 64 for i in (0, 2))

    # full_scores variant ships the whole class vector
    for _ in range(4):
        _push_raw(base, sid, frame)
    code, res = _req(
        "GET", f"{base}/v1/streams/{sid}/results?timeout_s=60&full_scores=1")
    assert code == 200 and res["results"]
    assert len(res["results"][0]["detections"][0]["scores"]) == 5

    code, r = _req("DELETE", f"{base}/v1/streams/{sid}")
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _push_raw(base, sid, frame)
    assert ei.value.code == 404


def test_jpeg_ingestion(server):
    from PIL import Image

    base = _base(server)
    _, r = _req("POST", f"{base}/v1/streams", body=b"{}")
    sid = r["stream_id"]
    buf = io.BytesIO()
    Image.fromarray(_frame()).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    for _ in range(16):
        code, _ = _req("POST", f"{base}/v1/streams/{sid}/frames", body=jpeg,
                       headers={"Content-Type": "image/jpeg"})
        assert code == 200
    code, res = _req("GET", f"{base}/v1/streams/{sid}/results?timeout_s=60")
    assert code == 200 and len(res["results"]) >= 1
    _req("DELETE", f"{base}/v1/streams/{sid}")


def test_bad_requests(server):
    base = _base(server)
    for method, path, body, hdrs, want in [
        ("GET", "/nope", None, None, 404),
        ("POST", "/v1/streams/sZZ/frames", b"x", None, 404),
        ("GET", "/v1/streams/sZZ/results", None, None, 404),
        ("DELETE", "/v1/streams/sZZ", None, None, 404),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(method, f"{base}{path}", body=body, headers=hdrs)
        assert ei.value.code == want
    # malformed raw frame: shape/byte-count mismatch is a 400, not a crash
    _, r = _req("POST", f"{base}/v1/streams", body=b"")
    sid = r["stream_id"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req("POST", f"{base}/v1/streams/{sid}/frames", body=b"abc",
             headers={"Content-Type": "application/octet-stream",
                      "X-Frame-Shape": "48x64x3"})
    assert ei.value.code == 400
    _req("DELETE", f"{base}/v1/streams/{sid}")


def test_python_client_round_trip(server):
    """DetectionClient speaks the same wire API end-to-end: open, raw push,
    JPEG push, long-poll results, full_scores, close (idempotent)."""
    from PIL import Image

    from tubelet_transformer_tpu.client import DetectionClient, ServingError

    client = DetectionClient(_base(server))
    assert client.health()["status"] == "ok"
    assert client.stats()["max_batch"] == 4

    with client.open_stream(deadline_ms=5000) as stream:
        frame = _frame(seed=7)
        for _ in range(16):
            stream.push(frame)
        results = stream.results(timeout_s=60)
        assert results
        det = results[0]["detections"][0]
        assert len(det["box"]) == 4 and len(det["top_actions"]) == 5
        assert results[0]["deadline_met"] is True

        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG")
        for _ in range(4):
            stream.push_jpeg(buf.getvalue())
        results = stream.results(timeout_s=60, full_scores=True)
        assert results and len(results[0]["detections"][0]["scores"]) == 5

        with pytest.raises(ValueError):
            stream.push(np.zeros((4, 4), np.uint8))       # not (H, W, 3)
    stream.close()                                        # second close: no-op

    # pushing to the closed stream surfaces the server's 404 as ServingError
    with pytest.raises(ServingError) as ei:
        stream.push(_frame())
    assert ei.value.code == 404


def test_concurrent_streams_share_batches(server):
    """N clients feed concurrently; every stream gets its keyframes and the
    scheduler batches due streams together (pool semantics, via HTTP)."""
    base = _base(server)
    sids = []
    for _ in range(3):
        _, r = _req("POST", f"{base}/v1/streams", body=b"")
        sids.append(r["stream_id"])

    errs = []

    def feed(sid, seed):
        try:
            f = _frame(seed=seed)
            for _ in range(20):
                _push_raw(base, sid, f)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=feed, args=(sid, i))
               for i, sid in enumerate(sids)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for sid in sids:
        code, res = _req(
            "GET", f"{base}/v1/streams/{sid}/results?timeout_s=60")
        assert code == 200
        assert len(res["results"]) >= 1, sid
        _req("DELETE", f"{base}/v1/streams/{sid}")
