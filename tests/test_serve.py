"""Serving daemon: HTTP contract, dynamic batching, stats, lifecycle.

The daemon (ssd_tpu/serve.py) is the framework's production-serving layer
(SURVEY.md §3.3 L7 — the reference exports a SavedModel and stops; here the
serving loop is part of the framework). Tests run the real HTTP stack on a
loopback port with a tiny CPU model.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.predictor import Predictor
from ssd_tpu.serve import DetectionServer, ServerStats

CFG = Config(
    num_classes=3, image_size=64,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    nms=NMSConfig(max_boxes=8, num_candidates=64, pre_nms_top_k=32),
)


def _jpeg_bytes(rng, h=50, w=70) -> bytes:
    arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    det = Detector(CFG)
    predictor = Predictor(CFG, det.init(jax.random.PRNGKey(0)),
                          label_map={1: "cat", 2: "dog"})
    predictor.warmup(1)
    srv = DetectionServer(predictor, host="127.0.0.1", port=0,
                          max_batch=8, max_wait_ms=30.0,
                          default_score_threshold=0.0)
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body: bytes, path="/v1/detect"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_reports_model(server):
    status, body = _get(server, "/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["model"]["image_size"] == [64, 64]
    assert body["model"]["num_classes"] == 3


def test_detect_single_image(server):
    rng = np.random.default_rng(0)
    status, body = _post(server, _jpeg_bytes(rng))
    assert status == 200
    assert "detections" in body
    for det in body["detections"]:
        assert len(det["box_yxyx"]) == 4
        assert 0.0 <= det["score"] <= 1.0
        assert "name" in det  # label_map was provided


def test_score_threshold_query_param(server):
    rng = np.random.default_rng(1)
    body = _jpeg_bytes(rng)
    _, all_dets = _post(server, body, "/v1/detect?score_threshold=0")
    _, none = _post(server, body, "/v1/detect?score_threshold=1.01")
    assert none["detections"] == []
    assert len(all_dets["detections"]) >= len(none["detections"])


def test_concurrent_requests_are_batched(server):
    """Fire 8 simultaneous requests; the dispatcher must coalesce at least
    some into multi-image batches (max_wait 30 ms, max_batch 8)."""
    batches_before = server.stats.batches
    images_before = server.stats.images
    rng = np.random.default_rng(2)
    bodies = [_jpeg_bytes(rng) for _ in range(8)]
    results = [None] * 8
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        results[i] = _post(server, bodies[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    new_images = server.stats.images - images_before
    new_batches = server.stats.batches - batches_before
    assert new_images == 8
    # batching happened: fewer device calls than requests
    assert new_batches < 8


def test_batched_results_match_direct_predict(server):
    """A request served through the daemon must equal Predictor.predict on
    the same decoded image (batching must not change results)."""
    rng = np.random.default_rng(3)
    body = _jpeg_bytes(rng)
    _, via_http = _post(server, body, "/v1/detect?score_threshold=0")

    from ssd_tpu.data import native
    image = native.decode_jpeg(body, 64, 64)
    direct = server.predictor.predict(image)
    n = int(direct["num_boxes"])
    got = via_http["detections"]
    assert len(got) == n
    for i in range(n):
        np.testing.assert_allclose(
            got[i]["box_yxyx"], direct["boxes"][i], atol=1e-4)
        assert got[i]["label"] == int(direct["labels"][i])


def test_bad_request_returns_500_and_counts_error(server):
    errors_before = server.stats.errors
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/detect",
        data=b"not an image", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
        body = json.loads(e.read())
        assert "error" in body
    assert status == 500
    assert server.stats.errors == errors_before + 1


def test_unknown_path_404(server):
    try:
        _get(server, "/nope")
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_stats_endpoint_shape(server):
    status, body = _get(server, "/v1/stats")
    assert status == 200
    assert {"requests", "errors", "batches", "images",
            "mean_batch_size", "batch_latency_ms"} <= set(body)
    assert body["images"] >= body["batches"]


def test_stats_reservoir_is_bounded():
    s = ServerStats(window=16)
    for i in range(100):
        s.record_batch(4, 0.01)
    snap = s.snapshot()
    assert snap["batches"] == 100
    assert snap["images"] == 400
    assert len(s._lat_ms) == 16
    assert snap["batch_latency_ms"]["p50"] == 10.0


def test_collect_error_propagates_per_request(server):
    """Errors in the collect half (readback) must also surface as 500s
    without killing the collector thread."""
    orig = server.predictor.predict_collect
    server.predictor.predict_collect = lambda h: (_ for _ in ()).throw(
        RuntimeError("collect boom"))
    try:
        rng = np.random.default_rng(5)
        try:
            _post(server, _jpeg_bytes(rng))
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 500
    finally:
        server.predictor.predict_collect = orig
    status, _ = _get(server, "/healthz")
    assert status == 200
    # and the pipeline still serves real requests
    status, body = _post(server, _jpeg_bytes(np.random.default_rng(6)))
    assert status == 200 and "detections" in body


def test_daemon_serves_tta_predictor():
    """The daemon's pipeline (dispatch/collect, warmup, stats) must work
    through a TTAPredictor — requests return fused detections."""
    from ssd_tpu.tta import TTAPredictor

    det = Detector(CFG)
    inner = Predictor(CFG, det.init(jax.random.PRNGKey(0)))
    srv = DetectionServer(TTAPredictor(inner), host="127.0.0.1", port=0,
                          max_batch=4, max_wait_ms=10.0,
                          default_score_threshold=0.0)
    srv.warmup()
    assert 8 in inner._jitted  # 4-request batch -> 8 device images
    srv.start()
    try:
        rng = np.random.default_rng(9)
        status, body = _post(srv, _jpeg_bytes(rng))
        assert status == 200 and "detections" in body
        assert srv.stats.images == 1
    finally:
        srv.stop()


def test_stop_fails_queued_requests_fast():
    """Undispatched queued requests must resolve (with an error) on stop,
    not hang their handler threads until the request timeout."""
    from concurrent.futures import Future

    from ssd_tpu.serve import _Dispatcher
    import queue as queue_mod

    q = queue_mod.Queue()
    d = _Dispatcher(predictor=None, requests=q, stats=ServerStats(),
                    max_batch=4, max_wait_ms=1.0)
    fut = Future()
    d.start()
    d.stop()
    q.put((np.zeros((4, 4, 3), np.uint8), fut))  # lands after stop
    d.join(timeout=5)
    # the dispatcher drained the queue on exit and failed the future
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=5)


def test_warmup_compiles_every_reachable_bucket():
    """server.warmup() must pre-compile every bucket the dynamic batcher
    can form (ragged sizes pad to pow2 buckets) — a cold bucket on the
    request path is an XLA compile while requests queue."""
    det = Detector(CFG)
    predictor = Predictor(CFG, det.init(jax.random.PRNGKey(0)))
    srv = DetectionServer(predictor, host="127.0.0.1", port=0, max_batch=8)
    srv.warmup()
    assert set(predictor._jitted) >= {1, 2, 4, 8}
    srv.httpd.server_close()


def test_dispatcher_error_propagates_per_request(server):
    """If predict raises, the waiting request gets a 500, and the server
    keeps serving afterwards."""
    orig = server.predictor.predict_dispatch
    server.predictor.predict_dispatch = lambda imgs: (_ for _ in ()).throw(
        RuntimeError("boom"))
    try:
        rng = np.random.default_rng(4)
        try:
            _post(server, _jpeg_bytes(rng))
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 500
    finally:
        server.predictor.predict_dispatch = orig
    # still alive
    status, _ = _get(server, "/healthz")
    assert status == 200


def test_scan_depth_groups_queued_batches():
    """Throughput mode (--scan-depth K): batches already in the queue are
    grouped into one scan-K device call; results must match direct
    predict. Deterministic: requests are enqueued BEFORE the dispatcher
    starts, so grouping is guaranteed (first batch + K-1 extras)."""
    import concurrent.futures

    rng = np.random.default_rng(7)
    det = Detector(CFG)
    predictor = Predictor(CFG, det.init(jax.random.PRNGKey(0)))
    srv = DetectionServer(predictor, host="127.0.0.1", port=0,
                          max_batch=1, max_wait_ms=0.0, scan_depth=4)
    assert srv.dispatcher.scan_depth == 4
    images = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
              for _ in range(6)]
    futs = [concurrent.futures.Future() for _ in images]
    for im, fut in zip(images, futs):
        srv.requests.put((im, fut))
    srv.dispatcher.start()
    try:
        for im, fut in zip(images, futs):
            out = fut.result(timeout=120)
            direct = predictor.predict(im)
            np.testing.assert_allclose(direct["boxes"], out["boxes"],
                                       atol=1e-6)
            np.testing.assert_array_equal(direct["num_boxes"],
                                          out["num_boxes"])
        # the scan program was actually built and used
        assert any(isinstance(k, tuple) and "scan" in k
                   for k in predictor._jitted)
    finally:
        srv.dispatcher.stop()
        srv.dispatcher.join(timeout=10)
