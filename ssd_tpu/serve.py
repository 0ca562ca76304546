"""Production HTTP serving daemon with cross-request dynamic batching.

TPU-native counterpart of the reference's serving story (SURVEY.md §3.3,
L7): the reference exports a SavedModel and leaves serving to the user;
this module ships the serving loop itself, built around the framework's
batched ``Predictor`` path (one compiled SPMD program per batch bucket).

Design (the TPU constraint drives everything): a single chip wants LARGE
batches, but HTTP clients arrive one image at a time. The daemon therefore
decouples request handling from device dispatch:

  * N handler threads (``ThreadingHTTPServer``) decode JPEGs host-side —
    via the native C++ fused decode+resize when available — and enqueue
    ``(image, Future)`` pairs;
  * ONE dispatcher thread drains the queue into batches: it waits at most
    ``max_wait_ms`` for stragglers (classic dynamic batching — latency
    bounded by the deadline, throughput by the bucket), then issues a
    single ``Predictor.predict`` for the whole batch and resolves the
    futures. Device access stays single-threaded — no lock contention on
    the jit cache, and the chip sees back-to-back batched steps.

Endpoints:
  POST /v1/detect        image bytes (jpeg/png) -> per-image detections JSON
  GET  /healthz          liveness + model identity
  GET  /v1/stats         request/batch counters, batch-size + latency stats

CLI:  python -m ssd_tpu.serve --export runs/r1/export --port 8000
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ssd_tpu.data import native
from ssd_tpu.predictor import Predictor


class ServerStats:
    """Thread-safe counters + small latency/batch-size reservoirs."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._window = window
        self.requests = 0
        self.errors = 0
        self.batches = 0
        self.images = 0
        self._lat_ms: list[float] = []
        self._batch_sizes: list[int] = []

    def record_request(self, ok: bool) -> None:
        with self._lock:
            self.requests += 1
            if not ok:
                self.errors += 1

    def record_batch(self, size: int, latency_s: float) -> None:
        with self._lock:
            self.batches += 1
            self.images += size
            for buf, v in ((self._lat_ms, latency_s * 1e3),
                           (self._batch_sizes, size)):
                buf.append(v)
                if len(buf) > self._window:
                    del buf[: len(buf) - self._window]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            sizes = self._batch_sizes[:]
        pct = lambda p: round(lat[int(p * (len(lat) - 1))], 2) if lat else None
        return {
            "requests": self.requests,
            "errors": self.errors,
            "batches": self.batches,
            "images": self.images,
            "mean_batch_size": (round(sum(sizes) / len(sizes), 2)
                                if sizes else None),
            "batch_latency_ms": {"p50": pct(0.5), "p90": pct(0.9),
                                 "p99": pct(0.99)},
        }


class _Dispatcher(threading.Thread):
    """Single device-owning thread: drains the request queue into batches
    and ISSUES them without waiting (``Predictor.predict_dispatch``). A
    bounded in-flight queue (``pipeline_depth``) feeds the collector
    thread, which blocks on results and resolves futures — so the device
    computes batch k while batch k+1 is being formed and transferred,
    and result readback never stalls dispatch."""

    def __init__(self, predictor: Predictor, requests: "queue.Queue",
                 stats: ServerStats, max_batch: int, max_wait_ms: float,
                 pipeline_depth: int = 2, scan_depth: int = 1):
        super().__init__(daemon=True, name="ssd-tpu-dispatcher")
        self.predictor = predictor
        self.requests = requests
        self.stats = stats
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # scan_depth > 1: when the queue is deep enough, group up to K
        # already-formed batches into ONE scan-K device call
        # (Predictor.predict_dispatch_group) — amortizes per-dispatch
        # relay overhead without adding wait latency (extra batches are
        # only taken from requests ALREADY queued). Single-device only.
        self.scan_depth = 1 if getattr(predictor, "mesh", None) \
            is not None else max(1, int(scan_depth))
        self.in_flight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self.collector = threading.Thread(
            target=self._collect_loop, daemon=True, name="ssd-tpu-collector")
        # NOTE: threading.Thread uses a private ``_stop`` method internally;
        # the event must not shadow it.
        self._stop_event = threading.Event()

    def start(self) -> None:
        self.collector.start()
        super().start()

    def stop(self) -> None:
        self._stop_event.set()
        self.requests.put(None)   # wake the blocking get
        self.in_flight.put(None)  # wake the collector

    def join(self, timeout=None) -> None:
        super().join(timeout)
        self.collector.join(timeout)

    def run(self) -> None:
        while not self._stop_event.is_set():
            try:
                first = self.requests.get(timeout=0.25)
            except queue.Empty:
                continue
            if first is None:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self.requests.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    break
                batch.append(item)
            groups = [batch]
            while len(groups) < self.scan_depth:
                extra = []
                while len(extra) < self.max_batch:
                    try:
                        item = self.requests.get_nowait()
                    except queue.Empty:
                        break
                    if item is None:
                        break
                    extra.append(item)
                if not extra:
                    break
                groups.append(extra)
            if len(groups) == 1:
                self._dispatch_batch(batch)
            else:
                self._dispatch_group(groups)
        # Graceful shutdown: dispatched batches still drain through the
        # collector (the stop sentinel is FIFO-behind them), but queued,
        # never-dispatched requests must fail fast instead of hanging
        # their handler threads until the request timeout.
        while True:
            try:
                item = self.requests.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                self._fail([item], RuntimeError("server shutting down"))

    def _dispatch_batch(self, batch) -> None:
        t0 = time.monotonic()
        try:
            handle = self.predictor.predict_dispatch([im for im, _ in batch])
        except Exception as exc:  # resolve every future; report via HTTP 500
            self._fail(batch, exc)
            return
        # Blocking put = backpressure: at most pipeline_depth batches on
        # the device; dispatch pauses rather than queueing unbounded work.
        self.in_flight.put((batch, handle, t0))

    def _dispatch_group(self, groups) -> None:
        t0 = time.monotonic()
        try:
            handle = self.predictor.predict_dispatch_group(
                [[im for im, _ in g] for g in groups])
        except Exception as exc:
            for g in groups:
                self._fail(g, exc)
            return
        self.in_flight.put((groups, handle, t0))

    def _collect_loop(self) -> None:
        while True:
            item = self.in_flight.get()
            if item is None:
                if self._stop_event.is_set():
                    return
                continue
            batch, handle, t0 = item
            if "ns" in handle or "group" in handle:  # scan-group handle
                groups = batch
                try:
                    outs = self.predictor.predict_collect_group(handle)
                except Exception as exc:
                    for g in groups:
                        self._fail(g, exc)
                    continue
                dt = time.monotonic() - t0
                for g, out in zip(groups, outs):
                    self.stats.record_batch(len(g), dt)
                    for j, (_, fut) in enumerate(g):
                        if not fut.done():
                            fut.set_result(
                                {k: v[j] for k, v in out.items()})
                continue
            try:
                out = self.predictor.predict_collect(handle)
            except Exception as exc:
                self._fail(batch, exc)
                continue
            self.stats.record_batch(len(batch), time.monotonic() - t0)
            for j, (_, fut) in enumerate(batch):
                if not fut.done():
                    fut.set_result({k: v[j] for k, v in out.items()})

    @staticmethod
    def _fail(batch, exc: Exception) -> None:
        for _, fut in batch:
            if not fut.done():
                fut.set_exception(exc)


def _detections_json(result: dict, score_threshold: float) -> dict:
    n = int(result["num_boxes"])
    dets = []
    for i in range(n):
        score = float(result["scores"][i])
        if score < score_threshold:
            continue
        det = {
            "box_yxyx": [round(float(v), 4) for v in result["boxes"][i]],
            "score": round(score, 4),
            "label": int(result["labels"][i]),
        }
        if "names" in result:
            det["name"] = str(result["names"][i])
        dets.append(det)
    return {"detections": dets}


class DetectionServer:
    """Owns the HTTP server, the request queue, and the dispatcher."""

    def __init__(self, predictor: Predictor, host: str = "0.0.0.0",
                 port: int = 8000, max_batch: int = 32,
                 max_wait_ms: float = 5.0, default_score_threshold: float = 0.3,
                 max_queue: int = 1024, request_timeout_s: float = 30.0,
                 scan_depth: int = 1):
        self.predictor = predictor
        self.stats = ServerStats()
        self.requests: "queue.Queue" = queue.Queue(maxsize=max_queue)
        if not hasattr(predictor, "predict_dispatch_group"):
            scan_depth = 1  # e.g. TTAPredictor wrapper
        self.dispatcher = _Dispatcher(predictor, self.requests, self.stats,
                                      max_batch, max_wait_ms,
                                      scan_depth=scan_depth)
        self.default_score_threshold = default_score_threshold
        self.request_timeout_s = request_timeout_s
        hw = predictor.cfg.image_hw()
        self._model_info = {
            "backbone": predictor.cfg.model.backbone,
            "image_size": list(hw),
            "num_classes": predictor.cfg.num_classes,
        }

        server = self  # close over for the handler class

        class Handler(BaseHTTPRequestHandler):
            # Silence the default per-request stderr logging.
            def log_message(self, fmt, *args):
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"status": "ok",
                                      "model": server._model_info})
                elif self.path.startswith("/v1/stats"):
                    self._reply(200, server.stats.snapshot())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if not self.path.startswith("/v1/detect"):
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    data = self.rfile.read(length)
                    result = server.handle_image(
                        data, self._score_threshold())
                    server.stats.record_request(True)
                    self._reply(200, result)
                except Exception as exc:
                    server.stats.record_request(False)
                    self._reply(500, {"error": str(exc)})

            def _score_threshold(self) -> float:
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)
                if "score_threshold" in q:
                    return float(q["score_threshold"][0])
                return server.default_score_threshold

        class _HTTPServer(ThreadingHTTPServer):
            daemon_threads = True
            # Default backlog (5) resets connections under a burst of
            # concurrent clients; a batching server invites exactly that.
            request_queue_size = 128

        self.httpd = _HTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def warmup(self) -> None:
        """Pre-compile EVERY batch bucket the dispatcher can form.

        Dynamic batching produces ragged batch sizes; the Predictor pads
        each to its power-of-two bucket, so any bucket <= max_batch can be
        hit on the request path. A cold bucket means an XLA compile (tens
        of seconds; minutes through a remote-compile relay) while requests
        queue behind the dispatcher — so a production daemon must compile
        all of them BEFORE accepting traffic. Measured: skipping this took
        the chip daemon from 478 to 9 req/s (BENCHMARKS.md round 3).
        """
        buckets = sorted({self.predictor._bucket_for(n)
                          for n in range(1, self.dispatcher.max_batch + 1)})
        for b in buckets:
            self.predictor.warmup(b)
        if self.dispatcher.scan_depth > 1:
            # throughput mode: pre-compile the scan-K program for every
            # group size the dispatcher can form at the max bucket (a
            # partially-drained queue yields K' < K groups)
            import jax
            import jax.numpy as jnp
            p = self.predictor
            for k in range(2, self.dispatcher.scan_depth + 1):
                fn, stage = p._fn_for_scan(buckets[-1], k)
                dummy = jnp.zeros((k,) + p._feed_shape(buckets[-1]),
                                  p._feed_dtype())
                jax.block_until_ready(fn(p.variables, stage(dummy)))

    # ----------------------------------------------------------- request path

    def handle_image(self, data: bytes, score_threshold: float) -> dict:
        """Decode -> enqueue -> await the dispatcher's batched result."""
        image = self._decode(data)
        fut: Future = Future()
        self.requests.put((image, fut), timeout=self.request_timeout_s)
        result = fut.result(timeout=self.request_timeout_s)
        return _detections_json(result, score_threshold)

    def _decode(self, data: bytes) -> np.ndarray:
        if not data:
            raise ValueError("empty request body")
        if self.predictor.preserve_aspect:
            # Letterboxing needs the original frame; Predictor resizes.
            return native.decode_jpeg(data)
        th, tw = self.predictor.cfg.image_hw()
        # Fused native decode+resize straight to the model resolution —
        # the handler thread ships exactly (H, W, 3) uint8 to the queue.
        image = native.decode_jpeg(data, th, tw)
        if getattr(self.predictor, "_packed", False):
            # Packed ingest (ops/ingest.py): pack per image HERE, in the
            # handler thread, so the cost overlaps across requests and the
            # single dispatcher thread never pays the whole batch's pack
            # (Predictor's pre-packed fast path picks these up).
            image = native.pack_s2d(image[None], n_threads=1)[0]
        return image

    # ------------------------------------------------------------- lifecycle

    def start(self) -> None:
        self.dispatcher.start()
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="ssd-tpu-http")
        self._serve_thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.dispatcher.stop()
        self._serve_thread.join(timeout=5)
        self.dispatcher.join(timeout=5)

    def serve_forever(self) -> None:
        self.dispatcher.start()
        try:
            self.httpd.serve_forever()
        finally:
            self.dispatcher.stop()


def _main() -> None:
    """python -m ssd_tpu.serve --export runs/r1/export --port 8000
    [--max-batch 32] [--max-wait-ms 5] [--letterbox] [--mesh]
    [--score-threshold 0.3] [--warmup-batches 1,8,32]"""
    import argparse
    import signal

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--export", required=True, help="inference artifact dir")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--scan-depth", type=int, default=1,
                   help="group up to K queued batches into one scan-K "
                        "device call (throughput mode: amortizes "
                        "per-dispatch overhead; single-device only)")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--letterbox", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel serving over all visible devices")
    p.add_argument("--warmup-batches", default="all",
                   help="comma list of batch sizes to pre-compile, or "
                        "'all' (default): every bucket up to --max-batch")
    p.add_argument("--tta", action="store_true",
                   help="serve with flip TTA + weighted box fusion (2x "
                        "device cost per request, tighter boxes)")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    predictor = Predictor.from_checkpoint(args.export)
    predictor.preserve_aspect = args.letterbox
    if args.mesh:
        predictor = Predictor(predictor.cfg, predictor.variables,
                              predictor.label_map, args.letterbox, mesh=True)
    if args.tta:
        from ssd_tpu.tta import TTAPredictor
        predictor = TTAPredictor(predictor)

    server = DetectionServer(
        predictor, host=args.host, port=args.port, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        default_score_threshold=args.score_threshold,
        scan_depth=args.scan_depth)
    if args.warmup_batches.strip() == "all":
        server.warmup()
    else:
        for b in args.warmup_batches.split(","):
            if b.strip():
                predictor.warmup(int(b))
    print(f"serving {server._model_info} on {args.host}:{server.port} "
          f"(max_batch={args.max_batch}, max_wait_ms={args.max_wait_ms})",
          flush=True)

    signal.signal(signal.SIGTERM, lambda *_: server.httpd.shutdown())
    server.serve_forever()


if __name__ == "__main__":
    _main()
