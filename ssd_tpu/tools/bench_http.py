"""End-to-end HTTP serving benchmark: the daemon path, measured.

Spins up the real ``ssd_tpu.serve`` stack (HTTP handlers -> native JPEG
decode -> dynamic batcher -> batched Predictor) in-process, fires
``--clients`` concurrent closed-loop clients for ``--requests`` requests
each over loopback HTTP, and reports request throughput, latency
percentiles, and the batch sizes the dispatcher actually formed — the
number that matters for the daemon is how close cross-request batching
gets to the raw pipelined ``bench_serve`` ceiling.

Usage:
    python -m ssd_tpu.tools.bench_http --config configs/coco_mobilenet_640_dense4.json \
        [--export DIR] [--clients 64] [--requests 20] [--max-batch 32] \
        [--max-wait-ms 5] [--image-size 640]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.request

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--export", default=None, help="inference artifact dir")
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--requests", type=int, default=20,
                   help="requests per client")
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--image-size", type=int, default=0,
                   help="client image side (0 -> model resolution)")
    p.add_argument("--scan-depth", type=int, default=1,
                   help="daemon throughput mode: group up to K queued "
                        "batches into one scan-K device call")
    args = p.parse_args()

    import jax

    from ssd_tpu.predictor import Predictor
    from ssd_tpu.serve import DetectionServer

    if args.export:
        predictor = Predictor.from_checkpoint(args.export)
    else:
        from ssd_tpu.config import Config
        from ssd_tpu.models.detector import Detector
        cfg = Config.load(args.config)
        det = Detector(cfg)
        predictor = Predictor(cfg, det.init(jax.random.PRNGKey(0)))

    server = DetectionServer(predictor, host="127.0.0.1", port=0,
                             max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms,
                             default_score_threshold=0.3,
                             scan_depth=args.scan_depth)
    server.warmup()  # every reachable bucket — no compiles on the hot path
    server.start()

    side = args.image_size or predictor.cfg.image_hw()[0]
    rng = np.random.default_rng(0)
    from PIL import Image
    bodies = []
    for _ in range(8):  # a few distinct JPEGs so decode isn't hot-cached
        arr = rng.integers(0, 255, (side, side, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        bodies.append(buf.getvalue())

    url = f"http://127.0.0.1:{server.port}/v1/detect"
    latencies: list[float] = []
    lat_lock = threading.Lock()
    barrier = threading.Barrier(args.clients + 1)

    def client(ci: int) -> None:
        barrier.wait()
        for ri in range(args.requests):
            body = bodies[(ci + ri) % len(bodies)]
            t0 = time.monotonic()
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                resp.read()
            dt = time.monotonic() - t0
            with lat_lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    server.stop()

    total = args.clients * args.requests
    lat = sorted(latencies)
    pct = lambda q: round(lat[int(q * (len(lat) - 1))] * 1e3, 1)
    stats = server.stats.snapshot()
    print(json.dumps({
        "requests": total,
        "wall_s": round(wall, 2),
        "req_per_s": round(total / wall, 1),
        "latency_ms": {"p50": pct(0.5), "p90": pct(0.9), "p99": pct(0.99)},
        "mean_batch_size": stats["mean_batch_size"],
        "batches": stats["batches"],
        "errors": stats["errors"],
    }))


if __name__ == "__main__":
    main()
