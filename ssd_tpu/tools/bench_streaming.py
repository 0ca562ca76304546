"""Measure the 1024x1024 streaming path (BASELINE config 5).

    python -m ssd_tpu.tools.bench_streaming [--frames 300] [--depth 2]

Feeds synthetic uint8 frames through StreamingDetector on the default
backend and reports sustained fps + p50/p95 per-frame latency from the
detector's own accounting. Latency through a tunneled device includes
the RPC round trip; the in-flight window plus dispatch-time async host
copies (streaming.StreamingDetector.push) are what keep THROUGHPUT at
device rate anyway — that separation is the thing this tool measures.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/streaming_1024.json")
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--int8", action="store_true",
                   help="quantize the neck (calibrates on noise; scale "
                        "values do not affect speed)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="config overrides, e.g. model.stem_schedule=dense4")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import numpy as np

    import jax

    from ssd_tpu.config import Config
    from ssd_tpu.models.detector import Detector
    from ssd_tpu.streaming import StreamingDetector

    cfg = Config.load(args.config)
    if args.set:
        from ssd_tpu.tools.bench_train import apply_overrides
        cfg = Config.from_dict(
            apply_overrides(json.loads(cfg.to_json()), args.set))
    if args.int8:
        import dataclasses

        from ssd_tpu.quant import calibrate
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, compute_dtype="int8", int8_neck=True))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    ih, iw = cfg.image_hw()
    rng = np.random.default_rng(0)
    if args.int8:
        from ssd_tpu.quant import calibrate
        noise = rng.integers(0, 255, (2, ih, iw, 3)).astype(np.uint8)
        variables, _ = calibrate(det, variables, [noise])

    s = StreamingDetector(cfg, variables, depth=args.depth)
    s.warmup()

    # a small pool of random frames (fresh host arrays each push, like a
    # real decoder handing over frames)
    pool = [rng.integers(0, 255, (ih, iw, 3)).astype(np.uint8)
            for _ in range(8)]
    fetched = 0
    for i in range(args.frames):
        for _ in s.push(pool[i % len(pool)]):
            fetched += 1
    for _ in s.flush():
        fetched += 1
    assert fetched == args.frames, (fetched, args.frames)

    st = s.stats()
    out = {
        "resolution": f"{ih}x{iw}",
        "depth": args.depth,
        "frames": args.frames,
        "fps": round(st.get("fps", 0.0), 2),
        "p50_latency_ms": round(st["p50_latency_s"] * 1e3, 1),
        "p95_latency_ms": round(st["p95_latency_s"] * 1e3, 1),
        "compute_dtype": cfg.model.compute_dtype,
    }

    # DEVICE time per frame (XProf trace of 10 more pushes): wall fps
    # through a tunneled chip is dominated by the per-dispatch RPC, which
    # oscillates ~1-18 ms with tunnel load (round 5) — the device rate is
    # what a local deployment sustains.
    try:
        import shutil
        import tempfile
        d = tempfile.mkdtemp(prefix="stream_trace_")
        with jax.profiler.trace(d):
            for i in range(10):
                for _ in s.push(pool[i % len(pool)]):
                    pass
            for _ in s.flush():
                pass
        from ssd_tpu.utils.trace_tools import find_xplane, load_device_ops
        ops = load_device_ops(find_xplane(d))
        dev_ms = sum(ps for _, _, ps in ops) / 1e12 * 1e3 / 10
        out["p50_device_ms"] = round(dev_ms, 2)
        out["device_fps"] = round(1e3 / dev_ms, 2)
        shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
