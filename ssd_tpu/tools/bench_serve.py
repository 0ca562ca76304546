"""Serving benchmark for any config: pipelined images/sec on this device.

Per-config counterpart of the repo-root ``bench.py`` headline (which is
fixed to the MobileNet-640 b32 shape): builds the full predict path
(normalize + forward + decode + candidate selection + Pallas NMS) from a
config file with random weights, queues ``--iters`` batches, blocks
once, and reports sustained images/sec — the protocol behind the
BENCHMARKS.md per-config table.

Usage:
    python -m ssd_tpu.tools.bench_serve --config configs/coco_shufflenet_512.json \
        [--batch 32] [--iters 30] [--set nms.select=anchors ...]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.models.detector import Detector
from ssd_tpu.tools.bench_train import apply_overrides


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/coco_mobilenet_640.json")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    p.add_argument("--profile", default="", metavar="DIR",
                   help="capture an XProf trace of the timed window")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    with open(args.config) as f:
        cfg_dict = json.load(f)
    cfg = Config.from_dict(apply_overrides(cfg_dict, args.set), strict=False)

    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    if cfg.model.compute_dtype == "int8" and cfg.model.int8_neck:
        # throughput is scale-independent; one noise batch builds the
        # calibrated "quant" tree the int8 predict path requires
        import numpy as np

        from ssd_tpu.quant import calibrate
        noise = np.random.default_rng(0).integers(
            0, 255, (2,) + cfg.image_hw() + (3,)).astype(np.uint8)
        variables, _ = calibrate(det, variables, [noise])

    @jax.jit
    def predict(variables, images):
        out = det.predict(variables, images)
        return out.boxes, out.scores, out.labels, out.num_boxes

    images = jnp.zeros((args.batch,) + cfg.image_hw() + (3,), jnp.uint8)

    t0 = time.perf_counter()
    jax.block_until_ready(predict(variables, images))
    compile_s = time.perf_counter() - t0
    for _ in range(args.warmup):
        jax.block_until_ready(predict(variables, images))

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    result = None
    for _ in range(args.iters):
        result = predict(variables, images)
    jax.block_until_ready(result)
    dt = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()

    ms = dt / args.iters * 1e3
    print(json.dumps({
        "config": args.config, "batch": args.batch,
        "image_size": cfg.image_size,
        "batch_ms": round(ms, 1),
        "img_per_s": round(args.batch * args.iters / dt, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
