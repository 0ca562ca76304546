"""Headline benchmark: batch-inference images/sec/chip at 640x640.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.json ``published: {}``); the
north-star target is >=10x the TF reference's images/sec on one chip. Until
the reference is measurable, ``vs_baseline`` is computed against a measured
stand-in: a faithful same-architecture forward pass on this host's CPU via
TF (see bench_reference.py), cached in ``reference_baseline.json``. If no
cached reference number exists, vs_baseline is reported against the
conservative documented estimate in that file's absence (25 img/s, a
generous CPU figure for MobileNet-SSD at 640x640).
"""

from __future__ import annotations

import json
import os
import time

BATCH = 32
WARMUP = 3
ITERS = 30
REF_FILE = os.path.join(os.path.dirname(__file__), "reference_baseline.json")
FALLBACK_REFERENCE_IMG_PER_S = 25.0


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ssd_tpu.config import Config
    from ssd_tpu.models.detector import Detector

    # The flagship configuration: MobileNet-v1-FPN 640 with the TPU-native
    # dense4 stem schedule — measured faster AND more accurate than the
    # reference stem (BENCHMARKS.md round 3: +21% serve, +55% train,
    # +0.038 mAP on the crowded-scene A/B).
    cfg = Config(num_classes=80, image_size=640)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_schedule="dense4"))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))

    @jax.jit
    def predict(variables, images):
        out = det.predict(variables, images)
        return out.boxes, out.scores, out.labels, out.num_boxes

    images = jnp.zeros((BATCH, cfg.image_size, cfg.image_size, 3), jnp.uint8)

    for _ in range(WARMUP):
        jax.block_until_ready(predict(variables, images))

    # Pipelined timing: queue all steps, block once — measures sustained
    # device throughput rather than host<->device round-trip latency.
    t0 = time.perf_counter()
    result = None
    for _ in range(ITERS):
        result = predict(variables, images)
    jax.block_until_ready(result)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt

    ref = FALLBACK_REFERENCE_IMG_PER_S
    if os.path.exists(REF_FILE):
        with open(REF_FILE) as f:
            ref = float(json.load(f)["images_per_sec"])

    print(json.dumps({
        "metric": "images_per_sec_per_chip_640x640_b32_mobilenet_fpn",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / ref, 2),
    }))


if __name__ == "__main__":
    main()
