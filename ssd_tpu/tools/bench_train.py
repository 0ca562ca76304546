"""Training-step benchmark: steady-state step time on synthetic data.

Counterpart of the serving benchmark in ``bench.py`` for the train path
(SURVEY.md §6 training row; BASELINE config 4 shape). Builds the full
jitted train step (normalize + forward + matching + losses + backward +
optimizer + BN update) over a 1-D data mesh on the available devices,
feeds a synthetic on-device batch, and reports pipelined steady-state
step time — the same protocol BENCHMARKS.md's training table uses.

The batch is synthesized once and re-used; the state is donated and
chained through the loop, so the measurement has no host round-trip per
step except the final block. ``--profile`` additionally captures an
XProf trace of the timed window for ``trace_tools`` attribution.

Usage:
    python -m ssd_tpu.tools.bench_train --config configs/coco_mobilenet_640.json \
        --batch 32 [--steps 20] [--profile /tmp/tr] [--set model.norm=group ...]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from ssd_tpu.config import Config
from ssd_tpu.models.detector import Detector
from ssd_tpu.parallel import mesh as mesh_lib
from ssd_tpu.parallel import train_step as ts


def synthetic_batch(cfg: Config, batch: int, seed: int = 0) -> dict:
    """Random uint8 images + plausible boxes/labels, padded to max_gt."""
    rng = np.random.RandomState(seed)
    ih, iw = cfg.image_hw()
    m = cfg.data.max_gt_boxes
    images = rng.randint(0, 256, (batch, ih, iw, 3), np.uint8)
    num = rng.randint(1, min(m, 12) + 1, (batch,)).astype(np.int32)
    ymin = rng.uniform(0.0, 0.6, (batch, m))
    xmin = rng.uniform(0.0, 0.6, (batch, m))
    h = rng.uniform(0.05, 0.4, (batch, m))
    w = rng.uniform(0.05, 0.4, (batch, m))
    boxes = np.stack(
        [ymin, xmin, np.minimum(ymin + h, 1.0), np.minimum(xmin + w, 1.0)],
        -1).astype(np.float32)
    labels = rng.randint(0, cfg.num_classes, (batch, m)).astype(np.int32)
    mask = np.arange(m)[None, :] < num[:, None]
    boxes *= mask[..., None]
    labels = np.where(mask, labels, 0)
    return {"images": images, "boxes": boxes, "labels": labels,
            "num_boxes": num}


def apply_overrides(d: dict, overrides: list[str]) -> dict:
    for ov in overrides:
        key, _, val = ov.partition("=")
        node = d
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            node[parts[-1]] = json.loads(val)
        except json.JSONDecodeError:
            node[parts[-1]] = val
    return d


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/coco_mobilenet_640.json")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--profile", default="", metavar="DIR",
                   help="capture an XProf trace of the timed window")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="config override, e.g. model.width_multiplier=0.5")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    with open(args.config) as f:
        cfg_dict = json.load(f)
    cfg = Config.from_dict(apply_overrides(cfg_dict, args.set), strict=False)

    detector = Detector(cfg)
    tx = ts.make_optimizer(cfg)
    state = ts.create_train_state(detector, jax.random.PRNGKey(0), tx)

    mesh = mesh_lib.create_mesh()
    step = ts.jit_train_step(
        ts.make_train_step(detector, tx, cfg.train.ema_decay,
                           cfg.train.grad_accum_steps),
        mesh)

    batch = synthetic_batch(cfg, args.batch)
    batch = jax.device_put(batch, mesh_lib.batch_sharding(mesh))
    state = jax.device_put(state, mesh_lib.replicated(mesh))

    # compile + warmup
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    for _ in range(args.warmup):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)

    if args.profile:
        from ssd_tpu.utils import profiling
        ctx = profiling.trace(args.profile)
    else:
        import contextlib
        ctx = contextlib.nullcontext()

    with ctx:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0

    ms = dt / args.steps * 1e3
    print(json.dumps({
        "config": args.config, "batch": args.batch,
        "image_size": cfg.image_size,
        "step_ms": round(ms, 1),
        "img_per_s": round(args.batch / (ms / 1e3), 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(metrics["loss"]), 4),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
