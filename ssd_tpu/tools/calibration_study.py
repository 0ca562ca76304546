"""int8 calibration robustness study (VERDICT r4 #8).

The round-4 int8 headline rested on ONE calibration experiment (64 train
images, absmax). This tool sweeps the calibration regime on the crowded
dense-scene task (the same task the flagship recipe was composed on —
tools/crowded_validation.py) and reports int8 mAP per regime against the
bf16 baseline of the SAME weights:

  * calibration set size: 8 / 64 / 256 images;
  * calibration distribution: train scenes vs held-out val scenes;
  * clipping: absmax vs 99.9th-percentile of |x| per batch
    (``quant --percentile``).

    python -m ssd_tpu.tools.calibration_study --workdir /tmp/calib \
        [--steps 2500] [--skip-train] [--out-json rows.json]

The model is the dense4 (flagship) stem variant; every int8 evaluation
runs the REAL serving path (``Detector.predict`` on raw uint8, exact-
integer stem + calibrated neck/head scales).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def _batches_from(pattern: str, cfg, n_images: int, batch: int = 8):
    """First ``n_images`` raw uint8 image batches of a tfrecord pattern."""
    from ssd_tpu.data.pipeline import Pipeline

    out, seen = [], 0
    for b in Pipeline(pattern, cfg, is_training=False, batch_size=batch):
        imgs = np.asarray(b["images"])
        valid = np.asarray(b["valid"]).astype(bool)
        imgs = imgs[valid]
        take = min(n_images - seen, imgs.shape[0])
        if take > 0:
            out.append(imgs[:take])
            seen += take
        if seen >= n_images:
            break
    if seen < n_images:
        raise ValueError(f"only {seen} images in {pattern}, need {n_images}")
    return out


def eval_map(cfg, variables, val_pattern: str, max_images: int) -> float:
    """mAP of ``Detector(cfg).predict`` (real serving path) on a val set."""
    import jax

    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.eval.coco_map import DetectionEvaluator
    from ssd_tpu.models.detector import Detector

    det = Detector(cfg)
    predict = jax.jit(det.predict)
    ev = DetectionEvaluator(cfg.num_classes)
    seen = 0
    for batch in Pipeline(val_pattern, cfg, is_training=False,
                          batch_size=16):
        if seen >= max_images:
            break
        out = jax.device_get(predict(variables, batch["images"]))
        ev.add_batch(
            {"boxes": np.asarray(out.boxes),
             "scores": np.asarray(out.scores),
             "labels": np.asarray(out.labels),
             "num_boxes": np.asarray(out.num_boxes)},
            batch["boxes"], batch["labels"], batch["num_boxes"],
            valid=batch.get("valid"), orig_hw=batch.get("orig_hw"))
        seen += int(batch["valid"].sum())
    return float(ev.result()["mAP"])


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--train-images", type=int, default=2000)
    p.add_argument("--val-images", type=int, default=256)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--sizes", type=int, nargs="*", default=[8, 64, 256])
    p.add_argument("--percentile", type=float, default=99.9)
    p.add_argument("--out-json", default=None)
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from ssd_tpu.export import load_inference_artifact
    from ssd_tpu.quant import calibrate
    from ssd_tpu.models.detector import Detector
    from ssd_tpu.tools.crowded_validation import make_config, write_dataset

    os.makedirs(args.workdir, exist_ok=True)
    train_path = os.path.join(args.workdir, "train.tfrecords")
    val_path = os.path.join(args.workdir, "val.tfrecords")
    if not os.path.exists(train_path):
        print("writing crowded train set...", flush=True)
        write_dataset(train_path, args.train_images, seed=0)
    if not os.path.exists(val_path):
        write_dataset(val_path, args.val_images, seed=1)

    cfg = make_config(args.workdir, args.steps)
    # the flagship stem (the serving config the int8 headline quantizes)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, stem_schedule="dense4"))

    rundir = os.path.join(args.workdir, "run")
    if not args.skip_train:
        from ssd_tpu.train import train
        train(cfg, rundir, max_steps=args.steps)
    _, variables = load_inference_artifact(os.path.join(rundir, "export"))

    bf16_map = eval_map(cfg, variables, val_path, args.val_images)
    print(f"bf16 baseline mAP = {bf16_map:.4f}", flush=True)

    cfg8 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, compute_dtype="int8", int8_neck=True))
    det8 = Detector(cfg8)

    rows = [{"regime": "bf16 baseline", "mAP": bf16_map, "d_mAP": 0.0}]
    for dist, pattern in (("train", train_path), ("val", val_path)):
        for n in args.sizes:
            batches = _batches_from(pattern, cfg, n)
            for clip in (None, args.percentile):
                qv, seen = calibrate(det8, dict(variables), batches,
                                     percentile=clip)
                m = eval_map(cfg8, qv, val_path, args.val_images)
                name = (f"int8 cal={dist} n={seen} "
                        f"clip={'absmax' if clip is None else f'p{clip:g}'}")
                rows.append({"regime": name, "mAP": m,
                             "d_mAP": m - bf16_map})
                print(f"{name}: mAP={m:.4f} ({m - bf16_map:+.4f})",
                      flush=True)

    print("\n| regime | mAP | d_mAP vs bf16 |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['regime']} | {r['mAP']:.4f} | {r['d_mAP']:+.4f} |")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
