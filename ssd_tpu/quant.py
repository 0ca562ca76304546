"""Post-training int8 quantization: calibration + artifact conversion.

TPU-native PTQ for the serve path (SURVEY.md §6 perf row; the reference
has no quantized deployment story — this is a capability on top). The
v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS), and the detection head is FLOPs-dominated (the P3 class predict
conv alone is ~21% of serve device time), so full-path int8 is the
single biggest serving-throughput lever after the round-4 lowering work.

Scheme (see models/layers.QuantConv):
  * weights: symmetric per-output-channel absmax int8, quantized from
    the UNCHANGED f32 parameter tree at trace time — an int8 artifact
    carries the same params as the bf16 one, plus a "quant" collection;
  * activations: symmetric per-tensor scales. Backbone convs are
    ReLU6-bounded so a static bound is exact; FPN/head inputs are
    unbounded sums, so their scales come from THIS calibration pass
    (max|x| over representative batches, shape-keyed so the shared head
    subnets get one scale per pyramid level);
  * depthwise convs, norms, activations, postprocess: bf16/f32 — they
    are VPU/bandwidth-bound, int8 buys nothing there.

Calibration is a handful of forward passes with ``mutable=["quant"]``:

    python -m ssd_tpu.quant --export runs/x/export \
        --output runs/x/export_int8 --data "data/val-*.tfrecords"

The converted artifact serves anywhere the bf16 one does (Predictor,
serve daemon, eval CLI); accuracy deltas are measured in BENCHMARKS.md
(round 4).
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def abstract_quant_tree(det):
    """ShapeDtypeStructs of the "quant" scale tree for ``det``'s config.

    The tree structure is a pure function of (config, image size): one
    f32 scalar per quantized conv per distinct input spatial shape. Used
    by export.load_inference_artifact to build the orbax restore target.
    """
    ih, iw = det.cfg.image_hw()

    def f():
        v = det.init(jax.random.PRNGKey(0))
        imgs = jnp.zeros((1, ih, iw, 3), jnp.uint8)
        _, mut = det.model.apply(v, imgs, train=False, raw_input=True,
                                 mutable=["quant"])
        return mut["quant"]

    return jax.eval_shape(f)


def calibrate(det, variables: dict, batches,
              percentile: float | None = None) -> dict:
    """Observe activation ranges over ``batches``.

    Returns ``(variables-with-"quant"-scales, images_seen)``.

    ``batches``: iterable of uint8 ``(N, H, W, 3)`` arrays at the model's
    image size (a data.pipeline.Pipeline in eval mode yields these).
    Scales accumulate with ``max`` across batches, so calibrating in
    several calls (or refreshing an already-calibrated artifact with new
    data) only ever widens ranges.

    ``percentile``: None (default) clips at the observed absmax; a float
    (e.g. 99.9) clips each batch at that percentile of |x| instead —
    trades saturation of the extreme tail for a finer grid on the bulk
    (see the calibration-robustness table in BENCHMARKS.md round 5).
    """
    from ssd_tpu.models.layers import set_calibration_percentile

    @jax.jit
    def first(v, images):
        _, mut = det.model.apply(v, images, train=False, raw_input=True,
                                 mutable=["quant"])
        return mut["quant"]

    @jax.jit
    def update(v, quant, images):
        _, mut = det.model.apply(dict(v, quant=quant), images, train=False,
                                 raw_input=True, mutable=["quant"])
        return mut["quant"]

    base = {k: v for k, v in variables.items() if k != "quant"}
    quant = variables.get("quant")
    seen = 0
    set_calibration_percentile(percentile)
    try:
        for images in batches:
            images = jnp.asarray(images)
            quant = (first(base, images) if quant is None
                     else update(base, quant, images))
            seen += images.shape[0]
    finally:
        set_calibration_percentile(None)
    if quant is None:
        raise ValueError("calibrate() got no batches")
    if not jax.tree_util.tree_leaves(quant):
        raise ValueError(
            "the model created no quantized convs — is "
            "model.compute_dtype set to 'int8'?")
    return dict(base, quant=jax.device_get(quant)), seen


def quantize_artifact(export_dir: str, output_dir: str, batches,
                      int8_neck: bool = True,
                      percentile: float | None = None) -> dict:
    """bf16/f32 inference artifact -> calibrated int8 artifact."""
    import os
    import shutil

    from ssd_tpu.export import (load_inference_artifact,
                                save_inference_artifact)
    from ssd_tpu.models.detector import Detector

    cfg, variables = load_inference_artifact(export_dir)
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, compute_dtype="int8", int8_neck=int8_neck))
    if int8_neck:
        det = Detector(qcfg)
        qvars, seen = calibrate(det, variables, batches,
                                percentile=percentile)
    else:
        # backbone-only is a pure config flip: static ReLU6 scales need
        # no stored state, so the artifact carries no "quant" collection.
        qvars, seen = variables, 0
    save_inference_artifact(output_dir, qcfg, qvars)
    lm = os.path.join(export_dir, "label_map.json")
    if os.path.exists(lm):
        shutil.copy(lm, os.path.join(output_dir, "label_map.json"))
    print(f"calibrated on {seen} images -> {output_dir}")
    return qvars


def _batches_from_tfrecords(pattern: str, cfg, batch_size: int,
                            max_batches: int):
    from ssd_tpu.data.pipeline import Pipeline

    pipeline = Pipeline(pattern, cfg, is_training=False,
                        batch_size=batch_size)
    n = 0
    for batch in pipeline:
        if n >= max_batches:
            break
        yield batch["images"]
        n += 1


def _batches_from_images(paths: list[str], cfg, batch_size: int):
    from PIL import Image

    ih, iw = cfg.image_hw()
    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB").resize((iw, ih))
        imgs.append(np.asarray(im, np.uint8))
    for i in range(0, len(imgs), batch_size):
        chunk = imgs[i:i + batch_size]
        while len(chunk) < batch_size:  # static shapes: pad by repetition
            chunk.append(chunk[-1])
        yield np.stack(chunk)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export", required=True,
                   help="source inference artifact (bf16/f32)")
    p.add_argument("--output", required=True,
                   help="destination for the int8 artifact")
    p.add_argument("--data", default="",
                   help="tfrecord glob of calibration images")
    p.add_argument("--images", nargs="*", default=[],
                   help="alternative: image files for calibration")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--batches", type=int, default=8,
                   help="calibration batches to draw from --data")
    p.add_argument("--backbone-only", action="store_true",
                   help="quantize only the backbone (calibration-free "
                        "static ReLU6 scales; FPN/head stay bf16)")
    p.add_argument("--percentile", type=float, default=None,
                   help="clip calibration at this percentile of |x| per "
                        "batch instead of absmax (e.g. 99.9)")
    args = p.parse_args()
    if not args.data and not args.images and not args.backbone_only:
        p.error("calibration needs --data or --images "
                "(or pass --backbone-only)")

    from ssd_tpu.config import Config
    from ssd_tpu.export import load_inference_artifact

    cfg, _ = load_inference_artifact(args.export)
    if args.data:
        batches = _batches_from_tfrecords(args.data, cfg, args.batch_size,
                                          args.batches)
    elif args.images:
        batches = _batches_from_images(args.images, cfg, args.batch_size)
    else:
        batches = []  # backbone-only: no calibration needed
    quantize_artifact(args.export, args.output, batches,
                      int8_neck=not args.backbone_only,
                      percentile=args.percentile)


if __name__ == "__main__":
    main()
