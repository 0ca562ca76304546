"""Crowded-scene accuracy validation of the fast-path approximations.

VERDICT r2 #2: the serving fast paths — cell-major candidate selection
(``nms.select="cells"``), approximate per-class top-k inside the Pallas NMS
(``approx_class_topk``), and the global candidate cap ``num_candidates`` —
were parity-checked only on 2-3-object scenes. COCO scenes have dozens of
objects across many classes, which is exactly where top-Q selection can
drop recall. This tool measures that, offline, with a synthetic stress
task:

  * images with 30-80 SMALL objects (8-48 px at 256 px) across many
    classes (distinguishable by color), heavy overlap allowed;
  * train a detector to convergence on it;
  * then evaluate the SAME weights under every candidate-selection
    variant against the exact-oracle postprocess (full-anchor exact
    top-k + exact jnp NMS) and report mAP/AR deltas.

Run (defaults reproduce the BENCHMARKS.md table):

    python -m ssd_tpu.tools.crowded_validation --workdir /tmp/crowd \
        [--steps 2500] [--val-images 256] [--skip-train]

The sweep reuses one forward pass per batch: raw head outputs are computed
once and every postprocess variant consumes the same tensors, so measured
deltas isolate the selection/NMS approximations exactly.
"""

from __future__ import annotations

import argparse
import colorsys
import dataclasses
import io
import json
import os

import numpy as np

SIZE = 256
NUM_CLASSES = 40


def _palette(num_classes: int) -> np.ndarray:
    """Visually-distinct class colors: hue wheel x 2 brightness tiers."""
    cols = []
    for i in range(num_classes):
        h = (i % (num_classes // 2 or 1)) / (num_classes // 2 or 1)
        v = 1.0 if i < num_classes // 2 else 0.55
        r, g, b = colorsys.hsv_to_rgb(h, 1.0, v)
        cols.append([int(r * 255), int(g * 255), int(b * 255)])
    return np.asarray(cols, np.uint8)


def crowded_example(rng: np.random.Generator, num_classes: int = NUM_CLASSES,
                    size: int = SIZE, min_boxes: int = 30,
                    max_boxes: int = 80):
    """One dense synthetic scene; returns (jpeg_bytes, boxes, labels)."""
    from PIL import Image

    palette = _palette(num_classes)
    img = rng.integers(0, 40, (size, size, 3)).astype(np.uint8)
    n = int(rng.integers(min_boxes, max_boxes + 1))
    boxes, labels = [], []
    for _ in range(n):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        y = int(rng.integers(0, size - h))
        x = int(rng.integers(0, size - w))
        c = int(rng.integers(0, num_classes))
        img[y:y + h, x:x + w] = palette[c]
        # 1px darker border so adjacent same-class boxes stay separable
        img[y, x:x + w] = palette[c] // 2
        img[y + h - 1, x:x + w] = palette[c] // 2
        img[y:y + h, x] = palette[c] // 2
        img[y:y + h, x + w - 1] = palette[c] // 2
        boxes.append([y / size, x / size, (y + h) / size, (x + w) / size])
        labels.append(c)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    return (buf.getvalue(), np.asarray(boxes, np.float32),
            np.asarray(labels, np.int64))


def write_dataset(path: str, n: int, seed: int,
                  num_classes: int = NUM_CLASSES) -> None:
    from ssd_tpu.data.tfrecord import RecordWriter, encode_detection_example

    rng = np.random.default_rng(seed)
    with RecordWriter(path) as w:
        for _ in range(n):
            jpeg, boxes, labels = crowded_example(rng, num_classes)
            w.write(encode_detection_example(
                jpeg, boxes, labels, image_hw=(SIZE, SIZE)))


def make_config(workdir: str, steps: int, num_classes: int = NUM_CLASSES,
                size: int = SIZE):
    from ssd_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                                NMSConfig, TrainConfig)
    return Config(
        num_classes=num_classes,
        image_size=size,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.5,
                          fpn_channels=64, head_depth=2, bn_momentum=0.97),
        nms=NMSConfig(score_threshold=0.05, max_boxes=100,
                      num_candidates=1024, pre_nms_top_k=128),
        losses=LossConfig(weight_decay=1e-5),
        train=TrainConfig(batch_size=32, num_steps=steps, optimizer="adam",
                          learning_rate=1.5e-3, warmup_steps=100,
                          log_every=100, eval_every=0, checkpoint_every=1000),
        data=DataConfig(
            train_file_pattern=os.path.join(workdir, "train.tfrecords"),
            val_file_pattern=os.path.join(workdir, "val.tfrecords"),
            max_gt_boxes=100, crop_probability=0.0,
            color_jitter_probability=0.0, flip_probability=0.5,
        ),
    )


# ------------------------------------------------------------------ sweep

def variant_postprocessors(det, cfg, on_tpu: bool):
    """(name, jitted raw-outputs -> Detections) for every selection
    variant. All consume the same forward pass."""
    import jax

    from ssd_tpu.ops.postprocess import (postprocess_cells,
                                         postprocess_detections)

    nms = cfg.nms
    variants = []

    def flat_fn(nms_cfg, exact_topk, use_pallas):
        def fn(logits, deltas):
            return postprocess_detections(
                logits, deltas, det.anchors, nms_cfg,
                use_pallas=use_pallas and on_tpu,
                interpret=not on_tpu, exact_topk=exact_topk)
        return jax.jit(fn)

    def cells_fn(nms_cfg, use_pallas):
        def fn(raw):
            return postprocess_cells(
                raw, det.anchors, cfg.num_classes, nms_cfg,
                use_pallas=use_pallas and on_tpu, interpret=not on_tpu)
        return jax.jit(fn)

    a_total = det.anchors.shape[0]
    oracle_cfg = dataclasses.replace(
        nms, num_candidates=a_total, pre_nms_top_k=400,
        approx_class_topk=False)
    variants.append(("oracle(full-anchors,exact)", "flat",
                     flat_fn(oracle_cfg, True, False)))

    for q in (256, 512, 1024, 2048):
        vq = dataclasses.replace(nms, num_candidates=q,
                                 approx_class_topk=False,
                                 cell_overprovision=1.0,
                                 approx_cell_topk=False)
        variants.append((f"anchors-exact q={q}", "flat",
                         flat_fn(vq, True, True)))
        variants.append((f"anchors-approx q={q}", "flat",
                         flat_fn(vq, False, True)))
        variants.append((f"cells q={q}", "cells",
                         cells_fn(vq, True)))
    # two-stage cell selection: overprovisioned cell prefilter + exact
    # anchor refine (NMS input stays at q)
    for q, over in ((1024, 2.0), (1024, 3.0), (2048, 2.0)):
        vr = dataclasses.replace(nms, num_candidates=q,
                                 approx_class_topk=False,
                                 cell_overprovision=over,
                                 approx_cell_topk=False)
        variants.append((f"cells q={q} refine-x{over:g}", "cells",
                         cells_fn(vr, True)))
    # approx class top-k in the Pallas NMS on top of the default path
    variants.append(("cells q=1024 refine-x2 +approx-class-topk", "cells",
                     cells_fn(dataclasses.replace(
                         nms, num_candidates=1024, approx_class_topk=True,
                         cell_overprovision=2.0, approx_cell_topk=False),
                         True)))
    # approx CELL prefilter (PartialReduce vs exact sort; on-TPU only —
    # approx lowers to exact on CPU). Paired against the exact row above.
    variants.append(("cells q=1024 refine-x2 +approx-cell-topk", "cells",
                     cells_fn(dataclasses.replace(
                         nms, num_candidates=1024, approx_class_topk=False,
                         cell_overprovision=2.0, approx_cell_topk=True),
                         True)))
    for topk in (64, 256, 400):
        vt = dataclasses.replace(nms, num_candidates=1024,
                                 pre_nms_top_k=topk,
                                 approx_class_topk=False,
                                 cell_overprovision=1.0,
                                 approx_cell_topk=False)
        variants.append((f"cells q=1024 pre_nms_top_k={topk}", "cells",
                         cells_fn(vt, True)))
    # Soft-NMS method sweep on the default two-stage cell path — crowded
    # scenes are exactly where score decay vs hard suppression should
    # show up (always the jnp path; no Pallas kernel for soft)
    for meth, sigma in (("soft_linear", None), ("soft_gaussian", 0.25),
                        ("soft_gaussian", 0.5)):
        kw = {"method": meth}
        if sigma is not None:
            kw["soft_sigma"] = sigma
        vs = dataclasses.replace(nms, num_candidates=1024,
                                 approx_class_topk=False,
                                 cell_overprovision=2.0, approx_cell_topk=False, **kw)
        label = meth if sigma is None else f"{meth} sigma={sigma:g}"
        variants.append((f"cells q=1024 refine-x2 {label}", "cells",
                         cells_fn(vs, False)))
    return variants


def run_sweep(cfg, variables, val_pattern: str, max_images: int | None,
              batch_size: int = 16, only: str = "") -> list[dict]:
    import jax

    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.eval.coco_map import DetectionEvaluator
    from ssd_tpu.models.detector import Detector, normalize_images

    det = Detector(cfg)
    on_tpu = jax.default_backend() in ("tpu", "axon")

    flat_apply = jax.jit(lambda v, im: det.model.apply(
        v, normalize_images(im), train=False))
    cells_apply = jax.jit(lambda v, im: det.model.apply(
        v, normalize_images(im), train=False, flatten=False))

    variants = variant_postprocessors(det, cfg, on_tpu)
    if only:
        # the oracle row always stays — it anchors the d_mAP column
        variants = [v for i, v in enumerate(variants)
                    if i == 0 or only in v[0]]
    evaluators = {name: DetectionEvaluator(cfg.num_classes)
                  for name, _, _ in variants}

    pipeline = Pipeline(val_pattern, cfg, is_training=False,
                        batch_size=batch_size)
    seen = 0
    for batch in pipeline:
        if max_images is not None and seen >= max_images:
            break
        images = batch["images"]
        logits, deltas = flat_apply(variables, images)
        raw = cells_apply(variables, images)
        for name, kind, fn in variants:
            out = fn(logits, deltas) if kind == "flat" else fn(raw)
            evaluators[name].add_batch(
                {"boxes": np.asarray(out.boxes),
                 "scores": np.asarray(out.scores),
                 "labels": np.asarray(out.labels),
                 "num_boxes": np.asarray(out.num_boxes)},
                batch["boxes"], batch["labels"], batch["num_boxes"],
                valid=batch.get("valid"), orig_hw=batch.get("orig_hw"))
        seen += int(batch["valid"].sum())

    rows = []
    oracle = None
    for name, _, _ in variants:
        r = evaluators[name].result()
        row = {"variant": name, "images": seen, "mAP": r["mAP"],
               "AP50": r["AP50"], "AR@100": r["AR@100"]}
        if oracle is None:
            oracle = r
            row["d_mAP"] = 0.0
        else:
            row["d_mAP"] = r["mAP"] - oracle["mAP"]
        rows.append(row)
    return rows


def print_table(rows: list[dict]) -> None:
    print(f"\ncrowded-scene sweep over {rows[0]['images']} images "
          f"(30-80 objects each, {NUM_CLASSES} classes):\n")
    print("| variant | mAP | AP50 | AR@100 | dmAP vs oracle |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['mAP']:.4f} | {r['AP50']:.4f} "
              f"| {r['AR@100']:.4f} | {r['d_mAP']:+.4f} |")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--train-images", type=int, default=2000)
    p.add_argument("--val-images", type=int, default=256)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse workdir/run/export from a previous run")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="config overrides, e.g. model.stem_schedule=dense4 "
                        "(also used to A/B architectures on this task)")
    p.add_argument("--only", default="",
                   help="substring filter on variant names (oracle kept)")
    p.add_argument("--out-json", default=None)
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    train_path = os.path.join(args.workdir, "train.tfrecords")
    val_path = os.path.join(args.workdir, "val.tfrecords")
    if not os.path.exists(train_path):
        print("writing crowded train set...", flush=True)
        write_dataset(train_path, args.train_images, seed=0)
    if not os.path.exists(val_path):
        write_dataset(val_path, args.val_images, seed=1)

    cfg = make_config(args.workdir, args.steps)
    if args.set:
        from ssd_tpu.config import Config
        from ssd_tpu.tools.bench_train import apply_overrides
        cfg = Config.from_dict(
            apply_overrides(json.loads(cfg.to_json()), args.set))
    rundir = os.path.join(args.workdir, "run")
    if not args.skip_train:
        from ssd_tpu.train import train
        train(cfg, rundir, max_steps=args.steps)

    from ssd_tpu.export import load_inference_artifact
    _, variables = load_inference_artifact(os.path.join(rundir, "export"))

    rows = run_sweep(cfg, variables, val_path, args.val_images,
                     only=args.only)
    print_table(rows)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
