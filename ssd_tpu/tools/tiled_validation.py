"""Tiled-inference accuracy validation: native-scale tiles vs resize.

Measures what ``ssd_tpu.tiling.TiledPredictor`` buys on the workload it is
built for — images far above the model resolution whose objects are SMALL
in pixels. The setup reuses the crowded-scene stress task
(``tools/crowded_validation``): a detector trained at 256 px on dense
scenes of 8-48 px objects, then evaluated on val scenes rendered at
``--hires-size`` (default 1024) with the SAME object pixel sizes — so the
resize path sees objects shrunk 4x (2-12 px) while the tiler sees them at
native training scale.

Variants evaluated with the full 12-metric COCO evaluator on identical
images and weights:

  * ``resize``          — plain ``Predictor`` (the reference's behavior)
  * ``tiled``           — shipped defaults (IoS merge, edge penalty 0.5,
                          full-image pass, overlap 0.25)
  * ablations (``--ablate``): no edge penalty, IoU merge, no full pass

Run (chip or CPU; training dominates):

    python -m ssd_tpu.tools.tiled_validation --workdir /tmp/tiled \
        [--steps 2500] [--val-images 64] [--hires-size 1024] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ssd_tpu.tools.crowded_validation import (NUM_CLASSES, crowded_example,
                                              make_config, write_dataset)


def hires_scenes(n: int, seed: int, size: int):
    """Val scenes at ``size`` px with the training task's OBJECT PIXEL
    sizes (crowded_example draws 8-48 px boxes independent of size)."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield crowded_example(rng, NUM_CLASSES, size=size)


def evaluate_variants(variables, cfg, args) -> list[dict]:
    import jax  # noqa: F401  (device selection)

    from ssd_tpu.data import native
    from ssd_tpu.eval.coco_map import DetectionEvaluator
    from ssd_tpu.predictor import Predictor
    from ssd_tpu.tiling import TiledPredictor

    predictor = Predictor(cfg, variables)
    variants: dict[str, object] = {
        "resize (reference behavior)": predictor,
        "tiled (shipped defaults)": TiledPredictor(predictor),
    }
    if args.ablate:
        variants["tiled, no edge penalty"] = TiledPredictor(
            predictor, edge_penalty=1.0)
        variants["tiled, iou merge"] = TiledPredictor(
            predictor, merge_metric="iou")
        variants["tiled, no full-image pass"] = TiledPredictor(
            predictor, full_image_pass=False)

    evaluators = {name: DetectionEvaluator(cfg.num_classes)
                  for name in variants}
    timings = {name: 0.0 for name in variants}
    s = args.hires_size
    # one throwaway scene so per-variant compiles don't pollute timings
    warm_jpeg, _, _ = next(iter(hires_scenes(1, seed=99, size=s)))
    warm = native.decode_jpeg(warm_jpeg)
    for var in variants.values():
        var.predict(warm)
    for jpeg, gt_boxes, gt_labels in hires_scenes(
            args.val_images, seed=7, size=s):
        image = native.decode_jpeg(jpeg)
        for name, var in variants.items():
            t0 = time.monotonic()
            out = var.predict(image)
            timings[name] += time.monotonic() - t0
            n = int(np.asarray(out["num_boxes"]).reshape(())[()])
            evaluators[name].add_image(
                np.asarray(out["boxes"])[:n], np.asarray(out["scores"])[:n],
                np.asarray(out["labels"])[:n], gt_boxes, gt_labels,
                image_hw=(s, s))

    rows = []
    for name in variants:
        r = evaluators[name].result()
        rows.append({
            "variant": name, "images": args.val_images,
            "mAP": round(r["mAP"], 4), "AP50": round(r["AP50"], 4),
            "AP_small": round(r["AP_small"], 4),
            "AR@100": round(r["AR@100"], 4),
            "ms_per_image": round(timings[name] / args.val_images * 1e3, 1),
        })
    return rows


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--train-images", type=int, default=2000)
    p.add_argument("--val-images", type=int, default=64)
    p.add_argument("--hires-size", type=int, default=1024)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse workdir/run/export from a previous run")
    p.add_argument("--ablate", action="store_true",
                   help="also run edge-penalty/merge-metric/full-pass "
                        "ablations")
    p.add_argument("--out-json", default=None)
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    train_path = os.path.join(args.workdir, "train.tfrecords")
    val_path = os.path.join(args.workdir, "val.tfrecords")
    if not os.path.exists(train_path):
        print("writing crowded train set...", flush=True)
        write_dataset(train_path, args.train_images, seed=0)
    if not os.path.exists(val_path):
        write_dataset(val_path, 64, seed=1)

    cfg = make_config(args.workdir, args.steps)
    rundir = os.path.join(args.workdir, "run")
    if not args.skip_train:
        from ssd_tpu.train import train
        train(cfg, rundir, max_steps=args.steps)

    from ssd_tpu.export import load_inference_artifact
    _, variables = load_inference_artifact(os.path.join(rundir, "export"))

    rows = evaluate_variants(variables, cfg, args)
    w = max(len(r["variant"]) for r in rows)
    print(f"\n{'variant':<{w}}  {'mAP':>7} {'AP50':>7} {'AP_s':>7} "
          f"{'AR@100':>7} {'ms/img':>7}")
    for r in rows:
        print(f"{r['variant']:<{w}}  {r['mAP']:>7.4f} {r['AP50']:>7.4f} "
              f"{r['AP_small']:>7.4f} {r['AR@100']:>7.4f} "
              f"{r['ms_per_image']:>7.1f}")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
