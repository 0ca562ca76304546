"""Standalone evaluation CLI: exported model + val tfrecords -> mAP table.

    python -m ssd_tpu.eval --export runs/r1/export \
        [--val-pattern data/val-*.tfrecords] [--batch-size 16] [--limit N]

The reference wires eval into estimator's train_and_evaluate (SURVEY.md
§3.5); this gives the equivalent as a separate job (per-class AP@0.5 +
COCO-style mAP), against any exported artifact.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export", required=True, help="inference artifact dir")
    p.add_argument("--val-pattern", default=None,
                   help="override config's data.val_file_pattern")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--limit", type=int, default=None,
                   help="max batches (smoke runs)")
    p.add_argument("--dump-coco", default=None, metavar="OUT.json",
                   help="also write pycocotools-compatible results JSON "
                        "(uses image/source_id from the tfrecords and a "
                        "<pattern>-category_ids.json map when present)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="config overrides for this eval only, e.g. "
                        "nms.method=soft_gaussian nms.score_threshold=0.01")
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation: fuse base+flipped "
                        "views per image with weighted box fusion")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax

    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.eval.coco_map import DetectionEvaluator, detections_to_coco
    from ssd_tpu.export import load_inference_artifact
    from ssd_tpu.models.detector import Detector

    cfg, variables = load_inference_artifact(args.export)
    if args.val_pattern:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          val_file_pattern=args.val_pattern)
        )
    if args.set:
        import json as jsonlib

        from ssd_tpu.config import Config
        from ssd_tpu.tools.bench_train import apply_overrides

        cfg = Config.from_dict(
            apply_overrides(jsonlib.loads(cfg.to_json()), args.set))
    detector = Detector(cfg)
    predict = jax.jit(lambda v, im: detector.predict(v, im))

    label_map = None
    try:
        from ssd_tpu.predictor import Predictor
        label_map = Predictor.from_checkpoint(args.export).label_map
    except Exception:
        pass

    evaluator = DetectionEvaluator(cfg.num_classes)
    pipeline = Pipeline(cfg.data.val_file_pattern, cfg, is_training=False,
                        batch_size=args.batch_size)
    images_seen = 0
    coco_results = [] if args.dump_coco else None
    category_ids = None
    if args.dump_coco:
        import glob as globlib
        import json
        import os
        # create_tfrecords writes ``<output-prefix>-category_ids.json``;
        # derive that exact path from the val pattern's prefix rather than
        # globbing the directory (which could pick up the train map or a
        # stale file and silently remap labels to wrong COCO category ids).
        pattern = cfg.data.val_file_pattern
        prefix = pattern.split("*")[0].split("?")[0].rstrip("-")
        exact = f"{prefix}-category_ids.json"
        if os.path.exists(exact):
            hits = [exact]
        else:
            pat_dir = os.path.dirname(pattern) or "."
            hits = sorted(
                globlib.glob(os.path.join(pat_dir, "*category_ids.json")))
            if len(hits) > 1:
                print(f"warning: no {exact}; multiple category-id maps "
                      f"found, using {hits[0]} (candidates: {hits})")
        if hits:
            with open(hits[0]) as f:
                category_ids = {int(k): int(v)
                                for k, v in json.load(f).items()}
    for i, batch in enumerate(pipeline):
        if args.limit is not None and i >= args.limit:
            break
        out = predict(variables, batch["images"])
        out = {"boxes": np.asarray(out.boxes),
               "scores": np.asarray(out.scores),
               "labels": np.asarray(out.labels),
               "num_boxes": np.asarray(out.num_boxes)}
        if args.tta:
            # same compiled program: the flipped batch has the same shape
            from ssd_tpu.tta import fuse_flip_batch
            out_f = predict(variables,
                            np.ascontiguousarray(batch["images"][:, :, ::-1]))
            out = fuse_flip_batch(
                out,
                {"boxes": np.asarray(out_f.boxes),
                 "scores": np.asarray(out_f.scores),
                 "labels": np.asarray(out_f.labels),
                 "num_boxes": np.asarray(out_f.num_boxes)},
                cfg.nms.iou_threshold, cfg.nms.max_boxes)
        evaluator.add_batch(
            out,
            batch["boxes"], batch["labels"], batch["num_boxes"],
            valid=batch.get("valid"),
            gt_is_crowd=batch.get("is_crowd"),
            orig_hw=batch.get("orig_hw"),
        )
        valid = batch.get("valid")
        images_seen += int(valid.sum()) if valid is not None \
            else len(batch["images"])
        if coco_results is not None:
            coco_results.extend(detections_to_coco(
                out, batch["source_ids"], batch["orig_hw"], valid=valid,
                category_ids=category_ids))

    if coco_results is not None:
        import json
        with open(args.dump_coco, "w") as f:
            json.dump(coco_results, f)
        print(f"wrote {len(coco_results)} COCO-format detections "
              f"to {args.dump_coco}")

    result = evaluator.result()
    print(f"\nevaluated {images_seen} images")
    rows = [
        ("AP @[.50:.95] | area=   all | maxDets=100", "mAP"),
        ("AP @0.50      | area=   all | maxDets=100", "AP50"),
        ("AP @0.75      | area=   all | maxDets=100", "AP75"),
        ("AP @[.50:.95] | area= small | maxDets=100", "AP_small"),
        ("AP @[.50:.95] | area=medium | maxDets=100", "AP_medium"),
        ("AP @[.50:.95] | area= large | maxDets=100", "AP_large"),
        ("AR @[.50:.95] | area=   all | maxDets=  1", "AR@1"),
        ("AR @[.50:.95] | area=   all | maxDets= 10", "AR@10"),
        ("AR @[.50:.95] | area=   all | maxDets=100", "AR@100"),
        ("AR @[.50:.95] | area= small | maxDets=100", "AR_small"),
        ("AR @[.50:.95] | area=medium | maxDets=100", "AR_medium"),
        ("AR @[.50:.95] | area= large | maxDets=100", "AR_large"),
    ]
    for label, key in rows:
        print(f"  {label} = {result[key]:.4f}")
    print()
    per_class = result["per_class_AP50"]
    for c, ap in enumerate(per_class):
        if np.isnan(ap):
            continue
        name = (label_map or {}).get(c, str(c))
        print(f"  AP50[{name}] = {ap:.4f}")


if __name__ == "__main__":
    main()
