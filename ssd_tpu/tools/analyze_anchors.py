"""Anchor-coverage analysis: does the anchor grid cover your dataset?

    python -m ssd_tpu.tools.analyze_anchors --config configs/... \
        --data "data/train-*.tfrecords" [--limit 2000]

For each ground-truth box, reports the best-anchor IoU and whether it would
be matched (>= matching_threshold) or only rescued by force-match. Low
coverage means the anchor spec (scales/aspect ratios/levels) should change
before training — the standard pre-flight check the reference leaves to
intuition.
"""

from __future__ import annotations

import argparse
import glob as globlib

import numpy as np


def analyze(config_path: str, data_pattern: str, limit: int | None) -> dict:
    from ssd_tpu.config import Config
    from ssd_tpu.data.augment import boxes_iou_numpy
    from ssd_tpu.data.tfrecord import decode_detection_example, read_records
    from ssd_tpu.ops.anchors import generate_anchors

    cfg = Config.load(config_path)
    anchors = generate_anchors(cfg.image_size, cfg.anchors)

    best_ious, areas = [], []
    n_images = 0
    for path in sorted(globlib.glob(data_pattern)):
        for payload in read_records(path):
            if limit is not None and n_images >= limit:
                break
            _, boxes, labels = decode_detection_example(payload)
            n_images += 1
            if not len(boxes):
                continue
            ious = boxes_iou_numpy(boxes, anchors)  # (M, A)
            best_ious.extend(ious.max(axis=1).tolist())
            areas.extend(
                ((boxes[:, 2] - boxes[:, 0])
                 * (boxes[:, 3] - boxes[:, 1])).tolist()
            )
        if limit is not None and n_images >= limit:
            break

    best = np.asarray(best_ious)
    thr = cfg.matcher.matching_threshold
    return {
        "images": n_images,
        "boxes": len(best),
        "mean_best_iou": float(best.mean()) if len(best) else float("nan"),
        "matched_frac": float((best >= thr).mean()) if len(best) else 0.0,
        "force_match_only_frac": float(
            ((best < thr) & (best >= 0.1)).mean()
        ) if len(best) else 0.0,
        "uncovered_frac": float((best < 0.1).mean()) if len(best) else 0.0,
        "p10_best_iou": float(np.percentile(best, 10)) if len(best) else 0.0,
        "tiny_boxes_frac": float(
            (np.sqrt(np.asarray(areas) * np.prod(cfg.image_hw())) < 8).mean()
        ) if areas else 0.0,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--data", required=True, help="tfrecord glob pattern")
    p.add_argument("--limit", type=int, default=2000)
    args = p.parse_args()

    stats = analyze(args.config, args.data, args.limit)
    print(f"images: {stats['images']}   gt boxes: {stats['boxes']}")
    print(f"mean best-anchor IoU:       {stats['mean_best_iou']:.3f}")
    print(f"matched (>= thr):           {stats['matched_frac']:.1%}")
    print(f"force-match rescued only:   {stats['force_match_only_frac']:.1%}")
    print(f"uncovered (best IoU < 0.1): {stats['uncovered_frac']:.1%}")
    print(f"10th pct best IoU:          {stats['p10_best_iou']:.3f}")
    print(f"boxes smaller than 8px:     {stats['tiny_boxes_frac']:.1%}")


if __name__ == "__main__":
    main()
