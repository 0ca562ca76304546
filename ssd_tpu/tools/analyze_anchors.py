"""Anchor-coverage analysis: how well the anchor spec fits a dataset.

The anchor configuration (scales, aspect ratios, levels — SURVEY.md §2
"Anchor generator" row) determines which ground-truth boxes CAN be
learned: a gt whose best anchor IoU is below ``matching_threshold`` is
trained only through the forced match (one anchor), and a gt below every
anchor's reach effectively caps recall before training even starts. This
tool runs the PRODUCTION matcher (force-match and ignore band included)
over a dataset and reports the numbers practitioners tune anchors with:

  * matched-gt recall (fraction of gts with >= 1 anchor above threshold),
    overall and per size bucket (COCO small/medium/large);
  * best-IoU distribution over gts (mean / p10 / p50) and the uncovered
    tail (best IoU < 0.1 — unlearnable even via force-match in practice);
  * forced-match reliance (gts learnable ONLY via force-match);
  * positives per image, ignore-band volume, and the per-FPN-level
    positive split (are all levels actually used?).

Usage::

    python -m ssd_tpu.tools.analyze_anchors --config cfg.json \
        [--split val|train] [--data "tfrecord-glob"] [--limit N]
        [--batch-size N] [--json out.json]

Everything runs on the host platform (CPU is fine — the matcher is the
same batched jnp code the train step jits); no TPU required.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config
from ssd_tpu.data.pipeline import Pipeline
from ssd_tpu.ops.anchors import anchor_counts_per_level, generate_anchors
from ssd_tpu.ops.box_utils import iou
from ssd_tpu.ops.matching import match_anchors

# COCO area buckets, in pixels^2 of the ORIGINAL image scale; boxes here
# are normalized, so buckets are evaluated at the configured input size.
_AREA_BUCKETS = (("small", 0.0, 32.0**2), ("medium", 32.0**2, 96.0**2),
                 ("large", 96.0**2, float("inf")))


@dataclasses.dataclass
class _Acc:
    n_gts: int = 0
    n_images: int = 0
    n_matched: int = 0            # gts with >=1 anchor above threshold
    n_forced_only: int = 0        # gts learnable only via force-match
    best_ious: list = dataclasses.field(default_factory=list)
    positives: list = dataclasses.field(default_factory=list)
    ignored: list = dataclasses.field(default_factory=list)
    level_pos: np.ndarray | None = None
    bucket_gts: dict = dataclasses.field(
        default_factory=lambda: {k: 0 for k, *_ in _AREA_BUCKETS})
    bucket_matched: dict = dataclasses.field(
        default_factory=lambda: {k: 0 for k, *_ in _AREA_BUCKETS})


def _batch_stats(anchors, level_edges, cfg, gt, num, acc: _Acc):
    n = gt.shape[0]
    ih, iw = cfg.image_hw()

    ious = np.asarray(iou(jnp.asarray(anchors)[None], jnp.asarray(gt)))
    best_per_gt = ious.max(axis=1)                            # (N, M)

    matches = np.asarray(match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(num),
        cfg.matcher))                                         # (N, A)

    thr = cfg.matcher.matching_threshold
    for i in range(n):
        k = int(num[i])
        if k == 0:
            acc.n_images += 1
            acc.positives.append(0)
            acc.ignored.append(int((matches[i] == -2).sum()))
            continue
        bi = best_per_gt[i, :k]
        acc.best_ious.extend(bi.tolist())
        acc.n_gts += k
        acc.n_matched += int((bi >= thr).sum())
        # a gt below threshold still appears in `matches` via force-match
        gt_ids, counts = np.unique(matches[i][matches[i] >= 0],
                                   return_counts=True)
        claimed = dict(zip(gt_ids.tolist(), counts.tolist()))
        for j in range(k):
            if bi[j] < thr and claimed.get(j, 0) > 0:
                acc.n_forced_only += 1
        # size buckets at the configured input resolution
        h = (gt[i, :k, 2] - gt[i, :k, 0]) * ih
        w = (gt[i, :k, 3] - gt[i, :k, 1]) * iw
        areas = h * w
        for name, lo, hi in _AREA_BUCKETS:
            sel = (areas >= lo) & (areas < hi)
            acc.bucket_gts[name] += int(sel.sum())
            acc.bucket_matched[name] += int((bi[sel] >= thr).sum())

        pos = matches[i] >= 0
        acc.positives.append(int(pos.sum()))
        acc.ignored.append(int((matches[i] == -2).sum()))
        if acc.level_pos is None:
            acc.level_pos = np.zeros(len(level_edges) - 1, np.int64)
        for li in range(len(level_edges) - 1):
            acc.level_pos[li] += int(
                pos[level_edges[li]:level_edges[li + 1]].sum())
        acc.n_images += 1


def analyze(cfg: Config, split: str = "val", limit: int = 0,
            batch_size: int = 16, data_pattern: str = "") -> dict:
    pattern = data_pattern or (
        cfg.data.val_file_pattern if split == "val"
        else cfg.data.train_file_pattern)
    pipe = Pipeline(pattern, cfg, is_training=False, batch_size=batch_size)
    anchors = generate_anchors(cfg.image_size, cfg.anchors)
    counts = anchor_counts_per_level(cfg.image_size, cfg.anchors)
    level_edges = np.concatenate([[0], np.cumsum(counts)])

    acc = _Acc()
    seen = 0
    for batch in pipe:
        keep = batch["valid"]
        gt = batch["boxes"][keep]
        num = batch["num_boxes"][keep]
        if limit and seen + len(gt) > limit:
            gt, num = gt[: limit - seen], num[: limit - seen]
        if len(gt):
            _batch_stats(anchors, level_edges, cfg, gt, num, acc)
        seen += len(gt)
        if limit and seen >= limit:
            break

    best = np.asarray(acc.best_ious) if acc.best_ious else np.zeros(1)
    report = {
        "images": acc.n_images,
        "gts": acc.n_gts,
        "anchors": int(anchors.shape[0]),
        "matched_recall": round(acc.n_matched / max(acc.n_gts, 1), 4),
        "forced_only_frac": round(acc.n_forced_only / max(acc.n_gts, 1), 4),
        "uncovered_frac": round(float((best < 0.1).mean()), 4),
        "best_iou_mean": round(float(best.mean()), 4),
        "best_iou_p10": round(float(np.percentile(best, 10)), 4),
        "best_iou_p50": round(float(np.percentile(best, 50)), 4),
        "positives_per_image": round(float(np.mean(acc.positives)), 2),
        "ignored_per_image": round(float(np.mean(acc.ignored)), 2),
        "bucket_recall": {
            name: (round(acc.bucket_matched[name] / g, 4) if (
                g := acc.bucket_gts[name]) else None)
            for name, *_ in _AREA_BUCKETS
        },
        "bucket_gts": dict(acc.bucket_gts),
        "level_positive_share": (
            [round(float(x), 4) for x in
             (acc.level_pos / max(acc.level_pos.sum(), 1))]
            if acc.level_pos is not None else []),
    }
    return report


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--split", default="val", choices=["val", "train"])
    p.add_argument("--data", default="",
                   help="tfrecord glob (overrides --split's pattern)")
    p.add_argument("--limit", type=int, default=0,
                   help="max images (0 = all)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--json", default="", help="also write the report here")
    args = p.parse_args(argv)

    cfg = Config.load(args.config)
    report = analyze(cfg, args.split, args.limit, args.batch_size,
                     data_pattern=args.data)

    print(f"anchor coverage over {report['images']} images / "
          f"{report['gts']} gts ({report['anchors']} anchors):")
    print(f"  matched-gt recall @IoU>={cfg.matcher.matching_threshold}: "
          f"{report['matched_recall']:.1%}  "
          f"(forced-match-only: {report['forced_only_frac']:.1%}, "
          f"uncovered: {report['uncovered_frac']:.1%})")
    print(f"  best-IoU per gt: mean {report['best_iou_mean']:.3f}  "
          f"p10 {report['best_iou_p10']:.3f}  p50 {report['best_iou_p50']:.3f}")
    for name, *_ in _AREA_BUCKETS:
        r = report["bucket_recall"][name]
        g = report["bucket_gts"][name]
        print(f"  {name:>6}: recall "
              + (f"{r:.1%}" if r is not None else "   n/a")
              + f"  ({g} gts)")
    print(f"  positives/image: {report['positives_per_image']}  "
          f"ignored/image: {report['ignored_per_image']}")
    if report["level_positive_share"]:
        share = " ".join(f"P{3 + i}:{s:.0%}"
                         for i, s in enumerate(report["level_positive_share"]))
        print(f"  positive split over levels: {share}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
