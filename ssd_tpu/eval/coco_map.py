"""Detection mAP evaluation, numpy, dependency-free.

TPU-native counterpart of the reference's ``src/evaluation_utils.py``
(SURVEY.md §2 "Eval utilities" row — per-class AP@0.5 PASCAL-style) plus the
COCO-style AP@[.5:.95] the BASELINE parity metric calls for. pycocotools is
not available in this environment, so the matching/interpolation rules are
implemented directly:

  * greedy matching of detections (score-descending) to ground truth with
    IoU >= threshold, one match per gt (COCO protocol);
  * PASCAL VOC-2010+ AP: area under the monotonically-decreasing
    precision-recall envelope (all-point interpolation);
  * COCO mAP: mean over IoU thresholds 0.50:0.05:0.95 and classes.

Inputs are plain numpy; run the jitted predict over the val set, then feed
results here on host (SURVEY.md §3.5).
"""

from __future__ import annotations

import numpy as np

from ssd_tpu.data.augment import boxes_iou_numpy

COCO_IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def match_image(
    det_boxes: np.ndarray,   # (D, 4) score-sorted descending
    gt_boxes: np.ndarray,    # (G, 4)
    iou_thr: float,
) -> np.ndarray:
    """Greedy COCO matching. Returns bool (D,): detection is a true positive."""
    d, g = len(det_boxes), len(gt_boxes)
    tp = np.zeros(d, bool)
    if d == 0 or g == 0:
        return tp
    ious = boxes_iou_numpy(det_boxes, gt_boxes)  # (D, G)
    taken = np.zeros(g, bool)
    for i in range(d):
        j = -1
        best = iou_thr
        for k in range(g):
            if not taken[k] and ious[i, k] >= best:
                best = ious[i, k]
                j = k
        if j >= 0:
            taken[j] = True
            tp[i] = True
    return tp


def average_precision(scores: np.ndarray, tp: np.ndarray,
                      num_gt: int) -> float:
    """All-point-interpolated AP from per-detection (score, tp) pairs."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # integrate over recall deltas
    r = np.concatenate([[0.0], recall])
    return float(np.sum((r[1:] - r[:-1]) * precision))


class DetectionEvaluator:
    """Accumulates per-image predictions + ground truth, computes mAP."""

    def __init__(self, num_classes: int,
                 iou_thresholds=COCO_IOU_THRESHOLDS):
        self.num_classes = num_classes
        self.iou_thresholds = np.asarray(iou_thresholds)
        # per (class): list of (scores, tp-per-threshold) and gt counts
        self._scores: list[list[np.ndarray]] = [[] for _ in range(num_classes)]
        self._tp: list[list[np.ndarray]] = [[] for _ in range(num_classes)]
        self._num_gt = np.zeros(num_classes, np.int64)

    def add_image(
        self,
        det_boxes: np.ndarray,   # (D, 4)
        det_scores: np.ndarray,  # (D,)
        det_labels: np.ndarray,  # (D,)
        gt_boxes: np.ndarray,    # (G, 4)
        gt_labels: np.ndarray,   # (G,)
    ) -> None:
        for c in np.unique(np.concatenate([det_labels, gt_labels])).astype(int):
            if c < 0 or c >= self.num_classes:
                continue
            dmask = det_labels == c
            gmask = gt_labels == c
            self._num_gt[c] += int(gmask.sum())
            if not dmask.any():
                continue
            scores_c = det_scores[dmask]
            order = np.argsort(-scores_c, kind="stable")
            boxes_c = det_boxes[dmask][order]
            scores_c = scores_c[order]
            tp = np.stack([
                match_image(boxes_c, gt_boxes[gmask], thr)
                for thr in self.iou_thresholds
            ], axis=1)  # (D, T)
            self._scores[c].append(scores_c)
            self._tp[c].append(tp)

    def add_batch(self, detections: dict, gt_boxes, gt_labels, num_boxes) -> None:
        """detections: the Detections dict/namedtuple from predict (numpy)."""
        boxes = np.asarray(detections["boxes"] if isinstance(detections, dict)
                           else detections.boxes)
        scores = np.asarray(detections["scores"] if isinstance(detections, dict)
                            else detections.scores)
        labels = np.asarray(detections["labels"] if isinstance(detections, dict)
                            else detections.labels)
        nb = np.asarray(detections["num_boxes"] if isinstance(detections, dict)
                        else detections.num_boxes)
        for i in range(len(boxes)):
            d = int(nb[i])
            g = int(num_boxes[i])
            self.add_image(
                boxes[i, :d], scores[i, :d], labels[i, :d],
                np.asarray(gt_boxes[i][:g]), np.asarray(gt_labels[i][:g]),
            )

    def result(self) -> dict:
        t = len(self.iou_thresholds)
        ap = np.full((self.num_classes, t), np.nan)
        for c in range(self.num_classes):
            if self._num_gt[c] == 0:
                continue
            if self._scores[c]:
                scores = np.concatenate(self._scores[c])
                tp = np.concatenate(self._tp[c], axis=0)  # (D, T)
            else:
                scores = np.zeros(0)
                tp = np.zeros((0, t), bool)
            for ti in range(t):
                ap[c, ti] = average_precision(scores, tp[:, ti],
                                              int(self._num_gt[c]))
        idx50 = int(np.argmin(np.abs(self.iou_thresholds - 0.5)))
        with np.errstate(invalid="ignore"):
            return {
                "mAP": float(np.nanmean(ap)),
                "AP50": float(np.nanmean(ap[:, idx50])),
                "per_class_AP50": np.asarray(ap[:, idx50]),
            }
