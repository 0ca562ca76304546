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


def match_image_multi(
    ious: np.ndarray,        # (D, G) rows score-sorted descending
    thresholds: np.ndarray,  # (T,)
) -> np.ndarray:
    """Greedy COCO matching at ALL IoU thresholds at once.

    Returns bool (D, T): detection d is a true positive at threshold t.
    The detection loop is inherently sequential (each match consumes a gt),
    but the inner scan is vectorized over (T, G), so the host cost is
    O(D) numpy ops per image-class instead of O(D*G*T) Python ops — the
    difference between hours and seconds at COCO scale (5k imgs x 80
    classes x 10 thresholds).
    """
    d, g = ious.shape
    t = len(thresholds)
    tp = np.zeros((d, t), bool)
    if d == 0 or g == 0:
        return tp
    taken = np.zeros((t, g), bool)
    rows = np.arange(t)
    for i in range(d):
        avail = np.where(taken, -1.0, ious[i][None, :])  # (T, G)
        # Highest-IoU untaken gt; ties go to the LAST index, matching the
        # scalar scan this replaced (argmax alone takes the first).
        j = g - 1 - np.argmax(avail[:, ::-1], axis=1)
        ok = avail[rows, j] >= thresholds
        tp[i] = ok
        taken[rows[ok], j[ok]] = True
    return tp


def match_image(
    det_boxes: np.ndarray,   # (D, 4) score-sorted descending
    gt_boxes: np.ndarray,    # (G, 4)
    iou_thr: float,
) -> np.ndarray:
    """Greedy COCO matching. Returns bool (D,): detection is a true positive."""
    if len(det_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros(len(det_boxes), bool)
    ious = boxes_iou_numpy(det_boxes, gt_boxes)
    return match_image_multi(ious, np.asarray([iou_thr]))[:, 0]


def average_precision_multi(scores: np.ndarray, tp: np.ndarray,
                            num_gt: int) -> np.ndarray:
    """All-point-interpolated AP at every threshold column of ``tp``.

    ``scores`` (D,), ``tp`` (D, T) -> AP (T,). One sort + one cumsum pass
    shared across all T thresholds.
    """
    t = tp.shape[1]
    if num_gt == 0:
        return np.full(t, np.nan)
    if len(scores) == 0:
        return np.zeros(t)
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    cum_tp = np.cumsum(tp, axis=0)
    cum_fp = np.cumsum(~tp, axis=0)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # precision envelope
    precision = np.maximum.accumulate(precision[::-1], axis=0)[::-1]
    # integrate over recall deltas
    r = np.concatenate([np.zeros((1, t)), recall], axis=0)
    return np.sum((r[1:] - r[:-1]) * precision, axis=0)


def average_precision(scores: np.ndarray, tp: np.ndarray,
                      num_gt: int) -> float:
    """All-point-interpolated AP from per-detection (score, tp) pairs."""
    return float(
        average_precision_multi(np.asarray(scores),
                                np.asarray(tp, bool).reshape(-1, 1),
                                num_gt)[0]
    )


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
            gt_c = gt_boxes[gmask]
            if len(gt_c):
                ious = boxes_iou_numpy(boxes_c, gt_c)
                tp = match_image_multi(ious, self.iou_thresholds)  # (D, T)
            else:
                tp = np.zeros((len(boxes_c), len(self.iou_thresholds)), bool)
            self._scores[c].append(scores_c)
            self._tp[c].append(tp)

    def add_batch(self, detections: dict, gt_boxes, gt_labels, num_boxes,
                  valid=None) -> None:
        """detections: the Detections dict/namedtuple from predict (numpy).

        ``valid`` (B,) bool: rows that are real examples; padded tail rows
        of an eval batch (pipeline ``valid`` mask) are skipped.
        """
        boxes = np.asarray(detections["boxes"] if isinstance(detections, dict)
                           else detections.boxes)
        scores = np.asarray(detections["scores"] if isinstance(detections, dict)
                            else detections.scores)
        labels = np.asarray(detections["labels"] if isinstance(detections, dict)
                            else detections.labels)
        nb = np.asarray(detections["num_boxes"] if isinstance(detections, dict)
                        else detections.num_boxes)
        for i in range(len(boxes)):
            if valid is not None and not valid[i]:
                continue
            d = int(nb[i])
            g = int(num_boxes[i])
            self.add_image(
                boxes[i, :d], scores[i, :d], labels[i, :d],
                np.asarray(gt_boxes[i][:g]), np.asarray(gt_labels[i][:g]),
            )

    def merge(self, other: "DetectionEvaluator") -> None:
        """Fold another evaluator's accumulated stats into this one.

        Statistically exact: AP depends only on the global multiset of
        (score, tp-vector) pairs per class plus the global gt count, so
        evaluating disjoint shards on separate evaluators and merging equals
        a single-stream evaluation.
        """
        assert other.num_classes == self.num_classes
        assert np.allclose(other.iou_thresholds, self.iou_thresholds)
        for c in range(self.num_classes):
            self._scores[c].extend(other._scores[c])
            self._tp[c].extend(other._tp[c])
        self._num_gt += other._num_gt

    def _pack(self) -> dict:
        """Fixed-dtype flat arrays of the accumulated state (for allgather)."""
        t = len(self.iou_thresholds)
        scores, tps, cls = [], [], []
        for c in range(self.num_classes):
            for s, tp in zip(self._scores[c], self._tp[c]):
                scores.append(np.asarray(s, np.float32))
                tps.append(np.asarray(tp, bool))
                cls.append(np.full(len(s), c, np.int32))
        return {
            "scores": (np.concatenate(scores) if scores
                       else np.zeros(0, np.float32)),
            "tp": (np.concatenate(tps, axis=0) if tps
                   else np.zeros((0, t), bool)),
            "cls": (np.concatenate(cls) if cls else np.zeros(0, np.int32)),
            "num_gt": self._num_gt.copy(),
        }

    def _load_packed(self, packed: dict) -> None:
        """Merge one host's packed state (inverse of :meth:`_pack`)."""
        cls = np.asarray(packed["cls"])
        scores = np.asarray(packed["scores"])
        tp = np.asarray(packed["tp"], bool)
        for c in np.unique(cls):
            if c < 0:  # padding sentinel
                continue
            m = cls == c
            self._scores[int(c)].append(scores[m])
            self._tp[int(c)].append(tp[m])
        self._num_gt += np.asarray(packed["num_gt"], np.int64)

    def gather(self) -> "DetectionEvaluator":
        """All-gather accumulated stats across JAX processes.

        Multi-host eval (SURVEY.md §5 distributed row): each host evaluates
        its disjoint shard of the val set, then the small per-detection
        (score, tp, class) stats — not images — are gathered so every host
        computes the identical GLOBAL mAP. Single-process: returns self.
        Stats are padded to the max per-host count (class sentinel -1)
        because allgather needs equal shapes.
        """
        import jax

        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils

        packed = self._pack()
        n = len(packed["scores"])
        n_max = int(np.max(multihost_utils.process_allgather(
            np.asarray(n, np.int64))))
        pad = n_max - n
        t = len(self.iou_thresholds)
        padded = {
            "scores": np.pad(packed["scores"], (0, pad)),
            "tp": np.pad(packed["tp"], ((0, pad), (0, 0))),
            "cls": np.pad(packed["cls"], (0, pad), constant_values=-1),
            "num_gt": packed["num_gt"],
        }
        gathered = multihost_utils.process_allgather(padded)  # leading P dim
        out = DetectionEvaluator(self.num_classes, self.iou_thresholds)
        for p in range(jax.process_count()):
            out._load_packed({k: np.asarray(v)[p] for k, v in gathered.items()})
        assert int(out._num_gt.sum()) >= int(self._num_gt.sum())
        return out

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
            ap[c] = average_precision_multi(scores, tp, int(self._num_gt[c]))
        idx50 = int(np.argmin(np.abs(self.iou_thresholds - 0.5)))
        with np.errstate(invalid="ignore"):
            return {
                "mAP": float(np.nanmean(ap)),
                "AP50": float(np.nanmean(ap[:, idx50])),
                "per_class_AP50": np.asarray(ap[:, idx50]),
            }


def detections_to_coco(det: dict, source_ids, orig_hw, valid=None,
                       category_ids: dict | None = None) -> list[dict]:
    """One batch of detections -> pycocotools results-format entries.

    ``det``: {boxes (B, D, 4) normalized ymin/xmin/ymax/xmax, scores,
    labels, num_boxes}; ``source_ids (B,)`` original dataset image ids;
    ``orig_hw (B, 2)`` pre-resize image dims (the square-stretch resize
    keeps normalized coords aligned with the original frame);
    ``category_ids`` maps contiguous labels back to dataset category ids
    (identity when None). Output bbox format is COCO [x, y, w, h] in
    absolute original-image pixels.
    """
    out = []
    b = len(source_ids)
    for i in range(b):
        if valid is not None and not bool(valid[i]):
            continue
        h, w = int(orig_hw[i][0]), int(orig_hw[i][1])
        n = int(det["num_boxes"][i])
        for d in range(n):
            y0, x0, y1, x1 = [float(v) for v in det["boxes"][i][d]]
            lab = int(det["labels"][i][d])
            out.append({
                "image_id": int(source_ids[i]),
                "category_id": int(category_ids.get(lab, lab))
                if category_ids else lab,
                "bbox": [round(x0 * w, 2), round(y0 * h, 2),
                         round((x1 - x0) * w, 2), round((y1 - y0) * h, 2)],
                "score": round(float(det["scores"][i][d]), 5),
            })
    return out
