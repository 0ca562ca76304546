"""Test-time augmentation: flip views fused on-device.

The accuracy-tier serving mode: run the detector on the image AND its
horizontal flip (optionally extra scales), map detections back to the
original frame, and fuse the views with weighted box fusion
(``ssd_tpu.ops.wbf`` — score-weighted coordinate averaging, which
tightens boxes because each view's localization error is independent)
or plain NMS.

TPU-shaped: all views of all images go through ONE batched device call
(a batch of N at 2 views is a predict at 2N — the same compiled bucket
serving uses), and the per-image fusion is a jitted static-shape kernel.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ssd_tpu.ops.wbf import weighted_box_fusion
from ssd_tpu.tiling import _merge_nms


def unflip_boxes(boxes: np.ndarray) -> np.ndarray:
    """Map boxes detected on a horizontally-flipped frame back:
    x' = 1 - x, swapping xmin/xmax. (..., 4) yxyx."""
    out = np.asarray(boxes).copy()
    out[..., [1, 3]] = 1.0 - out[..., [3, 1]]
    return out


def fuse_views(boxes, scores, labels, iou_threshold: float, max_boxes: int,
               merge: str = "wbf", num_views: int = 2):
    """Fuse one image's flat candidate set from ``num_views`` views.

    boxes (K, 4) already in the ORIGINAL frame, scores (K,) with invalid
    slots <= 0, labels (K,). Returns (boxes, scores, labels, count) numpy.
    """
    args = (jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            jnp.asarray(labels, jnp.int32), jnp.float32(iou_threshold),
            jnp.zeros((max_boxes,), jnp.float32))
    if merge == "wbf":
        b, s, l, c = weighted_box_fusion(*args, num_views=num_views)
    else:
        b, s, l, c = _merge_nms(*args, metric="iou")
    return np.asarray(b), np.asarray(s), np.asarray(l), int(c)


def fuse_flip_batch(out, out_flipped, iou_threshold: float, max_boxes: int,
                    merge: str = "wbf") -> dict:
    """Batched flip-TTA fusion: ``out`` and ``out_flipped`` are detection
    dicts (numpy, (N, M, ...)) from the base and horizontally-flipped
    views; flipped boxes are mapped back and each image's views fused."""
    n = len(out["boxes"])
    flip_boxes = unflip_boxes(out_flipped["boxes"])
    res = {"boxes": [], "scores": [], "labels": [], "num_boxes": []}
    for i in range(n):
        b, s, l, c = fuse_views(
            np.concatenate([out["boxes"][i], flip_boxes[i]], axis=0),
            np.concatenate([out["scores"][i], out_flipped["scores"][i]]),
            np.concatenate([out["labels"][i], out_flipped["labels"][i]]),
            iou_threshold, max_boxes, merge=merge)
        res["boxes"].append(b)
        res["scores"].append(s)
        res["labels"].append(l)
        res["num_boxes"].append(c)
    return {k: (np.stack(v) if k != "num_boxes" else np.asarray(v))
            for k, v in res.items()}


class EnsemblePredictor:
    """Fuse detections from SEVERAL models (e.g. different backbones or
    training seeds) with weighted box fusion — the standard production
    mAP squeeze. Each member is a full ``Predictor``; every member sees
    the same batch (its own compiled program, its own resolution if
    configs differ — members resize independently), and per image the
    union of detections is WBF-fused with the cross-model coverage
    adjustment (a box only one model found is down-weighted).

    ``weights`` (optional) scale each member's scores before fusion —
    the paper's per-model confidence weighting.
    """

    def __init__(self, predictors, weights=None, merge: str = "wbf",
                 iou_threshold: float | None = None,
                 max_boxes: int | None = None):
        if not predictors:
            raise ValueError("need at least one predictor")
        if weights is not None and len(weights) != len(predictors):
            raise ValueError("one weight per predictor")
        if merge not in ("wbf", "nms"):
            raise ValueError(f"merge must be wbf|nms, got {merge}")
        self.predictors = list(predictors)
        self.weights = ([1.0] * len(predictors) if weights is None
                        else [float(w) for w in weights])
        self.cfg = self.predictors[0].cfg
        self.merge = merge
        self.iou_threshold = float(iou_threshold
                                   if iou_threshold is not None
                                   else self.cfg.nms.iou_threshold)
        self.max_boxes = int(max_boxes or self.cfg.nms.max_boxes)
        self.label_map = getattr(self.predictors[0], "label_map", None)

    def predict(self, images) -> dict:
        if isinstance(images, (list, tuple)):
            single = False
            image_list = [np.asarray(im) for im in images]
        else:
            images = np.asarray(images)
            single = images.ndim == 3
            image_list = [images] if single else list(images)
        n = len(image_list)

        outs = [p.predict(image_list) for p in self.predictors]
        res = {"boxes": [], "scores": [], "labels": [], "num_boxes": []}
        for i in range(n):
            boxes = np.concatenate(
                [np.asarray(o["boxes"][i]) for o in outs], axis=0)
            scores = np.concatenate(
                [np.asarray(o["scores"][i]) * w
                 for o, w in zip(outs, self.weights)])
            labels = np.concatenate(
                [np.asarray(o["labels"][i]) for o in outs])
            b, s, l, c = fuse_views(boxes, scores, labels,
                                    self.iou_threshold, self.max_boxes,
                                    merge=self.merge,
                                    num_views=len(self.predictors))
            res["boxes"].append(b)
            res["scores"].append(s)
            res["labels"].append(l)
            res["num_boxes"].append(c)
        result = {k: (np.stack(v) if k != "num_boxes" else np.asarray(v))
                  for k, v in res.items()}
        if self.label_map is not None:
            result["names"] = np.array([
                [self.label_map.get(int(x), str(int(x))) for x in row]
                for row in result["labels"]])
        if single:
            result = {k: v[0] for k, v in result.items()}
        return result


class TTAPredictor:
    """``predict(image | images | [images])`` with flip TTA.

    Args:
      predictor: a :class:`ssd_tpu.predictor.Predictor`.
      merge: ``"wbf"`` (default — fuse clusters into weighted averages) or
        ``"nms"`` (keep the best view's box per cluster).
      iou_threshold: cluster/suppression threshold for the merge
        (default: the config's NMS threshold).
      max_boxes: output size (default: the config's NMS max_boxes).
    """

    def __init__(self, predictor, merge: str = "wbf",
                 iou_threshold: float | None = None,
                 max_boxes: int | None = None):
        if merge not in ("wbf", "nms"):
            raise ValueError(f"merge must be wbf|nms, got {merge}")
        self.predictor = predictor
        self.cfg = predictor.cfg
        self.merge = merge
        self.iou_threshold = float(iou_threshold
                                   if iou_threshold is not None
                                   else self.cfg.nms.iou_threshold)
        self.max_boxes = int(max_boxes or self.cfg.nms.max_boxes)
        self.label_map = getattr(predictor, "label_map", None)

    # --- serving-daemon surface (mirrors Predictor's) -------------------
    @property
    def preserve_aspect(self) -> bool:
        return getattr(self.predictor, "preserve_aspect", False)

    def _bucket_for(self, n: int) -> int:
        # the device sees 2n images (base + flip views)
        return self.predictor._bucket_for(2 * n)

    def warmup(self, batch_size: int = 1) -> None:
        self.predictor.warmup(2 * batch_size)

    def predict(self, images) -> dict:
        return self.predict_collect(self.predict_dispatch(images))

    # The dispatch/collect split mirrors Predictor's, so the serving
    # daemon's device pipeline works through TTA unchanged: dispatch
    # issues the doubled-view device call without blocking, collect does
    # the readback + fusion.
    def predict_dispatch(self, images) -> dict:
        if isinstance(images, (list, tuple)):
            single = False
            image_list = [np.asarray(im) for im in images]
        else:
            images = np.asarray(images)
            single = images.ndim == 3
            image_list = [images] if single else list(images)
        # ONE device call: [img_0..img_{n-1}, flip_0..flip_{n-1}]
        flipped = [im[:, ::-1] for im in image_list]
        views = image_list + flipped
        if hasattr(self.predictor, "predict_dispatch"):
            handle = self.predictor.predict_dispatch(views)
        else:  # duck-typed member without the split API: block here
            handle = {"done": self.predictor.predict(views)}
        return {"inner": handle, "n": len(image_list), "single": single}

    def predict_collect(self, handle: dict) -> dict:
        inner = handle["inner"]
        out = (inner["done"] if "done" in inner
               else self.predictor.predict_collect(inner))
        n, single = handle["n"], handle["single"]
        base = {k: np.asarray(v)[:n] for k, v in out.items()
                if k != "names"}
        flip = {k: np.asarray(v)[n:] for k, v in out.items()
                if k != "names"}
        result = fuse_flip_batch(base, flip, self.iou_threshold,
                                 self.max_boxes, merge=self.merge)
        if self.label_map is not None:
            result["names"] = np.array([
                [self.label_map.get(int(x), str(int(x))) for x in row]
                for row in result["labels"]])
        if single:
            result = {k: v[0] for k, v in result.items()}
        return result
