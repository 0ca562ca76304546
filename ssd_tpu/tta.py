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

    def predict(self, images) -> dict:
        if isinstance(images, (list, tuple)):
            single = False
            image_list = [np.asarray(im) for im in images]
        else:
            images = np.asarray(images)
            single = images.ndim == 3
            image_list = [images] if single else list(images)
        n = len(image_list)

        # ONE device call: [img_0..img_{n-1}, flip_0..flip_{n-1}]
        flipped = [im[:, ::-1] for im in image_list]
        out = self.predictor.predict(image_list + flipped)

        results = {"boxes": [], "scores": [], "labels": [], "num_boxes": []}
        for i in range(n):
            base_b = np.asarray(out["boxes"][i])
            flip_b = np.asarray(out["boxes"][n + i]).copy()
            # unflip: x' = 1 - x, swapping xmin/xmax
            flip_b[:, [1, 3]] = 1.0 - flip_b[:, [3, 1]]
            boxes = np.concatenate([base_b, flip_b], axis=0)
            scores = np.concatenate([np.asarray(out["scores"][i]),
                                     np.asarray(out["scores"][n + i])])
            labels = np.concatenate([np.asarray(out["labels"][i]),
                                     np.asarray(out["labels"][n + i])])
            if self.merge == "wbf":
                b, s, l, c = weighted_box_fusion(
                    jnp.asarray(boxes, jnp.float32),
                    jnp.asarray(scores, jnp.float32),
                    jnp.asarray(labels, jnp.int32),
                    jnp.float32(self.iou_threshold),
                    jnp.zeros((self.max_boxes,), jnp.float32),
                    num_views=2)
            else:
                b, s, l, c = _merge_nms(
                    jnp.asarray(boxes, jnp.float32),
                    jnp.asarray(scores, jnp.float32),
                    jnp.asarray(labels, jnp.int32),
                    jnp.float32(self.iou_threshold),
                    jnp.zeros((self.max_boxes,), jnp.float32),
                    metric="iou")
            results["boxes"].append(np.asarray(b))
            results["scores"].append(np.asarray(s))
            results["labels"].append(np.asarray(l))
            results["num_boxes"].append(int(c))

        result = {k: np.stack(v) if k != "num_boxes" else np.asarray(v)
                  for k, v in results.items()}
        if self.label_map is not None:
            result["names"] = np.array([
                [self.label_map.get(int(x), str(int(x))) for x in row]
                for row in result["labels"]])
        if single:
            result = {k: v[0] for k, v in result.items()}
        return result
