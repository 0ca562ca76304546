"""Training target creation: matches -> regression + classification targets.

TPU-native counterpart of the reference's ``src/training_target_creation.py``
(SURVEY.md §2). Fully batched gather/encode — the reference's per-image
``tf.map_fn`` becomes one ``(N, A)`` gather.

Label convention: ``gt_labels`` holds foreground class ids in
``[0, num_classes)`` (sigmoid heads, no background class). Classification
targets are one-hot over foreground classes with an explicit per-anchor
weight mask separating negatives (train as all-zero one-hot) from ignored
anchors (zero weight).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ssd_tpu.config import MatcherConfig
from ssd_tpu.ops import box_utils
from ssd_tpu.ops.matching import match_anchors


class Targets(NamedTuple):
    reg_targets: jnp.ndarray   # (N, A, 4) encoded box targets (0 where not positive)
    cls_targets: jnp.ndarray   # (N, A, C) one-hot (all-zero for negatives)
    cls_weights: jnp.ndarray   # (N, A) 1 for positives+negatives, 0 for ignored
    reg_weights: jnp.ndarray   # (N, A) 1 for positives only
    matches: jnp.ndarray       # (N, A) raw match indices


def create_targets(
    anchors: jnp.ndarray,      # (A, 4)
    gt_boxes: jnp.ndarray,     # (N, M, 4) padded
    gt_labels: jnp.ndarray,    # (N, M) int32 in [0, C)
    num_boxes: jnp.ndarray,    # (N,)
    num_classes: int,
    matcher_cfg: MatcherConfig,
) -> Targets:
    matches = match_anchors(anchors, gt_boxes, num_boxes, matcher_cfg)  # (N, A)

    positive = matches >= 0
    ignored = matches == -2

    safe_matches = jnp.maximum(matches, 0)  # (N, A) valid gather indices
    matched_boxes = jnp.take_along_axis(
        gt_boxes, safe_matches[..., None], axis=1
    )  # (N, A, 4)
    matched_labels = jnp.take_along_axis(gt_labels, safe_matches, axis=1)  # (N, A)

    reg_targets = box_utils.encode(matched_boxes, anchors[None])
    reg_targets = jnp.where(positive[..., None], reg_targets, 0.0)

    one_hot = _one_hot(matched_labels, num_classes)
    cls_targets = jnp.where(positive[..., None], one_hot, 0.0)

    cls_weights = jnp.where(ignored, 0.0, 1.0)
    reg_weights = positive.astype(jnp.float32)
    return Targets(reg_targets, cls_targets, cls_weights, reg_weights, matches)


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return (labels[..., None] == jnp.arange(num_classes)[None, None, :]).astype(
        jnp.float32
    )
