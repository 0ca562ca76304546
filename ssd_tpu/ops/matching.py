"""Batched IoU-argmax anchor matching.

TPU-native counterpart of the reference's matcher inside
``src/training_target_creation.py`` (SURVEY.md §2 "Target creation" row). The
reference loops over images with ``tf.map_fn``; here the whole batch is one
broadcasted ``(N, A, M)`` IoU computation with ``num_boxes`` masking — no
per-image loop, fully MXU/VPU friendly and trivially shardable over the data
mesh.

Match semantics (standard SSD/RetinaNet):
  * each anchor matches its argmax-IoU ground-truth box;
  * positive if max IoU >= ``matching_threshold``;
  * negative if max IoU <  ``negative_threshold`` (match = -1);
  * ignored in between (match = -2);
  * optionally, each ground-truth box force-matches its best anchor so no gt
    goes unlearned.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssd_tpu.config import MatcherConfig
from ssd_tpu.constants import IGNORE_MATCH, NEGATIVE_MATCH
from ssd_tpu.ops import box_utils


def match_anchors(
    anchors: jnp.ndarray,       # (A, 4)
    gt_boxes: jnp.ndarray,      # (N, M, 4) padded
    num_boxes: jnp.ndarray,     # (N,) int32 — valid gt count per image
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Batched matcher.

    Returns:
      ``(N, A)`` int32 matches: index into ``gt_boxes`` for positives,
      ``NEGATIVE_MATCH`` (-1) for negatives, ``IGNORE_MATCH`` (-2) for the
      ignore band.
    """
    n, m = gt_boxes.shape[0], gt_boxes.shape[1]
    a = anchors.shape[0]

    # (N, A, M) IoU with padded gt masked to -1 so argmax never picks padding.
    ious = box_utils.iou(anchors[None], gt_boxes)  # (N, A, M)
    valid = jnp.arange(m)[None, None, :] < num_boxes[:, None, None]  # (N, 1->A, M)
    ious = jnp.where(valid, ious, -1.0)

    best_gt = jnp.argmax(ious, axis=-1).astype(jnp.int32)  # (N, A)
    best_iou = jnp.max(ious, axis=-1)                      # (N, A)

    matches = jnp.where(best_iou >= cfg.matching_threshold, best_gt, NEGATIVE_MATCH)
    matches = jnp.where(
        (best_iou >= cfg.negative_threshold) & (best_iou < cfg.matching_threshold),
        IGNORE_MATCH,
        matches,
    )

    if cfg.force_match_for_each_gt:
        # Each (valid) gt claims its best anchor, overriding band decisions.
        # Tie-break deterministically toward the lower anchor index (argmax).
        best_anchor = jnp.argmax(ious, axis=1).astype(jnp.int32)  # (N, M)
        gt_valid = jnp.arange(m)[None, :] < num_boxes[:, None]    # (N, M)
        # Build a forced-match map via scatter: forced[n, best_anchor[n, j]] = j.
        # Later gt indices win collisions (matches scatter's last-write order);
        # any choice is fine — collisions mean two gts share a best anchor.
        forced = jnp.full((n, a), NEGATIVE_MATCH, dtype=jnp.int32)
        gt_idx = jnp.arange(m, dtype=jnp.int32)[None, :].repeat(n, axis=0)
        scatter_idx = jnp.where(gt_valid, best_anchor, a)  # invalid -> OOB drop
        forced = forced.at[jnp.arange(n)[:, None], scatter_idx].set(
            gt_idx, mode="drop"
        )
        matches = jnp.where(forced >= 0, forced, matches)

    return matches
