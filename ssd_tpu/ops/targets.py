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

import jax

from ssd_tpu.config import MatcherConfig
from ssd_tpu.ops import box_utils
from ssd_tpu.ops.matching import match_anchors


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


class Targets(NamedTuple):
    reg_targets: jnp.ndarray   # (N, A, 4) encoded box targets (0 where not positive)
    cls_targets: jnp.ndarray   # (N, A, C) one-hot (all-zero for negatives);
    #                            None when created with class_onehot=False
    cls_weights: jnp.ndarray   # (N, A) 1 for positives+negatives, 0 for ignored
    reg_weights: jnp.ndarray   # (N, A) 1 for positives only
    matches: jnp.ndarray       # (N, A) raw match indices
    matched_labels: jnp.ndarray | None = None  # (N, A) f32 class id of the
    #                            matched gt (0 where not positive)


def create_targets(
    anchors: jnp.ndarray,      # (A, 4)
    gt_boxes: jnp.ndarray,     # (N, M, 4) padded
    gt_labels: jnp.ndarray,    # (N, M) int32 in [0, C)
    num_boxes: jnp.ndarray,    # (N,)
    num_classes: int,
    matcher_cfg: MatcherConfig,
    class_onehot: bool = True,
) -> Targets:
    up = getattr(matcher_cfg, "use_pallas", "auto")
    if up == "auto":
        # the kernel is an unpartitioned custom call under GSPMD — only
        # auto-enable where that cannot cost anything (one device)
        use_kernel = _on_tpu() and jax.device_count() == 1
    else:
        use_kernel = bool(up) and _on_tpu()
    if use_kernel:
        # single-pass kernel: IoU computed once for BOTH argmax directions
        # (ops/matching_pallas.py; BENCHMARKS.md round 3 — the transposed
        # kernel beats the jnp matcher's fused recompute by ~2 ms/step on
        # a single chip at b32/640)
        from ssd_tpu.ops.matching_pallas import match_anchors_pallas
        matches = match_anchors_pallas(anchors, gt_boxes, num_boxes,
                                       matcher_cfg)  # (N, A)
    else:
        matches = match_anchors(anchors, gt_boxes, num_boxes,
                                matcher_cfg)  # (N, A)

    positive = matches >= 0
    ignored = matches == -2

    # Matched-gt lookup as a one-hot MATMUL, not a gather: XLA lowers a
    # (N, A)-row gather from the tiny (N, M) gt tables to a scattered
    # row-copy loop (~29 ms/step at b32/640 — the single hottest op in the
    # whole train step), while the equivalent selection matrix contraction
    # runs on the MXU in <2 ms. Exactly one slot is hot per positive
    # anchor, so the f32 contraction is exact.
    m = gt_boxes.shape[1]
    sel = (matches[..., None] == jnp.arange(m)).astype(jnp.float32)
    sel = sel * positive[..., None].astype(jnp.float32)  # (N, A, M)

    matched_boxes = jnp.einsum(
        "nam,nmi->nai", sel, gt_boxes.astype(jnp.float32)
    )  # (N, A, 4); all-zero rows for non-positive anchors (masked below)

    reg_targets = box_utils.encode(matched_boxes, anchors[None])
    reg_targets = jnp.where(positive[..., None], reg_targets, 0.0)

    matched_labels = None
    if class_onehot:
        # one-hot(C) of the matched label = sel @ one-hot(C) of the gt
        # labels — fuses the label gather and the class one-hot into one
        # contraction.
        label_one_hot = _one_hot(gt_labels, num_classes)  # (N, M, C)
        cls_targets = jnp.einsum("nam,nmc->nac", sel, label_one_hot)
    else:
        # The (N, A, C) one-hot is the largest target tensor AND an
        # einsum output whose layout never matches the conv-native logits
        # (forcing ~9 ms/step of f32 relayout copies at b32/640). The
        # per-level loss (losses.detection_loss_levels) instead rebuilds
        # the one-hot INLINE from the matched class id with a broadcast
        # compare that XLA fuses into the focal loop — only the (N, A)
        # label row is produced here (exact: class ids << 2**24 in f32).
        cls_targets = None
        matched_labels = jnp.einsum(
            "nam,nm->na", sel, gt_labels.astype(jnp.float32)
        )

    cls_weights = jnp.where(ignored, 0.0, 1.0)
    reg_weights = positive.astype(jnp.float32)
    return Targets(reg_targets, cls_targets, cls_weights, reg_weights,
                   matches, matched_labels)


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return (labels[..., None] == jnp.arange(num_classes)[None, None, :]).astype(
        jnp.float32
    )
