"""Batched class-wise non-max suppression — jnp reference implementation.

TPU-native counterpart of the reference's ``src/utils/nms.py`` (SURVEY.md §2
"NMS / postprocess" row). The reference serializes over the batch with
``tf.map_fn`` and calls TF's C++ CPU NMS kernel per class; here the whole
``(batch, class)`` plane is processed at once on-device with static shapes:

  1. score-threshold + per-class top-k (``pre_nms_top_k``) via one sort;
  2. greedy suppression as a ``fori_loop`` over the sorted candidates,
     vectorized across ``(N, C)`` — each step suppresses against one pivot
     box, so memory stays ``O(N*C*K)`` (no ``K x K`` matrix materialized);
  3. merge classes: global top-``max_boxes`` over ``C*K`` survivors, padded.

This is the correctness oracle and CPU path; ``nms_pallas.py`` implements the
same contract as an on-chip Pallas kernel (per-(image, class) grid program
with the ``K x K`` IoU tile living in VMEM).

Output contract (reference parity): ``{boxes (N, max_boxes, 4),
scores (N, max_boxes), labels (N, max_boxes), num_boxes (N,)}`` with
zero-padding past ``num_boxes`` — already static-shape, as the reference's
own padded outputs are.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops import box_utils


class Detections(NamedTuple):
    boxes: jnp.ndarray      # (N, max_boxes, 4)
    scores: jnp.ndarray     # (N, max_boxes)
    labels: jnp.ndarray     # (N, max_boxes) int32, -1 past num_boxes
    num_boxes: jnp.ndarray  # (N,) int32


def greedy_suppression_mask(
    boxes: jnp.ndarray,    # (..., K, 4) sorted by descending score
    valid: jnp.ndarray,    # (..., K) bool — candidate passes score threshold
    iou_threshold: float,
    metric: str = "iou",
) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted candidates.

    Sequential in K (greedy NMS is inherently order-dependent) but fully
    vectorized over all leading dims: step ``i`` computes IoU of pivot ``i``
    against all K candidates in one broadcast, so the loop does K steps of
    O(...*K) work with no K x K buffer.

    ``metric`` selects the overlap measure: ``"iou"`` (standard) or
    ``"ios"`` (intersection-over-smaller — suppresses contained fragments,
    used by the tiled-inference merge).
    """
    k = boxes.shape[-2]
    overlap_fn = {"iou": box_utils.iou, "ios": box_utils.ios}[metric]

    def body(i, keep):
        pivot = jax.lax.dynamic_slice_in_dim(boxes, i, 1, axis=-2)  # (..., 1, 4)
        pivot_kept = jnp.squeeze(
            jax.lax.dynamic_slice_in_dim(keep, i, 1, axis=-1), axis=-1
        )  # (...,)
        ious = jnp.squeeze(
            overlap_fn(pivot, boxes), axis=-2
        )  # (..., K)
        later = jnp.arange(k) > i  # (K,)
        suppress = (
            (ious > iou_threshold) & later & pivot_kept[..., None]
        )
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)


def soft_suppression_scores(
    boxes: jnp.ndarray,    # (..., K, 4)
    scores: jnp.ndarray,   # (..., K) — invalid candidates at -1
    cfg: NMSConfig,
) -> jnp.ndarray:
    """Soft-NMS (Bodla et al. 2017) score decay, vectorized over (N, C).

    Instead of removing a box that overlaps a higher-scored pivot, its
    score decays by ``f(IoU)`` — linear (``1 - iou`` past the overlap
    threshold) or gaussian (``exp(-iou^2 / sigma)``). Because decayed
    scores can reorder, each of the K steps re-argmaxes the unprocessed
    candidates (the classic formulation), which keeps the loop state at
    O(...*K) like :func:`greedy_suppression_mask`. Returns the decayed
    scores with everything under ``score_threshold`` set to -1, ready
    for the standard class-merge.
    """
    k = boxes.shape[-2]
    gaussian = cfg.method == "soft_gaussian"
    lane = jnp.arange(k)

    def body(_, carry):
        s, processed = carry
        masked = jnp.where(processed, -jnp.inf, s)
        pivot_idx = jnp.argmax(masked, axis=-1)               # (...,)
        pivot_score = jnp.take_along_axis(
            s, pivot_idx[..., None], axis=-1)[..., 0]
        pivot_box = jnp.take_along_axis(
            boxes, pivot_idx[..., None, None], axis=-2)       # (..., 1, 4)
        ious = jnp.squeeze(box_utils.iou(pivot_box, boxes), axis=-2)
        if gaussian:
            decay = jnp.exp(-(ious * ious) / cfg.soft_sigma)
        else:
            decay = jnp.where(ious > cfg.iou_threshold, 1.0 - ious, 1.0)
        is_pivot = lane == pivot_idx[..., None]
        active = (pivot_score > 0.0)[..., None]
        untouched = processed | is_pivot | ~active
        s = jnp.where(untouched, s, s * decay)
        return s, processed | is_pivot

    s, _ = jax.lax.fori_loop(
        0, k, body, (scores, jnp.zeros(scores.shape, bool)))
    return jnp.where(s >= cfg.score_threshold, s, -1.0)


def batched_nms(
    boxes: jnp.ndarray,     # (N, A, 4) decoded, clipped
    scores: jnp.ndarray,    # (N, A, C) post-sigmoid probabilities
    cfg: NMSConfig,
) -> Detections:
    """Class-wise NMS over the whole batch, static shapes throughout."""
    n, a, c = scores.shape
    k = min(cfg.pre_nms_top_k, a)

    # --- per-class top-k ---------------------------------------------------
    scores_t = jnp.swapaxes(scores, 1, 2)  # (N, C, A)
    scores_t = jnp.where(scores_t >= cfg.score_threshold, scores_t, -1.0)
    top_scores, top_idx = jax.lax.top_k(scores_t, k)  # (N, C, K)
    top_boxes = jnp.take_along_axis(
        boxes[:, None], top_idx[..., None], axis=2
    )  # (N, C, K, 4)

    valid = top_scores > 0.0
    if cfg.method != "hard":
        kept = soft_suppression_scores(
            top_boxes, jnp.where(valid, top_scores, -1.0), cfg)
        return merge_classes(top_boxes, kept, cfg)
    keep = greedy_suppression_mask(top_boxes, valid, cfg.iou_threshold)

    return merge_classes(top_boxes, jnp.where(keep, top_scores, -1.0), cfg)


def merge_classes(
    top_boxes: jnp.ndarray,   # (N, C, K, 4)
    kept_scores: jnp.ndarray, # (N, C, K) — suppressed/invalid set to -1
    cfg: NMSConfig,
) -> Detections:
    """Flatten per-class survivors and keep the global top-``max_boxes``."""
    n, c, k, _ = top_boxes.shape
    flat_boxes = top_boxes.reshape(n, c * k, 4)
    return _merge_flat(
        lambda final_idx: jnp.take_along_axis(
            flat_boxes, final_idx[..., None], axis=1),
        kept_scores, cfg)


def merge_classes_lazy(
    cand_boxes: jnp.ndarray,  # (N, Q, 4) shared candidate boxes
    top_idx: jnp.ndarray,     # (N, C, K) int candidate index per class slot
    kept_scores: jnp.ndarray, # (N, C, K) — suppressed/invalid set to -1
    cfg: NMSConfig,
) -> Detections:
    """:func:`merge_classes` without materialized per-class boxes.

    The per-class (N, C, K, 4) box gather is the single most expensive
    postprocess op on TPU (~1.9 ms/batch at b32/80c/K=128 — scattered
    4-wide rows). Only the final ``max_boxes`` winners ever need their
    coordinates, so gather those: compose ``final_idx -> top_idx ->
    cand_boxes`` (two tiny gathers of ~100 rows/image)."""
    n, c, k = kept_scores.shape

    def gather_boxes(final_idx):  # (N, m) into the flattened (C*K) plane
        flat_cand = jnp.take_along_axis(
            top_idx.reshape(n, c * k), final_idx, axis=1)  # (N, m)
        return jnp.take_along_axis(
            cand_boxes, flat_cand[..., None], axis=1)  # (N, m, 4)

    return _merge_flat(gather_boxes, kept_scores, cfg)


def _merge_flat(gather_boxes, kept_scores, cfg: NMSConfig) -> Detections:
    n, c, k = kept_scores.shape
    flat_scores = kept_scores.reshape(n, c * k)
    flat_labels = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[None, :, None], (n, c, k)
    ).reshape(n, c * k)

    m = min(cfg.max_boxes, c * k)
    final_scores, final_idx = jax.lax.top_k(flat_scores, m)  # (N, m)
    final_boxes = gather_boxes(final_idx)
    final_labels = jnp.take_along_axis(flat_labels, final_idx, axis=1)

    is_det = final_scores > 0.0
    num = jnp.sum(is_det, axis=1).astype(jnp.int32)

    final_boxes = jnp.where(is_det[..., None], final_boxes, 0.0)
    final_scores = jnp.where(is_det, final_scores, 0.0)
    final_labels = jnp.where(is_det, final_labels, -1)

    if m < cfg.max_boxes:  # pad up to the contract size
        pad = cfg.max_boxes - m
        final_boxes = jnp.pad(final_boxes, ((0, 0), (0, pad), (0, 0)))
        final_scores = jnp.pad(final_scores, ((0, 0), (0, pad)))
        final_labels = jnp.pad(
            final_labels, ((0, 0), (0, pad)), constant_values=-1
        )

    return Detections(final_boxes, final_scores, final_labels, num)
