"""Box geometry: areas, IoU, Faster-RCNN encode/decode, clipping.

TPU-native counterpart of the reference's ``src/utils/box_utils.py``
(SURVEY.md §2; the reference mount was empty, so behavior follows the
standard SSD/RetinaNet recipe the reference implements). Everything here is
pure ``jnp`` broadcast math — fully batched, no per-image loops — so XLA can
fuse it and vmap/pjit compose trivially.

Coordinate convention: boxes are ``(..., 4)`` arrays of
``(ymin, xmin, ymax, xmax)``, normalized to ``[0, 1]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssd_tpu.constants import EPSILON, SCALE_FACTORS


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas. ``(..., 4) -> (...)``. Degenerate boxes get area 0."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = jnp.maximum(ymax - ymin, 0.0)
    w = jnp.maximum(xmax - xmin, 0.0)
    return jnp.squeeze(h * w, axis=-1)


def intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas.

    Args:
      boxes1: ``(..., N, 4)``.
      boxes2: ``(..., M, 4)``.

    Returns:
      ``(..., N, M)`` intersection areas.
    """
    ymin1, xmin1, ymax1, xmax1 = jnp.split(boxes1, 4, axis=-1)  # (..., N, 1)
    ymin2, xmin2, ymax2, xmax2 = jnp.split(boxes2, 4, axis=-1)  # (..., M, 1)

    # Broadcast (..., N, 1) against (..., 1, M).
    t = jnp.swapaxes  # alias
    inter_ymin = jnp.maximum(ymin1, t(ymin2, -1, -2))
    inter_xmin = jnp.maximum(xmin1, t(xmin2, -1, -2))
    inter_ymax = jnp.minimum(ymax1, t(ymax2, -1, -2))
    inter_xmax = jnp.minimum(xmax1, t(xmax2, -1, -2))

    h = jnp.maximum(inter_ymax - inter_ymin, 0.0)
    w = jnp.maximum(inter_xmax - inter_xmin, 0.0)
    return h * w


def iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection-over-union.

    Args:
      boxes1: ``(..., N, 4)``.
      boxes2: ``(..., M, 4)``.

    Returns:
      ``(..., N, M)`` IoU in ``[0, 1]``.
    """
    inter = intersection(boxes1, boxes2)
    area1 = area(boxes1)[..., :, None]
    area2 = area(boxes2)[..., None, :]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, EPSILON)


def ios(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection-over-smaller-area (a.k.a. overlap coefficient).

    ``(..., N, 4) x (..., M, 4) -> (..., N, M)`` in ``[0, 1]``. A box fully
    contained in another scores 1.0 regardless of the size ratio — the
    right merge metric when one detection may be a clipped fragment of
    another (tiled inference)."""
    inter = intersection(boxes1, boxes2)
    area1 = area(boxes1)[..., :, None]
    area2 = area(boxes2)[..., None, :]
    return inter / jnp.maximum(jnp.minimum(area1, area2), EPSILON)


def to_center_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """``(ymin, xmin, ymax, xmax) -> (cy, cx, h, w)``."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    cy = ymin + 0.5 * h
    cx = xmin + 0.5 * w
    return jnp.concatenate([cy, cx, h, w], axis=-1)


def to_corner_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """``(cy, cx, h, w) -> (ymin, xmin, ymax, xmax)``."""
    cy, cx, h, w = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1
    )


def encode(boxes: jnp.ndarray, anchors: jnp.ndarray,
           scale_factors=SCALE_FACTORS) -> jnp.ndarray:
    """Faster-RCNN box encoding: ground-truth boxes -> regression targets.

    ``t_y = (cy - cy_a) / h_a * s_y``, ``t_h = log(h / h_a) * s_h`` (same for x/w).

    Args:
      boxes: ``(..., 4)`` corner-form boxes.
      anchors: ``(..., 4)`` corner-form anchors (broadcastable to ``boxes``).

    Returns:
      ``(..., 4)`` codes ``(ty, tx, th, tw)``.
    """
    cy, cx, h, w = jnp.split(to_center_form(boxes), 4, axis=-1)
    cya, cxa, ha, wa = jnp.split(to_center_form(anchors), 4, axis=-1)

    ha = jnp.maximum(ha, EPSILON)
    wa = jnp.maximum(wa, EPSILON)
    h = jnp.maximum(h, EPSILON)
    w = jnp.maximum(w, EPSILON)

    sy, sx, sh, sw = scale_factors
    ty = (cy - cya) / ha * sy
    tx = (cx - cxa) / wa * sx
    th = jnp.log(h / ha) * sh
    tw = jnp.log(w / wa) * sw
    return jnp.concatenate([ty, tx, th, tw], axis=-1)


def decode(codes: jnp.ndarray, anchors: jnp.ndarray,
           scale_factors=SCALE_FACTORS) -> jnp.ndarray:
    """Inverse of :func:`encode`: regression codes -> corner-form boxes."""
    ty, tx, th, tw = jnp.split(codes, 4, axis=-1)
    cya, cxa, ha, wa = jnp.split(to_center_form(anchors), 4, axis=-1)

    sy, sx, sh, sw = scale_factors
    # Clamp the size terms so exp() can't overflow for garbage logits.
    th = jnp.minimum(th / sh, 10.0)
    tw = jnp.minimum(tw / sw, 10.0)
    cy = ty / sy * ha + cya
    cx = tx / sx * wa + cxa
    h = jnp.exp(th) * ha
    w = jnp.exp(tw) * wa
    return jnp.concatenate(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, window=(0.0, 0.0, 1.0, 1.0)) -> jnp.ndarray:
    """Clip corner-form boxes to a window (default: the unit square)."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    wy0, wx0, wy1, wx1 = window
    ymin = jnp.clip(ymin, wy0, wy1)
    xmin = jnp.clip(xmin, wx0, wx1)
    ymax = jnp.clip(ymax, wy0, wy1)
    xmax = jnp.clip(xmax, wx0, wx1)
    return jnp.concatenate([ymin, xmin, ymax, xmax], axis=-1)


def flip_boxes_horizontally(boxes: jnp.ndarray) -> jnp.ndarray:
    """Mirror boxes across the vertical axis (for hflip augmentation)."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([ymin, 1.0 - xmax, ymax, 1.0 - xmin], axis=-1)
