"""RetinaNet-style dense anchor generation.

TPU-native counterpart of the reference's ``src/anchor_generator.py``
(SURVEY.md §2 "Anchor generator" row; mount empty at build time). Anchors are
a pure function of ``(image_size, AnchorConfig)``, computed once in numpy at
trace time and baked into the compiled program as a constant ``(A, 4)``
array — there is nothing dynamic to do on-device.

Per FPN level ``l`` with stride ``2**l``: at every cell, anchors of base size
``anchor_scale * stride`` at ``scales_per_octave`` octave scales
(``2**(k / scales_per_octave)``) times each aspect ratio. Anchor order is
(level, row, col, scale*aspect) — the model's head reshape must match this.
"""

from __future__ import annotations

import numpy as np

from ssd_tpu.config import AnchorConfig


def _hw(image_size) -> tuple[int, int]:
    if isinstance(image_size, (int, np.integer)):
        return (int(image_size), int(image_size))
    h, w = image_size
    return (int(h), int(w))


def _level_anchors(feat_h: int, feat_w: int, stride: int,
                   image_hw: tuple[int, int],
                   cfg: AnchorConfig) -> np.ndarray:
    """Anchors for one pyramid level: ``(feat_h * feat_w * K, 4)`` normalized."""
    scales = [2 ** (k / cfg.scales_per_octave) for k in range(cfg.scales_per_octave)]
    base = cfg.anchor_scale * stride

    # (K, 2) anchor (h, w) in pixels; order: scale-major, aspect-minor.
    sizes = []
    for s in scales:
        for ar in cfg.aspect_ratios:
            a = base * s
            sizes.append((a / np.sqrt(ar), a * np.sqrt(ar)))  # (h, w)
    sizes = np.asarray(sizes, dtype=np.float32)  # (K, 2)

    # Cell centers in pixels.
    cy = (np.arange(feat_h, dtype=np.float32) + 0.5) * stride
    cx = (np.arange(feat_w, dtype=np.float32) + 0.5) * stride
    cy, cx = np.meshgrid(cy, cx, indexing="ij")  # (H, W)

    centers = np.stack([cy, cx], axis=-1)[:, :, None, :]  # (H, W, 1, 2)
    half = 0.5 * sizes[None, None, :, :]  # (1, 1, K, 2)

    mins = centers - half  # (H, W, K, 2) -> (ymin, xmin)
    maxs = centers + half  # (H, W, K, 2) -> (ymax, xmax)
    boxes = np.concatenate([mins, maxs], axis=-1).reshape(-1, 4)
    ih, iw = image_hw
    # normalize per axis (y by height, x by width)
    return boxes / np.asarray([ih, iw, ih, iw], np.float32)


def generate_anchors(image_size, cfg: AnchorConfig) -> np.ndarray:
    """All anchors for all FPN levels, concatenated: ``(A, 4)`` float32.

    ``image_size`` is a square int or a (height, width) pair. Coordinates
    are normalized ``(ymin, xmin, ymax, xmax)``; anchors at image borders
    deliberately extend outside ``[0, 1]`` (RetinaNet convention — they
    are not clipped, matching predictions are clipped after decode).
    """
    ih, iw = _hw(image_size)
    out = []
    for level in range(cfg.min_level, cfg.max_level + 1):
        stride = 2 ** level
        fh, fw = -(-ih // stride), -(-iw // stride)  # ceil
        out.append(_level_anchors(fh, fw, stride, (ih, iw), cfg))
    return np.concatenate(out, axis=0)


def anchor_counts_per_level(image_size, cfg: AnchorConfig) -> tuple[int, ...]:
    """Number of anchors contributed by each level (for reshape bookkeeping)."""
    ih, iw = _hw(image_size)
    counts = []
    for level in range(cfg.min_level, cfg.max_level + 1):
        stride = 2 ** level
        fh, fw = -(-ih // stride), -(-iw // stride)
        counts.append(fh * fw * cfg.num_anchors_per_cell)
    return tuple(counts)
