"""Tiled inference: native-resolution detection on arbitrarily large images.

The reference (SURVEY.md §5 long-context row) scales resolution only by
recompiling at a bigger ``image_size`` — past single-chip HBM there is no
story, and small objects drown when a huge image is squeezed to 640px.
This module is the framework's third resolution axis (alongside per-
resolution compile caching and spatial sharding): slice the image into
model-resolution tiles with overlap, run ALL tiles as ONE batched device
call (the TPU-shaped move — a 4K image becomes a batch-24 predict at the
flagship resolution, hitting the same compiled program serving uses), map
detections back to global coordinates, and fuse duplicates from
overlapping tiles with a jitted global class-wise NMS.

An optional full-image pass (the image resized to model resolution)
catches objects larger than a tile; its detections enter the same merge.

TPU notes: tile counts vary with image size, but the tile batch rides
``Predictor``'s pow2 bucketing (one compile per bucket, shared with
normal serving) and the merge NMS is jitted per padded candidate count —
static shapes everywhere. The merge reuses
:func:`ssd_tpu.ops.nms.greedy_suppression_mask` with label-offset boxes
(boxes live in [0, 1]; shifting each class by ``label * 2`` makes
cross-class IoU exactly zero, so one flat suppression pass is class-wise).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.ops.nms import greedy_suppression_mask


def tile_origins(dim: int, tile: int, overlap: float) -> list[int]:
    """Top/left origins covering ``dim`` with ``tile``-sized windows and at
    least ``overlap`` fractional overlap between neighbours. The last
    window is clamped flush to the edge so coverage is exact."""
    if dim <= tile:
        return [0]
    stride = max(1, int(round(tile * (1.0 - overlap))))
    origins = list(range(0, dim - tile + 1, stride))
    if origins[-1] + tile < dim:
        origins.append(dim - tile)
    return origins


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """The tile layout for one (image, tile, overlap) combination."""

    image_hw: tuple[int, int]
    tile_hw: tuple[int, int]
    origins: tuple[tuple[int, int], ...]  # (y0, x0) per tile, pixels

    @classmethod
    def build(cls, image_hw, tile_hw, overlap: float) -> "TileGrid":
        ys = tile_origins(image_hw[0], tile_hw[0], overlap)
        xs = tile_origins(image_hw[1], tile_hw[1], overlap)
        return cls(tuple(image_hw), tuple(tile_hw),
                   tuple((y, x) for y in ys for x in xs))

    def crops(self, image: np.ndarray) -> np.ndarray:
        """(T, th, tw, 3) uint8 tile stack; edge tiles that run past the
        image (image smaller than a tile) are zero-padded."""
        th, tw = self.tile_hw
        out = np.zeros((len(self.origins), th, tw, 3), np.uint8)
        for i, (y0, x0) in enumerate(self.origins):
            crop = image[y0:y0 + th, x0:x0 + tw]
            out[i, :crop.shape[0], :crop.shape[1]] = crop
        return out

    def interior_edge_mask(self, i: int, boxes: np.ndarray,
                           eps_px: float = 2.0) -> np.ndarray:
        """(k,) bool: which tile-normalized boxes of tile ``i`` touch a
        tile border that is INTERIOR to the image (i.e. where the object
        may continue into a neighbouring tile and this box is a clip)."""
        h, w = self.image_hw
        th, tw = self.tile_hw
        y0, x0 = self.origins[i]
        ey, ex = eps_px / th, eps_px / tw
        touches = np.zeros(boxes.shape[0], bool)
        if y0 > 0:
            touches |= boxes[:, 0] < ey
        if x0 > 0:
            touches |= boxes[:, 1] < ex
        if y0 + th < h:
            touches |= boxes[:, 2] > 1.0 - ey
        if x0 + tw < w:
            touches |= boxes[:, 3] > 1.0 - ex
        return touches

    def to_global(self, i: int, boxes: np.ndarray) -> np.ndarray:
        """Map tile-normalized (k, 4) yxyx boxes of tile ``i`` to
        image-normalized global coordinates, clipped to the frame."""
        h, w = self.image_hw
        th, tw = self.tile_hw
        y0, x0 = self.origins[i]
        out = np.empty_like(boxes)
        out[:, 0::2] = (y0 + boxes[:, 0::2] * th) / h
        out[:, 1::2] = (x0 + boxes[:, 1::2] * tw) / w
        return np.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("metric",))
def _merge_nms(boxes, scores, labels, iou_threshold, max_boxes_arr,
               metric: str = "ios"):
    """Global class-wise NMS over the flat candidate set of one image.

    boxes (K, 4) in [0, 1], scores (K,) with invalid slots <= 0,
    labels (K,) int32. ``max_boxes_arr`` is a zeros-(max_boxes,) shape
    carrier so the output size is static per jit cache entry.

    ``metric="ios"`` (intersection-over-smaller) is the tiling default: a
    detection clipped at a tile's interior edge is a FRAGMENT of the same
    object seen whole by a neighbouring tile or the full-image pass; its
    IoU with the whole box can sit well under any sane threshold (a half
    fragment = 0.5) but its IoS is ~1.0, so IoS suppression removes
    exactly the tiling artifacts IoU leaves behind.
    """
    order = jnp.argsort(-scores)
    boxes = jnp.take(boxes, order, axis=0)
    scores = jnp.take(scores, order)
    labels = jnp.take(labels, order)
    valid = scores > 0.0
    # Disjoint per-class lanes: boxes are in [0, 1], so offsetting every
    # class by 2.0 zeroes cross-class overlap in one flat suppression pass.
    offset = jnp.where(valid, labels, 0).astype(boxes.dtype)[:, None] * 2.0
    keep = greedy_suppression_mask(boxes + offset, valid, iou_threshold,
                                   metric=metric)
    kept_scores = jnp.where(keep, scores, -1.0)
    m = max_boxes_arr.shape[0]
    mm = min(m, kept_scores.shape[0])  # candidate set can be < max_boxes
    top_scores, top_idx = jax.lax.top_k(kept_scores, mm)
    final_valid = top_scores > 0.0
    out_boxes = jnp.take(boxes, top_idx, axis=0) * final_valid[:, None]
    out_scores = jnp.where(final_valid, top_scores, 0.0)
    out_labels = jnp.where(final_valid, jnp.take(labels, top_idx), -1)
    if mm < m:
        pad = m - mm
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
    return (out_boxes, out_scores, out_labels,
            jnp.sum(final_valid.astype(jnp.int32)))


class TiledPredictor:
    """``predict(image) -> {boxes, scores, labels, num_boxes}`` (the
    reference contract, image-normalized global coordinates) for images
    far above the model resolution.

    Args:
      predictor: a :class:`ssd_tpu.predictor.Predictor` (its config fixes
        the tile size = model resolution and the NMS thresholds).
      overlap: fractional overlap between neighbouring tiles. Must exceed
        the largest object (relative to a tile) that tiling alone should
        catch whole; duplicates from the overlap are fused by the merge.
      full_image_pass: also run the whole image resized to the model
        resolution, so objects bigger than a tile survive.
      max_boxes: global output size (default: the config's NMS max_boxes).
      merge_metric: ``"ios"`` (default — suppresses tile-clipped fragments
        of an object another pass saw whole) or ``"iou"`` (standard NMS
        semantics).
      edge_penalty: score multiplier for detections whose box touches an
        INTERIOR tile border (the image boundary never counts). Such a
        box is likely a clip of an object continuing into the next tile;
        ranking it down lets the whole-object detection win the greedy
        merge even when the fragment's raw confidence is as high (a
        fragment that fills its tile can be maximally confident). 0.0
        drops edge-touching detections outright — only safe when
        ``overlap`` exceeds the largest object-to-tile ratio, otherwise
        an object straddling a seam can vanish; the default keeps them
        as down-ranked fallbacks.
    """

    def __init__(self, predictor, overlap: float = 0.25,
                 full_image_pass: bool = True, max_boxes: int | None = None,
                 merge_metric: str = "ios", edge_penalty: float = 0.5):
        if not 0.0 <= overlap < 1.0:
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        if merge_metric not in ("ios", "iou"):
            raise ValueError(f"merge_metric must be ios|iou, got {merge_metric}")
        if not 0.0 <= edge_penalty <= 1.0:
            raise ValueError(f"edge_penalty must be in [0, 1], got {edge_penalty}")
        self.predictor = predictor
        self.cfg = predictor.cfg
        self.overlap = overlap
        self.full_image_pass = full_image_pass
        self.max_boxes = int(max_boxes or self.cfg.nms.max_boxes)
        self.merge_metric = merge_metric
        self.edge_penalty = edge_penalty
        self.label_map = getattr(predictor, "label_map", None)

    def grid_for(self, image_hw) -> TileGrid:
        return TileGrid.build(image_hw, self.cfg.image_hw(), self.overlap)

    def predict(self, image) -> dict:
        image = np.asarray(image)
        if image.ndim != 3:
            raise ValueError("TiledPredictor takes one (H, W, 3) image; "
                             "tiles are the batch axis")
        grid = self.grid_for(image.shape[:2])
        tiles = grid.crops(image)
        if self.full_image_pass and len(grid.origins) > 1:
            passes = list(tiles) + [image]  # Predictor resizes the full frame
        else:
            passes = list(tiles)
        out = self.predictor.predict(passes)

        t = len(grid.origins)
        cand_boxes, cand_scores = [], []
        for i in range(t):
            tile_boxes = np.asarray(out["boxes"][i])
            tile_scores = np.asarray(out["scores"][i], np.float32).copy()
            if self.edge_penalty < 1.0:
                clipped = grid.interior_edge_mask(i, tile_boxes)
                tile_scores[clipped] *= self.edge_penalty
            cand_boxes.append(grid.to_global(i, tile_boxes))
            cand_scores.append(tile_scores)
        if len(passes) > t:
            cand_boxes.append(np.asarray(out["boxes"][t]))  # already global
            cand_scores.append(np.asarray(out["scores"][t], np.float32))
        boxes = np.concatenate(cand_boxes, axis=0)
        scores = np.concatenate(cand_scores)
        labels = np.concatenate([out["labels"][i] for i in range(len(passes))])

        # Per-tile outputs are score-padded with zeros past num_boxes;
        # zeroed slots stay invalid through the merge (scores <= 0).
        b, s, l, n = _merge_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(labels, jnp.int32),
            jnp.float32(self.cfg.nms.iou_threshold),
            jnp.zeros((self.max_boxes,), jnp.float32),
            metric=self.merge_metric,
        )
        result = {
            "boxes": np.asarray(b),
            "scores": np.asarray(s),
            "labels": np.asarray(l),
            "num_boxes": int(n),
        }
        if self.label_map is not None:
            result["names"] = np.array([
                self.label_map.get(int(x), str(int(x)))
                for x in result["labels"]
            ])
        return result
