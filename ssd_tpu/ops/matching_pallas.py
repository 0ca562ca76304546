"""Single-pass anchor matching as a Pallas TPU kernel.

The jnp matcher (``ops/matching.py``) needs two reductions over the
``(N, A, M)`` IoU tensor — per-anchor argmax over gts AND per-gt argmax
over anchors. At b32/640 that tensor is ~1 GB in f32, so XLA (correctly)
refuses to materialize it and instead RECOMPUTES the IoU inside each
reduction fusion: ~4.4 ms/step of VPU time in the round-3 training trace.

This kernel computes each IoU tile ONCE and feeds both argmaxes in the
same pass. Layout is chosen so every *large* output is lane-aligned
(the first kernel iteration put anchors in sublanes and emitted
``(N, A, 1)`` columns — the trailing 1 tiled to 128 lanes, and the
~1.3 GB of phantom HBM traffic in the kernel and every downstream
fusion made the train step 2x SLOWER; see BENCHMARKS.md round 3):

  * grid ``(N, A/BLK)``; each program holds an ``(M_pad, BLK)`` IoU tile
    in VMEM — gts along sublanes (``M_pad`` = gt capacity rounded to 8),
    ANCHORS ALONG LANES (coordinates arrive coordinate-major as
    ``(4, A_pad)`` rows, so anchor loads are dense lane vectors);
  * per-anchor best gt: sublane max + first-max index via the
    min-over-iota trick (matches ``jnp.argmax`` first-occurrence
    tie-breaking), emitted as a dense ``(1, BLK)`` row — the ``(N, A)``
    outputs are exactly row-major, zero padding;
  * per-gt best anchor: running ``(M_pad, 1)`` max/argmax accumulated in
    VMEM scratch across the A-blocks of one image (strict ``>`` update in
    increasing block order preserves first-occurrence semantics), written
    on the image's last block — tiny ``(N, M_pad)`` output;
  * padded gt sublanes are masked to ``-1.0`` exactly like the jnp
    matcher, padded anchor lanes to ``-inf`` so they can never claim a gt.

Outputs feed the same thresholding + forced-match scatter as the jnp
matcher (kept in jnp — tiny), so :func:`match_anchors_pallas` is a
drop-in for :func:`ssd_tpu.ops.matching.match_anchors`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tpu.config import MatcherConfig
from ssd_tpu.constants import EPSILON, IGNORE_MATCH, NEGATIVE_MATCH

LANE = 128
SUBLANE = 8
# Anchors per grid program (lane dimension of the IoU tile). The
# (M_pad, BLK) f32 tile plus a handful of same-shape temporaries stays
# well under VMEM for M_pad <= 128 at BLK = 2048 (~1 MB each).
BLK = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _match_kernel(nb_ref, anc_ref, g_ref, bg_ref, bi_ref, ba_ref,
                  acc_iou, acc_idx, *, blk: int, m_pad: int, a: int,
                  n_blocks: int):
    j = pl.program_id(1)

    # anchor coordinates: (1, BLK) dense lane rows for this block.
    ay0 = anc_ref[0:1, :]
    ax0 = anc_ref[1:2, :]
    ay1 = anc_ref[2:3, :]
    ax1 = anc_ref[3:4, :]

    # gt coordinates: (M_pad, 1) sublane columns for this image.
    g = g_ref[0]                      # (M_pad, 4)
    gy0 = g[:, 0:1]
    gx0 = g[:, 1:2]
    gy1 = g[:, 2:3]
    gx1 = g[:, 3:4]

    # IoU tile (m_pad, blk): gts in sublanes, anchors in lanes. Same
    # expression tree as box_utils.iou (area/intersection clamps, EPSILON
    # union guard) so results agree with the jnp matcher.
    ih = jnp.maximum(jnp.minimum(ay1, gy1) - jnp.maximum(ay0, gy0), 0.0)
    iw = jnp.maximum(jnp.minimum(ax1, gx1) - jnp.maximum(ax0, gx0), 0.0)
    inter = ih * iw
    a_area = jnp.maximum(ay1 - ay0, 0.0) * jnp.maximum(ax1 - ax0, 0.0)
    g_area = jnp.maximum(gy1 - gy0, 0.0) * jnp.maximum(gx1 - gx0, 0.0)
    iou = inter / jnp.maximum(a_area + g_area - inter, EPSILON)

    # padded/invalid gt sublanes -> -1.0 (the jnp matcher's fill value)
    nb = nb_ref[pl.program_id(0)]
    sub = jax.lax.broadcasted_iota(jnp.int32, (m_pad, blk), 0)
    iou = jnp.where(sub < nb, iou, -1.0)

    # per-anchor best gt (first occurrence of the max, like jnp.argmax)
    best_iou = jnp.max(iou, axis=0, keepdims=True)                 # (1, blk)
    first = jnp.min(jnp.where(iou == best_iou, sub, m_pad),
                    axis=0, keepdims=True)
    bg_ref[0] = first.astype(jnp.int32)
    bi_ref[0] = best_iou

    # per-gt running best anchor; padded anchor lanes can never win
    lane = jax.lax.broadcasted_iota(jnp.int32, (m_pad, blk), 1)
    col_valid = (lane + j * blk) < a
    iou_cols = jnp.where(col_valid, iou, -jnp.inf)
    blk_max = jnp.max(iou_cols, axis=1, keepdims=True)             # (m_pad, 1)
    blk_arg = jnp.min(jnp.where(iou_cols == blk_max, lane, blk),
                      axis=1, keepdims=True) + j * blk

    @pl.when(j == 0)
    def _init():
        acc_iou[...] = jnp.full_like(acc_iou, -jnp.inf)
        acc_idx[...] = jnp.zeros_like(acc_idx)

    upd = blk_max > acc_iou[...]
    acc_iou[...] = jnp.where(upd, blk_max, acc_iou[...])
    acc_idx[...] = jnp.where(upd, blk_arg.astype(jnp.int32), acc_idx[...])

    @pl.when(j == n_blocks - 1)
    def _emit():
        ba_ref[0] = acc_idx[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _match_core(anchors, gt_boxes, num_boxes, interpret=False):
    n, m = gt_boxes.shape[0], gt_boxes.shape[1]
    a = anchors.shape[0]
    m_pad = _round_up(max(m, 1), SUBLANE)
    a_pad = _round_up(a, BLK)
    n_blocks = a_pad // BLK

    # anchors coordinate-major: (4, A_pad) dense lane rows
    anc = jnp.pad(anchors.astype(jnp.float32), ((0, a_pad - a), (0, 0))).T
    # gts kept box-major per image: (N, M_pad, 4) sublane columns
    g = jnp.pad(gt_boxes.astype(jnp.float32),
                ((0, 0), (0, m_pad - m), (0, 0)))
    nb = num_boxes.astype(jnp.int32)  # (N,) — rides in SMEM

    grid = (n, n_blocks)
    kernel = functools.partial(_match_kernel, blk=BLK, m_pad=m_pad, a=a,
                               n_blocks=n_blocks)
    best_gt, best_iou, best_anchor = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # num_boxes
            pl.BlockSpec((4, BLK), lambda i, j: (0, j)),         # anchors
            pl.BlockSpec((1, m_pad, 4), lambda i, j: (i, 0, 0)),  # gts
        ],
        out_specs=[
            # Mosaic requires the block's last-two dims to divide (8, 128)
            # or equal the array dims; an explicit singleton sublane dim
            # makes the (1, BLK) row block legal for any batch size.
            pl.BlockSpec((1, 1, BLK), lambda i, j: (i, 0, j)),   # best_gt
            pl.BlockSpec((1, 1, BLK), lambda i, j: (i, 0, j)),   # best_iou
            pl.BlockSpec((1, m_pad, 1), lambda i, j: (i, 0, 0)),  # best_anchor
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, a_pad), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, m_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, 1), jnp.float32),
            pltpu.VMEM((m_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(nb, anc, g)

    return (best_gt[:, 0, :a], best_iou[:, 0, :a], best_anchor[:, :m, 0])


def match_anchors_pallas(
    anchors: jnp.ndarray,       # (A, 4)
    gt_boxes: jnp.ndarray,      # (N, M, 4) padded
    num_boxes: jnp.ndarray,     # (N,) int32
    cfg: MatcherConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`ssd_tpu.ops.matching.match_anchors` on TPU."""
    n, m = gt_boxes.shape[0], gt_boxes.shape[1]
    a = anchors.shape[0]

    best_gt, best_iou, best_anchor = _match_core(
        anchors, gt_boxes, num_boxes, interpret=interpret)

    matches = jnp.where(best_iou >= cfg.matching_threshold,
                        best_gt, NEGATIVE_MATCH)
    matches = jnp.where(
        (best_iou >= cfg.negative_threshold)
        & (best_iou < cfg.matching_threshold),
        IGNORE_MATCH,
        matches,
    )

    if cfg.force_match_for_each_gt:
        gt_valid = jnp.arange(m)[None, :] < num_boxes[:, None]    # (N, M)
        forced = jnp.full((n, a), NEGATIVE_MATCH, dtype=jnp.int32)
        gt_idx = jnp.arange(m, dtype=jnp.int32)[None, :].repeat(n, axis=0)
        scatter_idx = jnp.where(gt_valid, best_anchor, a)
        forced = forced.at[jnp.arange(n)[:, None], scatter_idx].set(
            gt_idx, mode="drop"
        )
        matches = jnp.where(forced >= 0, forced, matches)

    return matches
