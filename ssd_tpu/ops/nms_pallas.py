"""On-chip class-wise NMS as a Pallas TPU kernel.

This is the framework's flagship native kernel (SURVEY.md §2 "Native-code
obligations" #1): the reference calls TF's C++ ``non_max_suppression`` on
CPU, per class, inside a per-image ``tf.map_fn`` — serializing the batch and
bouncing boxes off-chip. Here suppression never leaves the TPU, and it is
batch- AND class-parallel:

  * jnp pre-stage: per-class top-K over the (already pre-selected, see
    ops/postprocess.py) candidates — one cheap sort over Q ~= 1024;
  * Pallas kernel, grid = ceil(batch * classes / block): each program
    processes up to BLOCK=32 independent (image, class) problems
    SIMULTANEOUSLY (shrunk adaptively so the (B, K, K) IoU scratch fits
    VMEM) — the greedy scan's per-pivot vector op then runs on native
    (sublane, lane) VPU tiles instead of a ``(1, K)`` sliver, cutting the
    sequential-iteration total by the block factor. Per block it computes
    the ``(B, K, K)`` IoU tensor with broadcast math in VMEM, then scans K
    pivots; dynamic lane indexing (unsupported by Mosaic) is replaced by
    one-hot reductions; all-empty blocks exit early (problems are sorted
    by activity so the empty tail clusters);
  * jnp post-stage: merge classes via global top-``max_boxes`` — LAZILY:
    only the final winners' boxes are ever gathered
    (:func:`ssd_tpu.ops.nms.merge_classes_lazy`).

**Boxes never materialize per class.** The v1 kernel let XLA gather
``(N, C, K, 4)`` per-class boxes on the host side of the call — measured
at ~1.9 ms/batch (b32/80c/K=128), the single most expensive postprocess
op: 327k scattered 4-wide rows. v2 instead ships the SHARED candidate
boxes once, coordinate-major ``(N, 8, Qp)`` (~1 MB in VMEM for the whole
batch), and each grid program selects its problems' boxes in-VMEM with a
one-hot MXU matmul against its image's slice (dynamic leading-dim slice;
the per-class index list rides in as a normal VMEM operand).

Results match ``ops.nms.batched_nms`` exactly on tie-free scores (tests);
ties may break differently than the numpy oracle within float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops.nms import Detections, merge_classes_lazy

LANE = 128
# (image, class) problems per grid program. 32 won the on-chip sweep
# (2560 problems, K=128: block 8 -> 5.8ms, 16 -> 7.9ms, 32 -> 3.0ms;
# 128 exceeds the 16MB VMEM budget via the (B, K, K) IoU scratch).
BLOCK = 32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_block(k: int) -> int:
    """Largest problem-block that fits the VMEM scratch budget.

    Mosaic requires the sublane dim of every block to be a multiple of 8
    (or the full array dim), so the result is always 8-aligned. The kernel
    holds ~3 (B, K, K) f32 tensors live at the IoU step (the scratch plus
    the ``inter``/``union`` temporaries on the kernel stack — measured:
    block 8 at K=512 compiles to a 24MB scoped allocation, 3x the scratch
    alone), so the budget models 3 copies against ~10MB of the 16MB VMEM.
    Returns 0 when even block 8 does not fit — callers take the exact jnp
    path (K > ~256 only arises in accuracy-sweep configs, never the
    shipped defaults).
    """
    budget = 10 * 1024 * 1024
    return min(BLOCK, (budget // (3 * k * k * 4)) // 8 * 8)


def _nms_kernel(img_ref, idx_ref, scores_ref, boxes_ref, out_ref,
                boxsel_scratch, iou_scratch, keep_scratch,
                *, k: int, qp: int, iou_threshold: float, block: int):
    """BLOCK independent greedy-NMS problems, lock-stepped over K pivots.

    img_ref: (BLOCK, 1) SMEM — image id per problem (post activity sort).
    idx_ref: (BLOCK, K) VMEM int32 — candidate index per class slot.
    scores_ref/out_ref: (BLOCK, 1, K) — descending scores, invalid = -1.
    boxes_ref: (N, 8, Qp) VMEM — ALL images' candidate boxes, rows
        ymin/xmin/ymax/xmax then 4 zero rows (sublane-tile padding).
    boxsel_scratch: (BLOCK, 8, K) f32 — per-problem selected boxes.
    iou_scratch: (BLOCK, K, K) f32; keep_scratch: (BLOCK, K) f32.
    """
    scores = scores_ref[:, 0, :]  # (B, K)
    out_ref[:, 0, :] = jnp.full_like(scores, -1.0)

    # Early exit: at real inference most (image, class) problems have zero
    # above-threshold candidates; skip the select/IoU/scan entirely when
    # the whole block is empty (candidates are score-sorted, so lane 0 of
    # each problem holds its max).
    @pl.when(jnp.max(scores) > 0.0)
    def _process():
        # ---- in-VMEM box select: one-hot MXU matmul per problem --------
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (qp, k), 0)
        for b in range(block):
            img = img_ref[b, 0]
            boxes_img = boxes_ref[pl.ds(img, 1), :, :][0]  # (8, Qp) f32
            onehot = (iota_q == idx_ref[pl.ds(b, 1), :]).astype(jnp.float32)
            sel = jax.lax.dot_general(
                boxes_img, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: DEFAULT truncates the f32 coordinates to bf16
                # on the MXU — measured ~1e-3 IoU error, enough to flip
                # near-threshold suppressions vs the jnp reference.
                precision=jax.lax.Precision.HIGHEST,
            )  # (8, K)
            boxsel_scratch[pl.ds(b, 1), :, :] = sel[None]

        ymin = boxsel_scratch[:, 0:1, :]  # (B, 1, K)
        xmin = boxsel_scratch[:, 1:2, :]
        ymax = boxsel_scratch[:, 2:3, :]
        xmax = boxsel_scratch[:, 3:4, :]

        area = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)

        # Pairwise IoU per problem: (B, K, 1) x (B, 1, K) -> (B, K, K).
        t = lambda v: jnp.swapaxes(v, 1, 2)
        iy0 = jnp.maximum(t(ymin), ymin)
        ix0 = jnp.maximum(t(xmin), xmin)
        iy1 = jnp.minimum(t(ymax), ymax)
        ix1 = jnp.minimum(t(xmax), xmax)
        inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
        union = t(area) + area - inter
        iou_scratch[:] = inter / jnp.maximum(union, 1e-8)

        keep_scratch[:] = (scores > 0.0).astype(jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (block, k), 1)

        def body(i, _):
            row = iou_scratch[:, pl.ds(i, 1), :].reshape(block, k)
            keep = keep_scratch[:]
            # "is pivot i alive?" per problem — dynamic lane indexing is not
            # lowerable on TPU, so reduce through a one-hot (one VPU op).
            pivot_alive = jnp.max(
                jnp.where(col == i, keep, 0.0), axis=1, keepdims=True
            )  # (B, 1)
            suppress = (row > iou_threshold) & (col > i) & (pivot_alive > 0.0)
            keep_scratch[:] = jnp.where(suppress, 0.0, keep)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        out_ref[:, 0, :] = jnp.where(keep_scratch[:] > 0.0, scores, -1.0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret",
                                             "block"))
def _suppress_pallas(img_ids: jnp.ndarray, idx: jnp.ndarray,
                     scores: jnp.ndarray, boxes_t: jnp.ndarray,
                     iou_threshold: float, interpret: bool = False,
                     block: int = BLOCK):
    """img_ids: (G, 1) s32; idx: (G, K) s32; scores: (G, 1, K) sorted desc;
    boxes_t: (N, 8, Qp) f32. -> kept scores (G, 1, K)."""
    g, _, k = scores.shape
    n, _, qp = boxes_t.shape
    assert g % block == 0
    kernel = functools.partial(_nms_kernel, k=k, qp=qp,
                               iou_threshold=iou_threshold, block=block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        grid=(g // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 8, qp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block, 8, k), jnp.float32),
            pltpu.VMEM((block, k, k), jnp.float32),
            pltpu.VMEM((block, k), jnp.float32),
        ],
        interpret=interpret,
    )(img_ids, idx, scores, boxes_t)


def batched_nms_pallas(
    boxes: jnp.ndarray,    # (N, Q, 4) decoded, clipped candidates
    scores: jnp.ndarray,   # (N, Q, C) post-sigmoid
    cfg: NMSConfig,
    interpret: bool = False,
) -> Detections:
    """Drop-in replacement for ``ops.nms.batched_nms`` with the Pallas core."""
    n, q, c = scores.shape
    k_eff = min(cfg.pre_nms_top_k, q)
    k = _round_up(k_eff, LANE)

    scores_t = jnp.swapaxes(scores, 1, 2)  # (N, C, Q)
    scores_t = jnp.where(scores_t >= cfg.score_threshold, scores_t, -1.0)
    if cfg.approx_class_topk and k_eff < q:
        # exact top_k lowers to a full (N*C, Q) key-value sort (~3.8 ms at
        # b64/80c/Q=1026); approx_max_k uses the TPU PartialReduce unit at
        # recall ~0.95 — any dropped candidate is one that was outscored by
        # k_eff others of its own class, so it was a certain NMS casualty
        # or below the final top-100 anyway. CPU lowers approx to exact.
        top_scores, top_idx = jax.lax.approx_max_k(
            scores_t.reshape(n * c, q), k_eff, recall_target=0.95
        )
        top_scores = top_scores.reshape(n, c, k_eff)
        top_idx = top_idx.reshape(n, c, k_eff)
    else:
        top_scores, top_idx = jax.lax.top_k(scores_t, k_eff)  # (N, C, k_eff)

    if k != k_eff:  # pad to lane multiple with invalid candidates
        pad = k - k_eff
        top_scores = jnp.pad(top_scores, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-1.0)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, 0), (0, pad)))
    top_idx = top_idx.astype(jnp.int32)

    # Shared candidate boxes, coordinate-major, whole batch: (N, 8, Qp)
    # f32 (4 coord rows + 4 zero rows for the 8-sublane tile). ~1 MB at
    # b32/Q=1024 — lives in VMEM across the whole grid.
    qp = _round_up(q, LANE)
    boxes_rows = jnp.swapaxes(boxes, 1, 2).astype(jnp.float32)  # (N, 4, Q)
    boxes_t = jnp.pad(boxes_rows, ((0, 0), (0, 4), (0, qp - q)))

    g = n * c
    # Adaptive block: the (B, K, K) IoU scratch (plus pipelining buffers)
    # must fit the ~16MB VMEM budget. 32 measured fastest at K=128; shrink
    # in 8-aligned steps as K grows (Mosaic needs 8-aligned sublane
    # blocks; K=256 at B=32 compiles to a 29MB scoped allocation).
    block = _choose_block(k)
    if block == 0:
        # K too large for the in-VMEM formulation — exact jnp path.
        from ssd_tpu.ops.nms import batched_nms
        return batched_nms(boxes, scores, cfg)
    g_pad = _round_up(g, block)
    idx_in = top_idx.reshape(g, k)
    scores_in = top_scores.reshape(g, 1, k).astype(jnp.float32)
    img_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c)[:, None]  # (G, 1)
    if g_pad != g:
        idx_in = jnp.pad(idx_in, ((0, g_pad - g), (0, 0)))
        scores_in = jnp.pad(scores_in, ((0, g_pad - g), (0, 0), (0, 0)),
                            constant_values=-1.0)
        img_ids = jnp.pad(img_ids, ((0, g_pad - g), (0, 0)))

    # Cluster active problems together so the kernel's empty-block early
    # exit fires for the (typically large) all-empty tail. Scores are
    # sorted descending per problem, so lane 0 is each problem's max.
    activity = scores_in[:, 0, 0]  # (G_pad,)
    order = jnp.argsort(-activity)
    inverse = jnp.argsort(order)
    kept = _suppress_pallas(img_ids[order], idx_in[order], scores_in[order],
                            boxes_t, cfg.iou_threshold, interpret=interpret,
                            block=block)
    kept = kept[inverse][:g].reshape(n, c, k)

    return merge_classes_lazy(boxes, top_idx, kept, cfg)


def batched_nms_pallas_sharded(
    boxes: jnp.ndarray,    # (N, Q, 4)
    scores: jnp.ndarray,   # (N, Q, C)
    cfg: NMSConfig,
    mesh,                  # jax.sharding.Mesh with a data axis
    data_axis: str = "data",
    interpret: bool = False,
) -> Detections:
    """:func:`batched_nms_pallas` under ``shard_map`` over the data axis.

    Under GSPMD (plain ``jit`` with shardings) a Pallas kernel is an
    UNPARTITIONED custom call: every device would run the full-batch NMS on
    replicated inputs (the multi-device hazard MatcherConfig.use_pallas's
    "auto" mode avoids). The kernel is batch-elementwise, so mapping it over
    the data axis keeps DP serving on-kernel: each device suppresses only
    its own batch shard and results concatenate along batch. The per-shard
    batch must be >= 1 (Predictor's bucket rounding guarantees batch %
    data-axis-size == 0).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis)
    fn = functools.partial(batched_nms_pallas, cfg=cfg, interpret=interpret)
    # check_vma=False: pallas_call does not carry varying-mesh-axes
    # metadata; the kernel is batch-elementwise so the per-shard map is
    # trivially correct.
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec, check_vma=False)(boxes, scores)
