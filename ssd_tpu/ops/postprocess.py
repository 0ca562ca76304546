"""Detection postprocess: candidate pre-selection + class-wise NMS.

The reference decodes ALL anchors and hands every class to NMS
(SURVEY.md §3.2). On TPU that wastes the postprocess budget: at 640x640
there are ~76k anchors x 80 classes, and sorting/sigmoiding all of them
costs ~100x more than the entire backbone forward. The TPU-native pipeline
exploits sigmoid monotonicity and hardware top-k:

  1. ``max_logit = max_C logits`` — one cheap reduction ``(N, A)``;
  2. score threshold applied IN LOGIT SPACE (sigmoid is monotonic);
  3. top-``num_candidates`` anchors per image via ``jax.lax.approx_max_k``
     (TPU-accelerated; exact fallback available for parity tests);
  4. gather + decode + sigmoid ONLY the Q survivors (75x less work);
  5. class-wise NMS over ``(N, Q, C)`` — Pallas kernel on TPU, jnp
     reference elsewhere — then global top-``max_boxes`` merge.

Recall is unaffected in practice: a detection that is not in the top-1024
anchors by best-class logit cannot enter the final top-100 output except
through pathological cross-class score patterns.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops import box_utils
from ssd_tpu.ops.nms import Detections, batched_nms


def select_candidates(
    logits: jnp.ndarray,    # (N, A, C) raw
    deltas: jnp.ndarray,    # (N, A, 4) raw
    anchors: jnp.ndarray,   # (A, 4)
    cfg: NMSConfig,
    exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-Q candidate selection. Returns (boxes (N,Q,4), scores (N,Q,C))."""
    n, a, c = logits.shape
    q = min(cfg.num_candidates, a)

    # Reduce in the model's native dtype (bf16 halves the HBM read of the
    # largest tensor); only the Q selected candidates are upcast.
    max_logit = jnp.max(logits, axis=-1).astype(jnp.float32)  # (N, A)
    # score_threshold in logit space; sub-threshold anchors sink below any
    # real candidate.
    logit_thr = math.log(cfg.score_threshold / (1.0 - cfg.score_threshold))
    max_logit = jnp.where(max_logit >= logit_thr, max_logit, -jnp.inf)

    if exact:
        _, idx = jax.lax.top_k(max_logit, q)  # (N, Q)
    else:
        _, idx = jax.lax.approx_max_k(max_logit, q, recall_target=0.98)

    cand_logits = jnp.take_along_axis(
        logits, idx[..., None], axis=1
    ).astype(jnp.float32)  # (N, Q, C)
    cand_deltas = jnp.take_along_axis(
        deltas.astype(jnp.float32), idx[..., None], axis=1
    )  # (N, Q, 4)
    cand_anchors = anchors[idx]  # (N, Q, 4)

    boxes = box_utils.clip_boxes(box_utils.decode(cand_deltas, cand_anchors))
    scores = jax.nn.sigmoid(cand_logits)
    return boxes, scores


def select_candidates_pyramid(
    raw_levels: list,        # [(cls (N,H,W,K*C), box (N,H,W,K*4)), ...]
    anchors: jnp.ndarray,    # (A, 4) in the same level-concatenated order
    num_classes: int,
    cfg: NMSConfig,
    exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-Q candidate selection straight from per-level head outputs.

    Equivalent to flatten-then-:func:`select_candidates`, but never
    materializes the ``(N, A, C)`` logits: the max-over-classes runs on each
    level's native ``(N, H, W, K*C)`` layout (a lane-group reduce), and only
    the Q winning rows are gathered per level. At 640x640/80 classes this
    avoids relaying out ~800MB per batch.
    """
    n = raw_levels[0][0].shape[0]
    c = num_classes

    level_max, level_sizes = [], []
    for cls_raw, _ in raw_levels:
        _, h, w, kc = cls_raw.shape
        k = kc // c
        m = jnp.max(cls_raw.reshape(n, h, w, k, c), axis=-1)  # (N,H,W,K)
        level_max.append(m.reshape(n, h * w * k).astype(jnp.float32))
        level_sizes.append(h * w * k)
    max_logit = jnp.concatenate(level_max, axis=1)  # (N, A)

    a = max_logit.shape[1]
    q = min(cfg.num_candidates, a)
    logit_thr = math.log(cfg.score_threshold / (1.0 - cfg.score_threshold))
    max_logit = jnp.where(max_logit >= logit_thr, max_logit, -jnp.inf)
    if exact:
        _, idx = jax.lax.top_k(max_logit, q)
    else:
        _, idx = jax.lax.approx_max_k(max_logit, q, recall_target=0.98)

    # Gather each candidate's (C,) logits and (4,) deltas from its level.
    cand_logits = jnp.zeros((n, q, c), jnp.float32)
    cand_deltas = jnp.zeros((n, q, 4), jnp.float32)
    offset = 0
    for (cls_raw, box_raw), a_l in zip(raw_levels, level_sizes):
        local = idx - offset
        valid = (local >= 0) & (local < a_l)
        safe = jnp.clip(local, 0, a_l - 1)
        lvl_logits = jnp.take_along_axis(
            cls_raw.reshape(n, a_l, c), safe[..., None], axis=1
        ).astype(jnp.float32)
        lvl_deltas = jnp.take_along_axis(
            box_raw.reshape(n, a_l, 4), safe[..., None], axis=1
        ).astype(jnp.float32)
        cand_logits = jnp.where(valid[..., None], lvl_logits, cand_logits)
        cand_deltas = jnp.where(valid[..., None], lvl_deltas, cand_deltas)
        offset += a_l

    cand_anchors = anchors[idx]
    boxes = box_utils.clip_boxes(box_utils.decode(cand_deltas, cand_anchors))
    scores = jax.nn.sigmoid(cand_logits)
    # drop candidates that were below the logit threshold (-inf max)
    picked = jnp.take_along_axis(max_logit, idx, axis=1)
    scores = jnp.where(jnp.isfinite(picked)[..., None], scores, 0.0)
    return boxes, scores


def select_candidates_cells(
    raw_levels: list,        # [(cls (N,H,W,K*C), box (N,H,W,K*4)), ...]
    anchors: jnp.ndarray,    # (A, 4) in the same level-concatenated order
    num_classes: int,
    cfg: NMSConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CELL-major top-Q candidate selection — the layout-native fast path.

    Profiling the flat path at b64/640/80c shows ~15 ms of pure data
    movement: the (N, H, W, K*C) -> (N, A, C) relayout+concat of the class
    maps (~7.5 ms for P3 alone) and ``approx_max_k`` lowering to a FULL SORT
    of (N, 76725) (~4.2 ms). This variant touches the big class maps exactly
    once, in their native conv layout:

      1. per-level per-CELL max over all K*C lanes — a pure lane reduce,
         no relayout, output (N, H*W) is tiny;
      2. exact ``top_k`` over the concatenated (N, cells) maxes (8525 cells
         at 640px — 9x smaller than anchors, so exact beats approximate);
      3. gather the winning cells' FULL (K*C,) lane rows — contiguous
         vectors, the gather XLA is good at — then split K*C -> (K, C) on
         the small (N, Q_cells, K*C) tensor only.

    Selection granularity is cells, not anchors: the top
    ``num_candidates // K`` cells by best-anchor-best-class logit enter NMS
    with ALL their K anchors (>= num_candidates anchors total). An anchor
    is only lost if its entire cell is colder than ``Q_cells`` other cells
    — comparable recall to the flat path's approximate top-k (0.98 target),
    and every surviving anchor still carries its exact scores.
    """
    n = raw_levels[0][0].shape[0]
    c = num_classes
    kc = raw_levels[0][0].shape[-1]
    k = kc // c

    # 1. per-cell max (lane reduce in conv layout; no relayout)
    cell_max, cells_per_level = [], []
    for cls_raw, _ in raw_levels:
        _, h, w, _ = cls_raw.shape
        m = jnp.max(cls_raw, axis=-1)  # (N, H, W)
        cell_max.append(m.reshape(n, h * w).astype(jnp.float32))
        cells_per_level.append(h * w)
    cell_logit = jnp.concatenate(cell_max, axis=1)  # (N, cells)
    total_cells = cell_logit.shape[1]

    logit_thr = math.log(cfg.score_threshold / (1.0 - cfg.score_threshold))
    cell_logit = jnp.where(cell_logit >= logit_thr, cell_logit, -jnp.inf)

    # Two-stage selection: overprovision the cell prefilter, then refine
    # to exact top-num_candidates anchors (see NMSConfig.cell_overprovision
    # — moves the dense-scene recall limit without growing the NMS input).
    over = max(float(getattr(cfg, "cell_overprovision", 1.0)), 1.0)
    q_cells = min(-(-int(cfg.num_candidates * over) // k), total_cells)
    refine = q_cells * k > cfg.num_candidates
    if getattr(cfg, "approx_cell_topk", False) and q_cells < total_cells:
        # PartialReduce instead of the full (N, cells) key-value sort;
        # the refine stage below re-ranks anchors exactly (see
        # NMSConfig.approx_cell_topk for the measured accuracy gate)
        top_logit, cell_idx = jax.lax.approx_max_k(
            cell_logit, q_cells, recall_target=0.99)
    else:
        top_logit, cell_idx = jax.lax.top_k(cell_logit, q_cells)  # (N, Qc)

    # 3. gather whole cells per level (contiguous K*C / K*4 lane rows) as a
    # ONE-HOT MXU matmul per level, accumulated: take_along_axis forces a
    # row-major relayout of the full (N, cells, K*C) class map (~1 ms at
    # b32/640 — the conv emits a batch-interleaved layout), while a
    # batched dot consumes the conv output where it lies and selection by
    # {0,1} matrices is exact in bf16. Invalid (other-level / padding)
    # rows are zeroed in the one-hot, so the accumulation IS the masking.
    cand_cls = jnp.zeros((n, q_cells, kc), jnp.float32)
    cand_box = jnp.zeros((n, q_cells, 4 * k), jnp.float32)
    offset = 0
    for (cls_raw, box_raw), n_cells in zip(raw_levels, cells_per_level):
        local = cell_idx - offset
        valid = (local >= 0) & (local < n_cells)
        onehot = jax.nn.one_hot(
            jnp.where(valid, local, -1), n_cells, dtype=cls_raw.dtype
        )  # (N, Qc, cells); -1 -> all-zero row
        cand_cls = cand_cls + jnp.einsum(
            "nqs,nsk->nqk", onehot, cls_raw.reshape(n, n_cells, kc),
            preferred_element_type=jnp.float32)
        cand_box = cand_box + jnp.einsum(
            "nqs,nsk->nqk", onehot, box_raw.reshape(n, n_cells, 4 * k),
            preferred_element_type=jnp.float32)
        offset += n_cells

    q = q_cells * k
    cand_logits = cand_cls.reshape(n, q, c)
    cand_deltas = cand_box.reshape(n, q, 4)

    # anchors grouped by cell at trace time: (A, 4) -> (cells, K, 4)
    cell_anchors = anchors.reshape(total_cells, k, 4)
    cand_anchors = cell_anchors[cell_idx].reshape(n, q, 4)

    # below-threshold (padding) cells contribute no anchors
    anchor_live = jnp.repeat(jnp.isfinite(top_logit), k, axis=1)  # (N, q)

    if refine:
        # exact top-num_candidates anchors among the gathered cells' q
        # candidates. Liveness falls out of the top_k VALUES (dead anchors
        # rank -inf), and the row gathers run as one-hot MXU matmuls: the
        # round-5 int8 trace priced the take_along_axis forms at ~0.9 ms
        # (scattered-row gather custom calls + layout copies) vs ~0.1 ms
        # on the MXU. Exact: logits/deltas are bf16-representable (bf16
        # head outputs accumulated in f32) so the bf16 one-hot select
        # reproduces them bit-for-bit; anchors/deltas ride an f32 einsum.
        rank = jnp.max(cand_logits, axis=-1)
        rank = jnp.where(anchor_live, rank, -jnp.inf)
        top_rank, aidx = jax.lax.top_k(rank, cfg.num_candidates)  # (N, Q)
        anchor_live = jnp.isfinite(top_rank)
        # select in the raw maps' dtype: bf16 head outputs are selected
        # bit-exactly by a bf16 one-hot (values fit bf16; f32 accumulate);
        # f32 callers (oracle tests) get an f32 einsum — exact either way
        sel_dtype = raw_levels[0][0].dtype
        oh = jax.nn.one_hot(aidx, q, dtype=sel_dtype)  # (N, Q, q)
        cand_logits = jnp.einsum(
            "nqs,nsc->nqc", oh, cand_logits.astype(sel_dtype),
            preferred_element_type=jnp.float32)
        cand_da = jnp.einsum(
            "nqs,nsc->nqc", oh.astype(jnp.float32),
            jnp.concatenate([cand_deltas, cand_anchors], axis=-1),
            preferred_element_type=jnp.float32)
        cand_deltas, cand_anchors = cand_da[..., :4], cand_da[..., 4:]

    boxes = box_utils.clip_boxes(box_utils.decode(cand_deltas, cand_anchors))
    scores = jax.nn.sigmoid(cand_logits)
    scores = jnp.where(anchor_live[..., None], scores, 0.0)
    return boxes, scores


def _nms(boxes, scores, cfg, use_pallas, interpret, mesh):
    """Dispatch to the Pallas kernel (shard-mapped over the data axis when a
    mesh is given — multi-device DP serving keeps the kernel), the plain
    Pallas kernel, or the jnp reference."""
    if use_pallas and cfg.method == "hard":
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from ssd_tpu.ops.nms_pallas import batched_nms_pallas_sharded
            return batched_nms_pallas_sharded(boxes, scores, cfg, mesh,
                                              interpret=interpret)
        from ssd_tpu.ops.nms_pallas import batched_nms_pallas
        return batched_nms_pallas(boxes, scores, cfg, interpret=interpret)
    return batched_nms(boxes, scores, cfg)


def postprocess_cells(
    raw_levels: list,
    anchors: jnp.ndarray,
    num_classes: int,
    cfg: NMSConfig,
    use_pallas: bool = False,
    interpret: bool = False,
    mesh=None,
) -> Detections:
    boxes, scores = select_candidates_cells(
        raw_levels, anchors, num_classes, cfg
    )
    return _nms(boxes, scores, cfg, use_pallas, interpret, mesh)


def postprocess_pyramid(
    raw_levels: list,
    anchors: jnp.ndarray,
    num_classes: int,
    cfg: NMSConfig,
    use_pallas: bool = False,
    interpret: bool = False,
    exact_topk: bool = False,
    mesh=None,
) -> Detections:
    boxes, scores = select_candidates_pyramid(
        raw_levels, anchors, num_classes, cfg, exact=exact_topk
    )
    return _nms(boxes, scores, cfg, use_pallas, interpret, mesh)


def postprocess_detections(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: NMSConfig,
    use_pallas: bool = False,
    interpret: bool = False,
    exact_topk: bool = False,
    mesh=None,
) -> Detections:
    boxes, scores = select_candidates(logits, deltas, anchors, cfg,
                                      exact=exact_topk)
    return _nms(boxes, scores, cfg, use_pallas, interpret, mesh)
