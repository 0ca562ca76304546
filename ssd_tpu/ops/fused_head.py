"""Fused prediction head: logits + max-over-classes without the big tensor.

The measured cost anatomy (BENCHMARKS.md) shows ~10 ms of the 32 ms
headline batch goes to class-count-proportional work: the final class conv
writes the model's largest tensor (the per-anchor logits), which is then
relaid out, reduced for candidate selection, and mostly thrown away — only
~1k of 6.1M anchor-class rows survive. With a 1x1 final prediction conv
(``model.head_final_kernel = 1``) the prediction is a per-cell matmul and
the pipeline becomes:

  1. lane-aligned matmul + per-anchor group-max over each class block
     (``fused_logit_max``) — only the (N, A) maxes persist; the class
     padding trick there is ESSENTIAL (see its docstring: non-aligned
     output columns are pathological on this stack);
  2. top-Q candidate selection on the (N, A) maxes (approx_max_k);
  3. candidate logits/deltas RECOMPUTED from the Q gathered trunk rows with
     tiny matmuls (~50x less FLOPs than step 1) and a per-candidate
     anchor-slice gather.

Numerically equivalent to the unfused path up to matmul accumulation order
(tests compare detections exactly on tie-free inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops import box_utils
from ssd_tpu.ops.nms import Detections

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_logit_max(trunk: jnp.ndarray,   # (N, cells, ch) bf16
                    weights: jnp.ndarray,  # (ch, K*C) f32 (1x1 conv kernel)
                    bias: jnp.ndarray,     # (K*C,) f32
                    k: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-anchor max-over-classes: (N, cells*K).

    Pure XLA, but with the class groups PADDED to the 128-lane boundary
    (-inf bias on pads keeps maxes exact). This matters enormously on this
    stack: a (272k, 128) @ (128, 720) matmul measures 4.5 SECONDS while
    the identical math at N=768/1152 runs in ~1.4 ms — XLA's lowering for
    non-lane-aligned output columns is pathological. The aligned matmul +
    lane-tile group-max beats a hand-written Pallas fusion of the same
    computation (28 ms — per-program reshape relayout dominates), so this
    stays XLA. ``interpret`` is accepted for API symmetry and ignored.
    """
    del interpret
    n, cells, ch = trunk.shape
    kc = weights.shape[1]
    c = kc // k
    c_pad = _round_up(c, LANE)

    # pad class groups to the lane boundary; -inf bias keeps maxes exact
    w = weights.reshape(ch, k, c)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c))).reshape(ch, k * c_pad)
    b = jnp.pad(bias.reshape(k, c), ((0, 0), (0, c_pad - c)),
                constant_values=-jnp.inf).reshape(k * c_pad)

    y = jnp.dot(
        trunk.astype(jnp.bfloat16).reshape(n * cells, ch),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + b  # (N*cells, K*c_pad)
    # lane-aligned group max: each anchor's class block is one lane tile
    return jnp.max(
        y.reshape(n * cells * k, c_pad), axis=1
    ).reshape(n, cells * k)


def fused_head_detections(
    cls_trunk: jnp.ndarray,   # (N, cells, ch)
    box_trunk: jnp.ndarray,   # (N, cells, ch)
    params_head: dict,        # variables["params"]["head"]
    anchors: jnp.ndarray,     # (A, 4), A == cells * K
    num_classes: int,
    k: int,                   # anchors per cell
    cfg: NMSConfig,
    use_pallas_nms: bool = False,
    interpret: bool = False,
    exact_topk: bool = False,
    mesh=None,
) -> Detections:
    """Candidate selection + NMS from subnet trunks (1x1 final convs)."""
    import math

    n, cells, ch = cls_trunk.shape
    c = num_classes
    w_cls = params_head["class_net"]["predict"]["kernel"].reshape(ch, k * c)
    b_cls = params_head["class_net"]["predict"]["bias"]
    w_box = params_head["box_net"]["predict"]["kernel"].reshape(ch, k * 4)
    b_box = params_head["box_net"]["predict"]["bias"]

    # 1. per-anchor max-over-classes, fused (logits never materialized)
    max_logit = fused_logit_max(cls_trunk, w_cls, b_cls, k,
                                interpret=interpret)  # (N, A)

    # 2. top-Q candidates in logit space
    a = max_logit.shape[1]
    q = min(cfg.num_candidates, a)
    logit_thr = math.log(cfg.score_threshold / (1.0 - cfg.score_threshold))
    masked = jnp.where(max_logit >= logit_thr, max_logit, -jnp.inf)
    if exact_topk:
        picked, idx = jax.lax.top_k(masked, q)
    else:
        picked, idx = jax.lax.approx_max_k(masked, q, recall_target=0.98)

    # 3. recompute candidate logits/deltas from Q trunk rows (tiny matmuls)
    cell_idx = idx // k           # (N, Q)
    anchor_k = idx % k            # (N, Q)
    cand_cls_trunk = jnp.take_along_axis(
        cls_trunk, cell_idx[..., None], axis=1
    ).astype(jnp.float32)          # (N, Q, ch)
    cand_box_trunk = jnp.take_along_axis(
        box_trunk, cell_idx[..., None], axis=1
    ).astype(jnp.float32)

    # lane-align BOTH recompute matmuls (non-aligned output columns are
    # pathological on this stack — see fused_logit_max)
    c_pad = _round_up(c, LANE)
    w_cls_p = jnp.pad(
        w_cls.reshape(ch, k, c), ((0, 0), (0, 0), (0, c_pad - c))
    ).reshape(ch, k * c_pad)
    b_cls_p = jnp.pad(
        b_cls.reshape(k, c), ((0, 0), (0, c_pad - c))
    ).reshape(k * c_pad)
    full_logits = cand_cls_trunk @ w_cls_p + b_cls_p   # (N, Q, K*c_pad)
    gather_c = anchor_k[..., None] * c_pad + jnp.arange(c)[None, None, :]
    cand_logits = jnp.take_along_axis(full_logits, gather_c, axis=2)

    kb_pad = _round_up(k * 4, LANE)
    w_box_p = jnp.pad(w_box, ((0, 0), (0, kb_pad - k * 4)))
    b_box_p = jnp.pad(b_box, (0, kb_pad - k * 4))
    full_deltas = cand_box_trunk @ w_box_p + b_box_p   # (N, Q, kb_pad)
    gather_b = anchor_k[..., None] * 4 + jnp.arange(4)[None, None, :]
    cand_deltas = jnp.take_along_axis(full_deltas, gather_b, axis=2)

    cand_anchors = anchors[idx]
    boxes = box_utils.clip_boxes(box_utils.decode(cand_deltas, cand_anchors))
    scores = jax.nn.sigmoid(cand_logits)
    scores = jnp.where(jnp.isfinite(picked)[..., None], scores, 0.0)

    from ssd_tpu.ops.postprocess import _nms
    return _nms(boxes, scores, cfg, use_pallas_nms, interpret, mesh)
