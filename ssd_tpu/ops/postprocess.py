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


def postprocess_detections(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: NMSConfig,
    use_pallas: bool = False,
    interpret: bool = False,
    exact_topk: bool = False,
) -> Detections:
    boxes, scores = select_candidates(logits, deltas, anchors, cfg,
                                      exact=exact_topk)
    if use_pallas:
        from ssd_tpu.ops.nms_pallas import batched_nms_pallas
        return batched_nms_pallas(boxes, scores, cfg, interpret=interpret)
    return batched_nms(boxes, scores, cfg)
