"""Weighted box fusion (Solovyev et al. 2021) — the ensembling merge.

Unlike NMS (keep the best box, drop the rest), WBF FUSES every box in an
overlap cluster into a score-weighted average — the right merge when the
candidate set comes from multiple views of the same image (test-time
augmentation, model ensembles): each view's localization error is
independent, so averaging tightens the box.

TPU shape discipline: candidates are a static (K, 4)/(K,) set (padded,
invalid slots score <= 0); clustering is a ``fori_loop`` over K steps of
O(K) broadcast work (like ``greedy_suppression_mask``), cluster state is
fixed-size (at most K clusters). Class separation uses the same
label-offset trick as the tiled merge: boxes live in [0, 1], shifting
each class by ``label * 2`` zeroes cross-class IoU, and the shift cancels
exactly in the weighted average (every member of a cluster shares it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssd_tpu.ops import box_utils


@functools.partial(jax.jit, static_argnames=("num_views",))
def weighted_box_fusion(boxes, scores, labels, iou_threshold,
                        max_boxes_arr, num_views: int = 1):
    """Class-wise WBF over one image's flat candidate set.

    Args:
      boxes: (K, 4) corner-form in [0, 1].
      scores: (K,) — invalid/padded slots <= 0.
      labels: (K,) int32.
      iou_threshold: overlap above which boxes join a cluster.
      max_boxes_arr: zeros-(max_boxes,) output-size carrier.
      num_views: how many TTA views/models produced the candidates; a
        cluster seen by fewer than all views gets its fused score scaled
        by ``n_members / num_views`` (the paper's confidence adjustment —
        a box only one view found is less trustworthy).

    Returns (fused_boxes (M, 4), fused_scores (M,), labels (M,), count).
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes = jnp.take(boxes, order, axis=0)
    scores = jnp.take(scores, order)
    labels = jnp.take(labels, order)
    valid = scores > 0.0
    offset = jnp.where(valid, labels, 0).astype(boxes.dtype)[:, None] * 2.0
    oboxes = boxes + offset  # class-disjoint coordinates

    init = {
        "count": jnp.zeros((), jnp.int32),
        "wsum": jnp.zeros((k, 4), jnp.float32),   # score-weighted box sums
        "ssum": jnp.zeros((k,), jnp.float32),     # score sums
        "smax": jnp.zeros((k,), jnp.float32),     # best member score
        "n": jnp.zeros((k,), jnp.float32),        # member counts
        "fused": jnp.zeros((k, 4), jnp.float32),  # current fused (offset) box
        "label": jnp.full((k,), -1, jnp.int32),
    }

    def body(i, st):
        box = jax.lax.dynamic_slice_in_dim(oboxes, i, 1, axis=0)  # (1, 4)
        score = scores[i]
        lane = jnp.arange(k)
        active = lane < st["count"]
        ious = jnp.squeeze(box_utils.iou(st["fused"], box), -1)  # (k,)
        ious = jnp.where(active, ious, -1.0)
        best = jnp.argmax(ious)
        join = (ious[best] > iou_threshold) & valid[i]
        tgt = jnp.where(join, best, st["count"])
        upd = valid[i].astype(jnp.float32)
        onehot = (lane == tgt).astype(jnp.float32) * upd

        wsum = st["wsum"] + onehot[:, None] * score * box
        ssum = st["ssum"] + onehot * score
        smax = jnp.maximum(st["smax"], onehot * score)  # kept for debugging
        n = st["n"] + onehot
        fused = jnp.where(
            (onehot > 0)[:, None],
            wsum / jnp.maximum(ssum, 1e-12)[:, None], st["fused"])
        label = jnp.where(onehot > 0, labels[i], st["label"])
        count = st["count"] + jnp.where(join | ~valid[i], 0, 1)
        return {"count": count, "wsum": wsum, "ssum": ssum, "smax": smax,
                "n": n, "fused": fused, "label": label}

    st = jax.lax.fori_loop(0, k, body, init)

    # fused score (paper eq. 5-6): mean member score scaled by cluster
    # coverage across views — a box only one view found is less trusted
    mean = st["ssum"] / jnp.maximum(st["n"], 1.0)
    cover = jnp.minimum(st["n"], float(num_views)) / float(num_views)
    fscores = mean * jnp.where(st["n"] > 0, cover, 0.0)
    # strip the class offset
    fboxes = st["fused"] - st["label"].astype(jnp.float32)[:, None] * 2.0

    m = max_boxes_arr.shape[0]
    mm = min(m, k)
    top_scores, top_idx = jax.lax.top_k(fscores, mm)
    fv = top_scores > 0.0
    out_boxes = jnp.clip(jnp.take(fboxes, top_idx, axis=0), 0.0, 1.0) \
        * fv[:, None]
    out_scores = jnp.where(fv, top_scores, 0.0)
    out_labels = jnp.where(fv, jnp.take(st["label"], top_idx), -1)
    if mm < m:
        pad = m - mm
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
    return out_boxes, out_scores, out_labels, jnp.sum(fv.astype(jnp.int32))
