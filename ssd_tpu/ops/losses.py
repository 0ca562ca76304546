"""Detection losses: sigmoid focal loss, smooth-L1, optional OHEM.

TPU-native counterpart of the reference's ``src/losses_and_ohem.py``
(SURVEY.md §2). All losses are elementwise + masked reductions over the
padded ``(N, A, ...)`` tensors — XLA fuses them into the backward pass with
no intermediate materialization.

Normalization follows RetinaNet: both losses are divided by the total number
of positive anchors in the batch (clamped to >= 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import LossConfig
from ssd_tpu.ops.targets import Targets


class LossDict(NamedTuple):
    total: jnp.ndarray
    classification: jnp.ndarray
    localization: jnp.ndarray
    num_positives: jnp.ndarray


def sigmoid_focal_loss(
    logits: jnp.ndarray,      # (..., C)
    targets: jnp.ndarray,     # (..., C) one-hot (all-zero rows = negatives)
    alpha: float,
    gamma: float,
) -> jnp.ndarray:
    """Per-element focal loss; caller applies masks and reduces.

    ``FL(p_t) = -alpha_t * (1 - p_t)^gamma * log(p_t)`` with sigmoid
    probabilities, computed in a numerically stable form from logits.
    """
    # Stable BCE from logits: max(x,0) - x*t + log(1 + exp(-|x|))
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    prob = jax.nn.sigmoid(logits)
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * jnp.power(1.0 - p_t, gamma) * bce


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   delta: float = 1.0) -> jnp.ndarray:
    """Per-element Huber/smooth-L1; caller applies masks and reduces."""
    diff = jnp.abs(pred - target)
    return jnp.where(
        diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta
    )


_EPS = 1e-8


def iou_box_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 kind: str = "giou") -> jnp.ndarray:
    """Aligned IoU-family box loss on corner-form boxes.

    ``(..., 4) x (..., 4) -> (...)``; one loss value per box pair (unlike
    :func:`smooth_l1_loss`'s per-coordinate values). Variants:

      * ``giou`` (Rezatofighi et al. 2019): ``1 - IoU +
        (C - union)/C`` with C the smallest enclosing box — non-zero
        gradient even for disjoint boxes; range [0, 2).
      * ``diou`` (Zheng et al. 2020): ``1 - IoU + d^2/c^2`` — center
        distance over enclosing-diagonal, converges faster than giou's
        area term.
      * ``ciou``: diou + an aspect-ratio consistency term with the
        standard stop-gradient trade-off weight.

    Elementwise + min/max only, so XLA fuses it into the backward pass
    like smooth-L1 — the per-level conv-native loss layout is preserved.
    """
    py0, px0, py1, px1 = [jnp.squeeze(v, -1) for v in jnp.split(pred, 4, -1)]
    ty0, tx0, ty1, tx1 = [jnp.squeeze(v, -1) for v in jnp.split(target, 4, -1)]

    ph = jnp.maximum(py1 - py0, 0.0)
    pw = jnp.maximum(px1 - px0, 0.0)
    th = jnp.maximum(ty1 - ty0, 0.0)
    tw = jnp.maximum(tx1 - tx0, 0.0)

    ih = jnp.maximum(jnp.minimum(py1, ty1) - jnp.maximum(py0, ty0), 0.0)
    iw = jnp.maximum(jnp.minimum(px1, tx1) - jnp.maximum(px0, tx0), 0.0)
    inter = ih * iw
    union = ph * pw + th * tw - inter
    iou = inter / jnp.maximum(union, _EPS)

    # smallest enclosing box
    eh = jnp.maximum(py1, ty1) - jnp.minimum(py0, ty0)
    ew = jnp.maximum(px1, tx1) - jnp.minimum(px0, tx0)

    if kind == "giou":
        c_area = eh * ew
        return 1.0 - iou + (c_area - union) / jnp.maximum(c_area, _EPS)

    # diou/ciou: squared center distance over squared enclosing diagonal
    d2 = ((py0 + py1 - ty0 - ty1) ** 2 + (px0 + px1 - tx0 - tx1) ** 2) / 4.0
    c2 = jnp.maximum(eh * eh + ew * ew, _EPS)
    diou = 1.0 - iou + d2 / c2
    if kind == "diou":
        return diou
    if kind == "ciou":
        v = (4.0 / jnp.pi**2) * (
            jnp.arctan(tw / jnp.maximum(th, _EPS))
            - jnp.arctan(pw / jnp.maximum(ph, _EPS))
        ) ** 2
        alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, _EPS))
        return diou + alpha * v
    raise ValueError(f"unknown iou loss kind: {kind!r}")


def _localization_elem(box_deltas, reg_targets, cfg: LossConfig, anchors):
    """Per-anchor localization loss ``(..., A)`` under ``cfg.box_loss``.

    smooth_l1 operates in ENCODED delta space (the reference recipe);
    the IoU family decodes both sides against the anchors (encode/decode
    round-trips exactly, so the decoded target IS the matched gt box) and
    scores geometric overlap directly.
    """
    if cfg.box_loss == "smooth_l1":
        return jnp.sum(
            smooth_l1_loss(box_deltas, reg_targets, cfg.smooth_l1_delta),
            axis=-1)
    if anchors is None:
        raise ValueError(f"box_loss={cfg.box_loss!r} needs anchors")
    from ssd_tpu.ops import box_utils
    pred = box_utils.decode(box_deltas, anchors)
    tgt = box_utils.decode(reg_targets, anchors)
    return iou_box_loss(pred, tgt, cfg.box_loss)


def detection_loss(
    class_logits: jnp.ndarray,   # (N, A, C)
    box_deltas: jnp.ndarray,     # (N, A, 4)
    targets: Targets,
    cfg: LossConfig,
    anchors: jnp.ndarray | None = None,  # (A, 4), for IoU-family box_loss
) -> LossDict:
    """Masked, normalized total detection loss for a batch."""
    num_pos = jnp.maximum(jnp.sum(targets.reg_weights), 1.0)

    cls_elem = sigmoid_focal_loss(
        class_logits.astype(jnp.float32),
        targets.cls_targets,
        cfg.focal_alpha,
        cfg.focal_gamma,
    )  # (N, A, C)
    cls_per_anchor = jnp.sum(cls_elem, axis=-1) * targets.cls_weights  # (N, A)

    if cfg.use_ohem:
        cls_loss = _ohem_classification(cls_per_anchor, targets, cfg) / num_pos
    else:
        cls_loss = jnp.sum(cls_per_anchor) / num_pos

    loc_pa = _localization_elem(
        box_deltas.astype(jnp.float32), targets.reg_targets, cfg, anchors
    )  # (N, A)
    loc_loss = jnp.sum(loc_pa * targets.reg_weights) / num_pos

    total = (
        cfg.classification_weight * cls_loss + cfg.localization_weight * loc_loss
    )
    return LossDict(total, cls_loss, loc_loss, num_pos)


def detection_loss_levels(
    raw_levels: list,            # [(cls (N,H,W,K*C), box (N,H,W,K*4)), ...]
    targets: Targets,            # cls_targets may be None (class_onehot=False)
    num_classes: int,
    cfg: LossConfig,
    anchors: jnp.ndarray | None = None,  # (A, 4), for IoU-family box_loss
) -> LossDict:
    """Per-level detection loss in the head's conv-native layout.

    Numerically the same loss as :func:`detection_loss` (identical terms,
    per-level summation order), built for how XLA actually lowers it.
    Three generations of this path were traced on the real chip
    (BENCHMARKS.md round-2):

      * the flat path's (N, A, C) logits concat costs ~6 ms/step of
        layout copies, and lining the conv-native logits up with an
        einsum-produced one-hot costs ~9 ms more;
      * an (N, H, W, K, C) rank-5 compare pads tiles to (16, 128) —
        2.8x memory inflation on every pass;
      * and EACH (N, H, W, K) -> (N, H, W, K*C) repeat/broadcast operand
        costs ~2.8 ms/level because XLA materializes it (minor-dim
        expansion cannot fuse).

    So this path uses ONE broadcast operand per level: the per-anchor
    state (matched class id, NEGATIVE, or IGNORED) packed into a single
    (N, H, W, K) float, expanded inside the fusion via K free minor-dim
    broadcasts against static per-k indicators, then compared against a
    static (K*C,) class-id row to regenerate the one-hot and the ignore
    mask in place. The focal elementwise then runs directly on the
    (N, H, W, K*C) conv output in its native layout; only scalars leave.

    OHEM needs per-anchor classification sums, which would reintroduce
    the rank-5 reduce — with ``use_ohem`` the caller should use the flat
    :func:`detection_loss` instead (Detector.loss does).
    """
    assert targets.matched_labels is not None, (
        "detection_loss_levels needs create_targets(class_onehot=False)")
    assert not cfg.use_ohem, "per-level loss does not support OHEM"

    neg_v, ign_v = float(num_classes), float(num_classes + 1)
    cls_sum = jnp.zeros((), jnp.float32)
    loc_pa = []
    off = 0
    for cls_map, box_map in raw_levels:
        n, h, w, kc = cls_map.shape
        k = kc // num_classes
        al = h * w * k

        # (N, H, W, K) anchor-state plane for this level
        lab = targets.matched_labels[:, off:off + al].reshape(n, h, w, k)
        pos = targets.reg_weights[:, off:off + al].reshape(n, h, w, k)
        wgt = targets.cls_weights[:, off:off + al].reshape(n, h, w, k)
        enc = jnp.where(wgt > 0, jnp.where(pos > 0, lab, neg_v), ign_v)

        # expand to (N, H, W, K*C) inside the fusion: minor-dim broadcasts
        # of (N, H, W, 1) slices against static indicators are free
        cls_ids = jnp.asarray(
            np.tile(np.arange(num_classes, dtype=np.float32), k))
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            ind = jnp.asarray(
                (np.arange(kc) // num_classes == i).astype(np.float32))
            s = s + enc[..., i][..., None] * ind
        t = (s == cls_ids).astype(jnp.float32)
        valid = (s != ign_v).astype(jnp.float32)

        x = cls_map.astype(jnp.float32)
        elem = sigmoid_focal_loss(x, t, cfg.focal_alpha, cfg.focal_gamma)
        cls_sum = cls_sum + jnp.sum(elem * valid)

        box_l = box_map.reshape(n, al, 4).astype(jnp.float32)
        loc_pa.append(_localization_elem(
            box_l, targets.reg_targets[:, off:off + al], cfg,
            None if anchors is None else anchors[off:off + al],
        ))  # (N, Al)
        off += al

    num_pos = jnp.maximum(jnp.sum(targets.reg_weights), 1.0)
    cls_loss = cls_sum / num_pos
    loc_loss = (
        jnp.sum(jnp.concatenate(loc_pa, 1) * targets.reg_weights) / num_pos
    )
    total = (
        cfg.classification_weight * cls_loss + cfg.localization_weight * loc_loss
    )
    return LossDict(total, cls_loss, loc_loss, num_pos)


def _ohem_classification(
    cls_per_anchor: jnp.ndarray,  # (N, A) already cls_weights-masked
    targets: Targets,
    cfg: LossConfig,
) -> jnp.ndarray:
    """Online hard example mining over negatives (per image, static-shape).

    Keeps all positives plus the hardest ``neg_ratio * num_pos`` negatives
    (at least ``ohem_min_negatives``), selected by classification loss. The
    dynamic keep-count becomes a rank-vs-threshold mask so shapes stay static.
    """
    positive = targets.reg_weights > 0  # (N, A)
    neg_loss = jnp.where(positive, -jnp.inf, cls_per_anchor)  # negatives only

    num_pos_per_image = jnp.sum(positive, axis=1)  # (N,)
    k = jnp.maximum(
        (cfg.ohem_neg_ratio * num_pos_per_image).astype(jnp.int32),
        cfg.ohem_min_negatives,
    )  # (N,)

    # rank[i, a] = how many negatives in image i have strictly larger loss.
    order = jnp.argsort(-neg_loss, axis=1)
    rank = jnp.argsort(order, axis=1)
    keep_neg = (rank < k[:, None]) & ~positive & (targets.cls_weights > 0)

    keep = positive | keep_neg
    return jnp.sum(jnp.where(keep, cls_per_anchor, 0.0))


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """L2 penalty over all kernel (>=2D) parameters, excluding biases/norms."""
    leaves = jax.tree_util.tree_leaves(params)
    total = 0.0
    for leaf in leaves:
        if leaf.ndim >= 2:
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return 0.5 * weight_decay * total
