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


def detection_loss(
    class_logits: jnp.ndarray,   # (N, A, C)
    box_deltas: jnp.ndarray,     # (N, A, 4)
    targets: Targets,
    cfg: LossConfig,
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

    loc_elem = smooth_l1_loss(
        box_deltas.astype(jnp.float32), targets.reg_targets, cfg.smooth_l1_delta
    )  # (N, A, 4)
    loc_loss = (
        jnp.sum(jnp.sum(loc_elem, axis=-1) * targets.reg_weights) / num_pos
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
