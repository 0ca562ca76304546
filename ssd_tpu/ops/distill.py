"""Knowledge distillation losses for dense detection heads.

A trained *teacher* (any backbone/width in this framework — e.g. the
ResNet-50-FPN or a width-1.0 MobileNet) supervises a smaller *student*
through its raw head outputs. The reference has no counterpart; this is a
standard production technique for shipping small detectors at higher
accuracy than from-scratch training allows, and it composes naturally with
this framework's pure-functional training step: the teacher's forward is
just one more (gradient-free) branch of the same compiled XLA program.

Two signals, both weighted per-anchor by the teacher's own foreground
confidence (dense detection is >99% easy background; unweighted
distillation drowns the objects in negatives — cf. the same motivation as
focal loss):

  * **classification**: temperature-scaled binary KL between teacher and
    student per-class sigmoid probabilities (the sigmoid analog of
    Hinton-style softmax distillation; scaled by T^2 so gradient magnitude
    is temperature-invariant);
  * **localization**: smooth-L1 between student and teacher box deltas —
    the teacher's regression output is a denoised version of the gt
    targets wherever the teacher is confident.

Both accept the head's conv-native per-level layout (the default training
path) or flat ``(N, A, C)`` outputs. The per-level path reshapes each
level to ``(N, H, W, K, C)`` for the per-anchor teacher-confidence max —
a tile-padded layout the hard-target loss deliberately avoids
(``losses.detection_loss_levels``); distillation is opt-in and pays that
cost only when enabled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DistillDict(NamedTuple):
    total: jnp.ndarray
    classification: jnp.ndarray
    localization: jnp.ndarray


def _soft_bce(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """Stable elementwise BCE from logits against SOFT targets."""
    return (jnp.maximum(logits, 0.0) - logits * soft_targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _binary_kl(student_logits, teacher_logits, temperature: float):
    """Elementwise KL(sigmoid(zt/T) || sigmoid(zs/T)) * T^2.

    Written as ``BCE(zs/T, p) - BCE(zt/T, p)`` with ``p = sigmoid(zt/T)``
    — the cross-entropy minus the teacher's own entropy — so it is exactly
    zero when the logits agree and always non-negative.
    """
    t = 1.0 / temperature
    zt = teacher_logits * t
    zs = student_logits * t
    p = jax.nn.sigmoid(zt)
    return (temperature * temperature) * (_soft_bce(zs, p) - _soft_bce(zt, p))


def _pair_loss(s_cls, s_box, t_cls, t_box, num_classes: int,
               temperature: float, weight_floor: float):
    """One layout-matched (cls, box) pair -> (kl_sum, box_sum, w_sum).

    ``s_cls/t_cls``: (..., K*C) or (N, A, C); ``s_box/t_box`` matching
    (..., K*4) or (N, A, 4). Returns unnormalized sums so multi-level
    callers can normalize once globally.
    """
    s_cls = s_cls.astype(jnp.float32)
    t_cls = jax.lax.stop_gradient(t_cls.astype(jnp.float32))
    lead = s_cls.shape[:-1]
    k = s_cls.shape[-1] // num_classes
    s5 = s_cls.reshape(lead + (k, num_classes))
    t5 = t_cls.reshape(lead + (k, num_classes))

    # per-anchor foreground-ness of the TEACHER (no temperature): the
    # distillation weight. The floor keeps a trickle of background
    # signal (the teacher's calibrated negatives are informative too).
    w = jnp.maximum(jnp.max(jax.nn.sigmoid(t5), axis=-1), weight_floor)

    kl = jnp.sum(_binary_kl(s5, t5, temperature), axis=-1)  # (..., K)
    kl_sum = jnp.sum(kl * w)

    s_box = s_box.astype(jnp.float32).reshape(lead + (k, 4))
    t_box = jax.lax.stop_gradient(
        t_box.astype(jnp.float32).reshape(lead + (k, 4)))
    diff = jnp.abs(s_box - t_box)
    huber = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    box_sum = jnp.sum(jnp.sum(huber, axis=-1) * w)

    return kl_sum, box_sum, jnp.sum(w)


def distillation_loss(
    student_raw,
    teacher_raw,
    num_classes: int,
    temperature: float = 2.0,
    box_weight: float = 1.0,
    weight_floor: float = 0.01,
) -> DistillDict:
    """Teacher->student distillation loss over raw head outputs.

    ``student_raw``/``teacher_raw``: either the flat ``(logits (N, A, C),
    deltas (N, A, 4))`` tuple or the per-level list
    ``[(cls (N, H, W, K*C), box (N, H, W, K*4)), ...]`` — both sides must
    use the SAME layout and identical head geometry (same anchor config
    and class count; any backbone).
    """
    s_levels = (student_raw if isinstance(student_raw, (list, tuple))
                and isinstance(student_raw[0], (list, tuple))
                else [student_raw])
    t_levels = (teacher_raw if isinstance(teacher_raw, (list, tuple))
                and isinstance(teacher_raw[0], (list, tuple))
                else [teacher_raw])
    if len(s_levels) != len(t_levels):
        raise ValueError(
            f"student has {len(s_levels)} output levels, teacher "
            f"{len(t_levels)} — head geometries differ")

    kl_sum = jnp.zeros((), jnp.float32)
    box_sum = jnp.zeros((), jnp.float32)
    w_sum = jnp.zeros((), jnp.float32)
    for (s_cls, s_box), (t_cls, t_box) in zip(s_levels, t_levels):
        if s_cls.shape != t_cls.shape:
            raise ValueError(
                f"student/teacher cls shapes differ: {s_cls.shape} vs "
                f"{t_cls.shape} (check anchor config / num_classes)")
        a, b, c = _pair_loss(s_cls, s_box, t_cls, t_box, num_classes,
                             temperature, weight_floor)
        kl_sum, box_sum, w_sum = kl_sum + a, box_sum + b, w_sum + c

    norm = jnp.maximum(w_sum, 1.0)
    cls_loss = kl_sum / norm
    box_loss = box_sum / norm
    return DistillDict(cls_loss + box_weight * box_loss, cls_loss, box_loss)
