"""Soft-NMS vs an independent numpy reference, plus behavioral checks."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops.nms import batched_nms, soft_suppression_scores


def _np_soft_nms(boxes, scores, cfg):
    """Classic O(K^2) per-group reference (Bodla et al. 2017)."""
    boxes, s = boxes.copy(), scores.copy()
    processed = np.zeros(len(s), bool)
    for _ in range(len(s)):
        masked = np.where(processed, -np.inf, s)
        p = int(np.argmax(masked))
        if s[p] <= 0.0:
            processed[p] = True
            continue
        processed[p] = True
        for j in range(len(s)):
            if processed[j]:
                continue
            iou = _np_iou(boxes[p], boxes[j])
            if cfg.method == "soft_gaussian":
                s[j] *= np.exp(-(iou * iou) / cfg.soft_sigma)
            elif iou > cfg.iou_threshold:
                s[j] *= 1.0 - iou
    return np.where(s >= cfg.score_threshold, s, -1.0)


def _np_iou(a, b):
    yy0, xx0 = max(a[0], b[0]), max(a[1], b[1])
    yy1, xx1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(yy1 - yy0, 0.0) * max(xx1 - xx0, 0.0)
    area = lambda x: max(x[2] - x[0], 0.0) * max(x[3] - x[1], 0.0)
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def _random_group(rng, k):
    c = rng.uniform(0.2, 0.8, (k, 2))
    s = rng.uniform(0.05, 0.4, (k, 2))
    boxes = np.concatenate([c - s / 2, c + s / 2], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, k).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("method", ["soft_linear", "soft_gaussian"])
def test_matches_numpy_reference(method):
    rng = np.random.default_rng(0)
    cfg = NMSConfig(method=method, score_threshold=0.1)
    for trial in range(5):
        boxes, scores = _random_group(rng, 24)
        want = _np_soft_nms(boxes, scores, cfg)
        got = np.asarray(soft_suppression_scores(
            jnp.asarray(boxes)[None, None], jnp.asarray(scores)[None, None],
            cfg))[0, 0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"trial {trial}")


def test_invalid_candidates_stay_invalid():
    cfg = NMSConfig(method="soft_gaussian", score_threshold=0.1)
    boxes = jnp.zeros((1, 1, 8, 4))
    scores = jnp.full((1, 1, 8), -1.0)
    out = np.asarray(soft_suppression_scores(boxes, scores, cfg))
    assert (out == -1.0).all()


def test_disjoint_boxes_unchanged():
    """No overlap -> soft decay is identity; hard/soft agree exactly."""
    rng = np.random.default_rng(1)
    k = 6
    boxes = np.stack([
        np.array([0.1 * i, 0.1 * i, 0.1 * i + 0.05, 0.1 * i + 0.05])
        for i in range(k)]).astype(np.float32)
    scores = rng.uniform(0.3, 1.0, (1, k, 1)).astype(np.float32)
    base = NMSConfig(score_threshold=0.1, max_boxes=8)
    hard = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores),
                       dataclasses.replace(base, method="hard"))
    soft = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores),
                       dataclasses.replace(base, method="soft_gaussian"))
    assert int(hard.num_boxes[0]) == int(soft.num_boxes[0]) == k
    np.testing.assert_allclose(np.asarray(hard.scores),
                               np.asarray(soft.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hard.boxes),
                               np.asarray(soft.boxes), rtol=1e-6)


def test_crowded_duplicates_survive_soft_but_not_hard():
    """Two true objects + heavy duplicates: soft keeps the second object's
    near-duplicate above threshold while hard kills everything overlapping."""
    # object A at high score, a 0.6-IoU-ish neighbor that is a REAL second
    # object (crowded scene): hard NMS at iou_threshold=0.5 removes it,
    # gaussian soft keeps it with a decayed score.
    boxes = np.array([
        [0.10, 0.10, 0.50, 0.50],
        [0.15, 0.15, 0.55, 0.55],   # overlaps A heavily but is object B
    ], np.float32)
    scores = np.array([[0.9], [0.8]], np.float32)
    base = NMSConfig(score_threshold=0.05, iou_threshold=0.5, max_boxes=4)
    hard = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                       dataclasses.replace(base, method="hard"))
    soft = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                       dataclasses.replace(base, method="soft_gaussian"))
    assert int(hard.num_boxes[0]) == 1
    assert int(soft.num_boxes[0]) == 2
    s = np.asarray(soft.scores[0])
    assert s[0] == pytest.approx(0.9, rel=1e-6)
    assert 0.05 < s[1] < 0.8  # decayed, not suppressed
