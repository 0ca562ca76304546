"""Weighted box fusion + flip TTA tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.ops.wbf import weighted_box_fusion
from ssd_tpu.tta import TTAPredictor


def _wbf(boxes, scores, labels, iou=0.5, max_boxes=10, views=2):
    return weighted_box_fusion(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
        jnp.asarray(labels, jnp.int32), jnp.float32(iou),
        jnp.zeros((max_boxes,), jnp.float32), num_views=views)


def test_wbf_fuses_to_weighted_average():
    boxes = np.array([[0.10, 0.10, 0.50, 0.50],
                      [0.14, 0.10, 0.54, 0.50]], np.float32)
    b, s, l, n = _wbf(boxes, [0.8, 0.4], [2, 2])
    assert int(n) == 1
    # score-weighted coords: (0.8*b0 + 0.4*b1) / 1.2
    exp = (0.8 * boxes[0] + 0.4 * boxes[1]) / 1.2
    np.testing.assert_allclose(np.asarray(b)[0], exp, atol=1e-6)
    # paper score: mean(0.8, 0.4) * min(2,2)/2 = 0.6
    np.testing.assert_allclose(float(np.asarray(s)[0]), 0.6, atol=1e-6)
    assert int(np.asarray(l)[0]) == 2


def test_wbf_single_view_boxes_are_downweighted():
    """A cluster found by only 1 of 2 views scales by 1/2."""
    boxes = np.array([[0.1, 0.1, 0.3, 0.3]], np.float32)
    _, s, _, n = _wbf(boxes, [0.9], [0], views=2)
    assert int(n) == 1
    np.testing.assert_allclose(float(np.asarray(s)[0]), 0.45, atol=1e-6)
    # with views=1 no penalty
    _, s1, _, _ = _wbf(boxes, [0.9], [0], views=1)
    np.testing.assert_allclose(float(np.asarray(s1)[0]), 0.9, atol=1e-6)


def test_wbf_keeps_classes_separate():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                      [0.1, 0.1, 0.5, 0.5]], np.float32)
    b, s, l, n = _wbf(boxes, [0.9, 0.8], [1, 2])
    assert int(n) == 2
    assert sorted(np.asarray(l)[:2].tolist()) == [1, 2]


def test_wbf_separate_clusters_stay_separate():
    boxes = np.array([[0.1, 0.1, 0.3, 0.3],
                      [0.6, 0.6, 0.9, 0.9],
                      [0.11, 0.1, 0.3, 0.31]], np.float32)
    b, s, l, n = _wbf(boxes, [0.9, 0.8, 0.7], [0, 0, 0])
    assert int(n) == 2


def test_wbf_ignores_padding():
    boxes = np.zeros((6, 4), np.float32)
    boxes[0] = [0.2, 0.2, 0.4, 0.4]
    scores = np.zeros(6, np.float32)
    scores[0] = 0.5
    labels = np.full(6, -1, np.int32)
    labels[0] = 1
    b, s, l, n = _wbf(boxes, scores, labels, views=1)
    assert int(n) == 1
    assert (np.asarray(s)[1:] == 0).all()
    assert (np.asarray(l)[1:] == -1).all()


def test_wbf_order_invariance_of_clusters():
    """Same candidates in a different input order fuse identically
    (sorting by score inside the kernel)."""
    boxes = np.array([[0.10, 0.10, 0.50, 0.50],
                      [0.14, 0.10, 0.54, 0.50],
                      [0.6, 0.6, 0.9, 0.9]], np.float32)
    scores = [0.8, 0.4, 0.7]
    labels = [1, 1, 1]
    perm = [2, 0, 1]
    b1, s1, _, _ = _wbf(boxes, scores, labels)
    b2, s2, _, _ = _wbf(boxes[perm], np.asarray(scores)[perm],
                        np.asarray(labels)[perm])
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


# ----------------------------------------------------------------- TTA

class SymmetricFakePredictor:
    """Detects one centered box — flip-invariant input => identical views."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.label_map = None

    def predict(self, images):
        m = self.cfg.nms.max_boxes
        n = len(images)
        boxes = np.zeros((n, m, 4), np.float32)
        scores = np.zeros((n, m), np.float32)
        labels = np.full((n, m), -1, np.int32)
        for i in range(n):
            boxes[i, 0] = [0.25, 0.30, 0.75, 0.70]
            scores[i, 0] = 0.9
            labels[i, 0] = 1
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "num_boxes": np.ones(n, np.int32)}


CFG = Config(num_classes=3, image_size=64,
             model=ModelConfig(width_multiplier=0.25, fpn_channels=32,
                               head_depth=1, compute_dtype="float32"),
             nms=NMSConfig(max_boxes=8, iou_threshold=0.5))


def test_tta_flip_consistent_detection_fuses_to_one():
    """Both views agree (after unflipping) => ONE detection at full mean
    score with exactly the agreed box."""
    tta = TTAPredictor(SymmetricFakePredictor(CFG))
    res = tta.predict(np.zeros((64, 64, 3), np.uint8))
    assert res["num_boxes"] == 1
    np.testing.assert_allclose(res["boxes"][0], [0.25, 0.30, 0.75, 0.70],
                               atol=1e-6)
    np.testing.assert_allclose(res["scores"][0], 0.9, atol=1e-6)


class OffsetFakePredictor(SymmetricFakePredictor):
    """Box NOT horizontally centered: the flipped view sees it mirrored,
    so TTA must unflip it back onto the original."""

    def predict(self, images):
        out = super().predict(images)
        out["boxes"][:, 0] = [0.2, 0.1, 0.6, 0.4]
        return out


def test_tta_unflips_flipped_view():
    tta = TTAPredictor(OffsetFakePredictor(CFG))
    res = tta.predict(np.zeros((64, 64, 3), np.uint8))
    # view 1 reports [.2,.1,.6,.4] on the flipped frame -> unflipped
    # [.2,.6,.6,.9]; disjoint from view 0's box, so two half-weight dets
    assert res["num_boxes"] == 2
    got = sorted(res["boxes"][:2].tolist())
    np.testing.assert_allclose(got[0], [0.2, 0.1, 0.6, 0.4], atol=1e-6)
    np.testing.assert_allclose(got[1], [0.2, 0.6, 0.6, 0.9], atol=1e-6)
    np.testing.assert_allclose(res["scores"][:2], [0.45, 0.45], atol=1e-6)


def test_tta_real_predictor_contract_and_batches():
    from ssd_tpu.models.detector import Detector
    from ssd_tpu.predictor import Predictor

    det = Detector(CFG)
    p = Predictor(CFG, det.init(jax.random.PRNGKey(0)),
                  label_map={1: "a", 2: "b"})
    tta = TTAPredictor(p, max_boxes=12)
    imgs = np.random.default_rng(0).integers(
        0, 255, (3, 64, 64, 3)).astype(np.uint8)
    res = tta.predict(imgs)
    assert res["boxes"].shape == (3, 12, 4)
    assert res["scores"].shape == (3, 12)
    assert res["num_boxes"].shape == (3,)
    assert "names" in res
    # nms merge mode works too
    res2 = TTAPredictor(p, merge="nms").predict(imgs[0])
    assert res2["boxes"].shape == (CFG.nms.max_boxes, 4)


def test_tta_merge_validation():
    with pytest.raises(ValueError, match="merge"):
        TTAPredictor(SymmetricFakePredictor(CFG), merge="bogus")


# ------------------------------------------------------------- ensemble

def test_ensemble_agreeing_models_fuse():
    from ssd_tpu.tta import EnsemblePredictor

    e = EnsemblePredictor([SymmetricFakePredictor(CFG),
                           SymmetricFakePredictor(CFG)])
    res = e.predict(np.zeros((64, 64, 3), np.uint8))
    assert res["num_boxes"] == 1
    np.testing.assert_allclose(res["boxes"][0], [0.25, 0.30, 0.75, 0.70],
                               atol=1e-6)
    np.testing.assert_allclose(res["scores"][0], 0.9, atol=1e-6)


def test_ensemble_single_model_box_downweighted():
    from ssd_tpu.tta import EnsemblePredictor

    class Silent(SymmetricFakePredictor):
        def predict(self, images):
            out = super().predict(images)
            out["scores"][:] = 0.0
            out["labels"][:] = -1
            out["num_boxes"][:] = 0
            return out

    e = EnsemblePredictor([SymmetricFakePredictor(CFG), Silent(CFG)])
    res = e.predict(np.zeros((64, 64, 3), np.uint8))
    assert res["num_boxes"] == 1
    np.testing.assert_allclose(res["scores"][0], 0.45, atol=1e-6)  # 1/2


def test_ensemble_weights_scale_scores():
    from ssd_tpu.tta import EnsemblePredictor

    e = EnsemblePredictor([SymmetricFakePredictor(CFG),
                           SymmetricFakePredictor(CFG)],
                          weights=[1.0, 0.5])
    res = e.predict(np.zeros((64, 64, 3), np.uint8))
    # member scores 0.9 and 0.45 -> mean 0.675, full coverage
    np.testing.assert_allclose(res["scores"][0], 0.675, atol=1e-6)


def test_ensemble_validation():
    from ssd_tpu.tta import EnsemblePredictor

    with pytest.raises(ValueError, match="at least one"):
        EnsemblePredictor([])
    with pytest.raises(ValueError, match="one weight"):
        EnsemblePredictor([SymmetricFakePredictor(CFG)], weights=[1, 2])


def test_ensemble_real_predictors_mixed_backbones():
    """Two real predictors with different configs (resolutions) behind one
    ensemble — members resize independently."""
    import dataclasses

    from ssd_tpu.models.detector import Detector
    from ssd_tpu.predictor import Predictor
    from ssd_tpu.tta import EnsemblePredictor

    cfg2 = dataclasses.replace(CFG, image_size=96)
    p1 = Predictor(CFG, Detector(CFG).init(jax.random.PRNGKey(0)))
    p2 = Predictor(cfg2, Detector(cfg2).init(jax.random.PRNGKey(1)))
    e = EnsemblePredictor([p1, p2], max_boxes=16)
    res = e.predict(np.random.default_rng(0).integers(
        0, 255, (2, 80, 70, 3)).astype(np.uint8))
    assert res["boxes"].shape == (2, 16, 4)
    assert res["num_boxes"].shape == (2,)
