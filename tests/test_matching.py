import numpy as np

from ssd_tpu.config import Config, MatcherConfig
from ssd_tpu.ops.matching import match_anchors
from ssd_tpu.ops.targets import create_targets

CFG = MatcherConfig()


def test_perfect_overlap_is_positive():
    anchors = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]], np.float32)
    gt = np.array([[[0.1, 0.1, 0.3, 0.3]]], np.float32)  # matches anchor 0
    num = np.array([1], np.int32)
    m = np.asarray(match_anchors(anchors, gt, num, CFG))
    assert m[0, 0] == 0
    assert m[0, 1] == -1  # far anchor is negative


def test_ignore_band():
    # IoU of [0,0,1,0.45] vs gt [0,0,1,1] = 0.45 -> ignore band [0.4, 0.5)
    anchors = np.array([[0.0, 0.0, 1.0, 0.45]], np.float32)
    gt = np.array([[[0.0, 0.0, 1.0, 1.0]]], np.float32)
    m = np.asarray(match_anchors(anchors, gt, np.array([1], np.int32),
                                 MatcherConfig(force_match_for_each_gt=False)))
    assert m[0, 0] == -2


def test_force_match_rescues_unmatched_gt():
    # gt whose best anchor IoU < 0.5 still gets matched via force-match
    anchors = np.array([[0.0, 0.0, 1.0, 0.45], [0.0, 0.0, 0.1, 0.1]], np.float32)
    gt = np.array([[[0.0, 0.0, 1.0, 1.0]]], np.float32)
    num = np.array([1], np.int32)
    m = np.asarray(match_anchors(anchors, gt, num, CFG))
    assert m[0, 0] == 0  # forced positive despite IoU 0.45
    no_force = np.asarray(
        match_anchors(anchors, gt, num, MatcherConfig(force_match_for_each_gt=False))
    )
    assert no_force[0, 0] == -2


def test_padded_gt_never_matches():
    anchors = np.array([[0.4, 0.4, 0.6, 0.6]], np.float32)
    gt = np.zeros((1, 5, 4), np.float32)
    gt[0, 0] = [0.4, 0.4, 0.6, 0.6]
    # paddings are all-zero boxes at index 1..4
    m = np.asarray(match_anchors(anchors, gt, np.array([1], np.int32), CFG))
    assert m[0, 0] == 0
    # with zero valid boxes everything is negative (force-match must not fire)
    m0 = np.asarray(match_anchors(anchors, gt, np.array([0], np.int32), CFG))
    assert m0[0, 0] == -1


def test_every_valid_gt_has_an_anchor(rng):
    cfg = Config(image_size=128)
    from ssd_tpu.ops.anchors import generate_anchors
    anchors = generate_anchors(cfg.image_size, cfg.anchors)
    n, mx = 4, 10
    gt = np.zeros((n, mx, 4), np.float32)
    num = rng.integers(1, mx, size=n).astype(np.int32)
    for i in range(n):
        for j in range(num[i]):
            y0, x0 = rng.uniform(0, 0.6, 2)
            gt[i, j] = [y0, x0, y0 + rng.uniform(0.1, 0.4), x0 + rng.uniform(0.1, 0.4)]
    m = np.asarray(match_anchors(anchors, gt, num, CFG))
    for i in range(n):
        matched = set(m[i][m[i] >= 0].tolist())
        assert set(range(num[i])) <= matched


def test_targets_shapes_and_masks(rng):
    cfg = Config(image_size=128, num_classes=5)
    from ssd_tpu.ops.anchors import generate_anchors
    anchors = generate_anchors(cfg.image_size, cfg.anchors)
    n, mx = 2, 8
    gt = np.zeros((n, mx, 4), np.float32)
    labels = np.zeros((n, mx), np.int32)
    gt[0, 0] = [0.2, 0.2, 0.5, 0.5]
    labels[0, 0] = 3
    num = np.array([1, 0], np.int32)
    t = create_targets(anchors, gt, labels, num, cfg.num_classes, cfg.matcher)
    a = anchors.shape[0]
    assert t.reg_targets.shape == (n, a, 4)
    assert t.cls_targets.shape == (n, a, 5)
    # image 1 has no gt: no positives anywhere
    assert float(np.sum(np.asarray(t.reg_weights)[1])) == 0.0
    # image 0: positives carry one-hot class 3
    pos = np.asarray(t.reg_weights)[0] > 0
    assert pos.sum() >= 1
    cls = np.asarray(t.cls_targets)[0][pos]
    assert np.all(cls[:, 3] == 1.0)
    assert np.all(cls.sum(-1) == 1.0)
    # negative anchors have all-zero one-hot but weight 1
    neg = np.asarray(t.matches)[0] == -1
    assert np.all(np.asarray(t.cls_targets)[0][neg].sum(-1) == 0.0)
    assert np.all(np.asarray(t.cls_weights)[0][neg] == 1.0)
    # ignored anchors have zero cls weight
    ign = np.asarray(t.matches)[0] == -2
    if ign.any():
        assert np.all(np.asarray(t.cls_weights)[0][ign] == 0.0)


def test_reg_targets_roundtrip_through_decode(rng):
    from ssd_tpu.ops import box_utils
    cfg = Config(image_size=128)
    from ssd_tpu.ops.anchors import generate_anchors
    anchors = generate_anchors(cfg.image_size, cfg.anchors)
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [0.25, 0.25, 0.55, 0.6]
    labels = np.zeros((1, 4), np.int32)
    num = np.array([1], np.int32)
    t = create_targets(anchors, gt, labels, num, 3, cfg.matcher)
    pos = np.asarray(t.reg_weights)[0] > 0
    decoded = np.asarray(box_utils.decode(t.reg_targets[0], anchors))[pos]
    np.testing.assert_allclose(decoded, np.tile(gt[0, 0], (pos.sum(), 1)), atol=1e-4)


def test_use_pallas_settings_agree_off_tpu(rng):
    """The matcher backend switch never changes results on CPU.

    "auto" and True both fall back to the jnp matcher off-TPU (the kernel
    needs Mosaic); all three settings must produce identical targets. The
    on-TPU kernel-vs-jnp parity is covered by test_matching_pallas.
    """
    anchors = rng.uniform(0.0, 1.0, (200, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + 0.1
    gt = np.zeros((2, 5, 4), np.float32)
    gt[0, 0] = [0.1, 0.1, 0.4, 0.4]
    gt[1, 0] = [0.5, 0.5, 0.9, 0.9]
    gt[1, 1] = [0.0, 0.0, 0.2, 0.2]
    labels = np.zeros((2, 5), np.int32)
    num = np.array([1, 2], np.int32)

    outs = []
    for up in ("auto", True, False):
        cfg = MatcherConfig(use_pallas=up)
        t = create_targets(anchors, gt, labels, num, 3, cfg)
        outs.append(np.asarray(t.matches))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
