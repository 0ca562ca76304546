import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config, LossConfig
from ssd_tpu.ops import losses
from ssd_tpu.ops.targets import Targets, create_targets


def test_focal_matches_hand_computation():
    logits = np.array([[2.0, -1.0]], np.float32)
    targets = np.array([[1.0, 0.0]], np.float32)
    alpha, gamma = 0.25, 2.0
    got = np.asarray(losses.sigmoid_focal_loss(logits, targets, alpha, gamma))

    p = 1 / (1 + np.exp(-logits))
    pt = p * targets + (1 - p) * (1 - targets)
    at = alpha * targets + (1 - alpha) * (1 - targets)
    want = -at * (1 - pt) ** gamma * np.log(pt)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_focal_reduces_to_weighted_bce_at_gamma0():
    logits = np.linspace(-3, 3, 7, dtype=np.float32)[None]
    targets = (np.arange(7) % 2).astype(np.float32)[None]
    got = np.asarray(losses.sigmoid_focal_loss(logits, targets, 0.5, 0.0))
    p = 1 / (1 + np.exp(-logits))
    bce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    np.testing.assert_allclose(got, 0.5 * bce, atol=1e-5)


def test_focal_downweights_easy_examples():
    easy = losses.sigmoid_focal_loss(
        jnp.array([[8.0]]), jnp.array([[1.0]]), 0.25, 2.0
    )
    hard = losses.sigmoid_focal_loss(
        jnp.array([[-8.0]]), jnp.array([[1.0]]), 0.25, 2.0
    )
    assert float(easy[0, 0]) < 1e-6
    assert float(hard[0, 0]) > 1.0


def test_focal_is_stable_for_extreme_logits():
    out = losses.sigmoid_focal_loss(
        jnp.array([[500.0, -500.0]]), jnp.array([[0.0, 1.0]]), 0.25, 2.0
    )
    assert np.all(np.isfinite(np.asarray(out)))
    g = jax.grad(
        lambda x: jnp.sum(losses.sigmoid_focal_loss(x, jnp.ones_like(x), 0.25, 2.0))
    )(jnp.array([[500.0, -500.0]]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_smooth_l1():
    pred = jnp.array([0.0, 0.5, 2.0])
    tgt = jnp.zeros(3)
    got = np.asarray(losses.smooth_l1_loss(pred, tgt, 1.0))
    np.testing.assert_allclose(got, [0.0, 0.125, 1.5], atol=1e-6)


def _tiny_targets(num_classes=3):
    n, a = 2, 6
    reg_t = np.zeros((n, a, 4), np.float32)
    reg_t[0, 0] = [0.1, -0.2, 0.3, 0.4]
    cls_t = np.zeros((n, a, num_classes), np.float32)
    cls_t[0, 0, 1] = 1.0
    cls_w = np.ones((n, a), np.float32)
    cls_w[0, 1] = 0.0  # ignored anchor
    reg_w = np.zeros((n, a), np.float32)
    reg_w[0, 0] = 1.0
    matches = np.full((n, a), -1, np.int32)
    matches[0, 0] = 0
    matches[0, 1] = -2
    return Targets(*map(jnp.asarray, (reg_t, cls_t, cls_w, reg_w, matches)))


def test_detection_loss_ignores_masked_anchors():
    t = _tiny_targets()
    cfg = LossConfig()
    logits = np.zeros((2, 6, 3), np.float32)
    deltas = np.zeros((2, 6, 4), np.float32)

    base = losses.detection_loss(jnp.asarray(logits), jnp.asarray(deltas), t, cfg)

    # perturb ONLY the ignored anchor's logits -> loss unchanged
    logits2 = logits.copy()
    logits2[0, 1] = 50.0
    pert = losses.detection_loss(jnp.asarray(logits2), jnp.asarray(deltas), t, cfg)
    np.testing.assert_allclose(float(base.total), float(pert.total), rtol=1e-6)

    # perturb a negative anchor -> classification loss increases
    logits3 = logits.copy()
    logits3[1, 3] = 5.0
    pert3 = losses.detection_loss(jnp.asarray(logits3), jnp.asarray(deltas), t, cfg)
    assert float(pert3.classification) > float(base.classification)

    # localization only counts positives
    deltas2 = deltas.copy()
    deltas2[1, 2] = 9.0  # negative anchor regression is free
    pert4 = losses.detection_loss(jnp.asarray(logits), jnp.asarray(deltas2), t, cfg)
    np.testing.assert_allclose(
        float(base.localization), float(pert4.localization), rtol=1e-6
    )


def test_loss_normalized_by_positives():
    t = _tiny_targets()
    cfg = LossConfig()
    logits = jnp.zeros((2, 6, 3))
    deltas = jnp.zeros((2, 6, 4))
    out = losses.detection_loss(logits, deltas, t, cfg)
    assert float(out.num_positives) == 1.0
    assert np.isfinite(float(out.total))


def test_ohem_selects_hard_negatives():
    t = _tiny_targets()
    cfg = LossConfig(use_ohem=True, ohem_neg_ratio=1.0, ohem_min_negatives=1)
    # one negative anchor with huge loss, others tiny
    logits = np.full((2, 6, 3), -8.0, np.float32)  # easy negatives
    logits[0, 2] = 8.0  # hard negative
    out = losses.detection_loss(
        jnp.asarray(logits), jnp.zeros((2, 6, 4)), t, cfg
    )
    # hard negative dominates: loss must be large
    assert float(out.classification) > 1.0
    # and ignoring easy negatives keeps it close to (pos + hard neg) only
    cfg_all = LossConfig(use_ohem=False)
    out_all = losses.detection_loss(
        jnp.asarray(logits), jnp.zeros((2, 6, 4)), t, cfg_all
    )
    assert float(out.classification) <= float(out_all.classification) + 1e-5


def test_l2_regularization_skips_biases():
    params = {
        "kernel": jnp.ones((3, 3)),
        "bias": jnp.ones((7,)) * 100.0,
    }
    got = float(losses.l2_regularization(params, 2.0))
    np.testing.assert_allclose(got, 0.5 * 2.0 * 9.0, rtol=1e-6)


def test_per_level_loss_matches_flat():
    """detection_loss_levels == detection_loss through the full Detector
    (values AND gradients) — the per-level path is a layout optimization,
    not a different loss."""
    import dataclasses

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.models.detector import Detector

    base = Config(
        num_classes=3, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
    )
    flat = dataclasses.replace(base, losses=LossConfig(per_level=False))
    lvl = dataclasses.replace(base, losses=LossConfig(per_level=True))

    rng = np.random.default_rng(0)
    n, m = 2, 4
    batch = {
        "images": rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8),
        "boxes": np.array([[[0.1, 0.1, 0.6, 0.5]] + [[0.0] * 4] * (m - 1),
                           [[0.3, 0.2, 0.9, 0.8]] + [[0.0] * 4] * (m - 1)],
                          np.float32),
        "labels": np.zeros((n, m), np.int32),
        "num_boxes": np.ones((n,), np.int32),
    }
    batch["labels"][0, 0] = 1
    batch["labels"][1, 0] = 2

    det_flat, det_lvl = Detector(flat), Detector(lvl)
    variables = det_flat.init(jax.random.PRNGKey(0))

    def total(det, v):
        return det.loss(v, batch, train=False)[0]

    l_flat, g_flat = jax.value_and_grad(lambda v: total(det_flat, v))(variables)
    l_lvl, g_lvl = jax.value_and_grad(lambda v: total(det_lvl, v))(variables)
    np.testing.assert_allclose(float(l_flat), float(l_lvl), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_flat, g_lvl,
    )

    # OHEM variant goes through the same per-anchor concat path
    flat_o = dataclasses.replace(
        base, losses=LossConfig(per_level=False, use_ohem=True))
    lvl_o = dataclasses.replace(
        base, losses=LossConfig(per_level=True, use_ohem=True))
    lo = float(total(Detector(flat_o), variables))
    ll = float(total(Detector(lvl_o), variables))
    np.testing.assert_allclose(lo, ll, rtol=1e-5)


# ------------------------------------------------------- IoU-family box loss

def test_iou_box_loss_properties():
    """Analytic checks for giou/diou/ciou (aligned, corner-form)."""
    a = jnp.array([[0.2, 0.2, 0.6, 0.6]])
    same = losses.iou_box_loss(a, a, "giou")
    np.testing.assert_allclose(np.asarray(same), [0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.iou_box_loss(a, a, "diou")), [0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.iou_box_loss(a, a, "ciou")), [0.0], atol=1e-6)

    # disjoint: iou 0, giou penalty grows with separation, stays < 2
    near = jnp.array([[0.2, 0.65, 0.6, 0.9]])
    far = jnp.array([[0.2, 0.9, 0.6, 1.0]])
    g_near = float(losses.iou_box_loss(a, near, "giou")[0])
    g_far = float(losses.iou_box_loss(a, far, "giou")[0])
    assert 1.0 < g_near < g_far < 2.0

    # concentric boxes: diou == giou == 1 - iou (no center/area penalty ...
    # enclosing box == outer box, center distance 0)
    outer = jnp.array([[0.1, 0.1, 0.7, 0.7]])
    g = float(losses.iou_box_loss(outer, a, "giou")[0])
    d = float(losses.iou_box_loss(outer, a, "diou")[0])
    iou = (0.4 * 0.4) / (0.6 * 0.6)
    np.testing.assert_allclose([g, d], [1 - iou, 1 - iou], atol=1e-6)

    # hand-checked diou: unit-separated same-size boxes
    b1 = jnp.array([[0.0, 0.0, 0.2, 0.2]])
    b2 = jnp.array([[0.0, 0.4, 0.2, 0.6]])
    # enclosing box (0,0,0.2,0.6): c2 = 0.04+0.36=0.40; d2 = 0.4^2=0.16
    np.testing.assert_allclose(
        float(losses.iou_box_loss(b1, b2, "diou")[0]), 1.0 + 0.16 / 0.40,
        atol=1e-6)


def test_iou_box_loss_gradients_finite_on_degenerates():
    """Zero-area and coincident boxes must not produce nan/inf grads."""
    pred = jnp.array([[0.2, 0.2, 0.2, 0.2],   # zero area
                      [0.1, 0.1, 0.5, 0.5],   # exact match
                      [0.0, 0.0, 1.0, 1.0]])
    tgt = jnp.array([[0.2, 0.2, 0.4, 0.4],
                     [0.1, 0.1, 0.5, 0.5],
                     [0.0, 0.0, 1.0, 1.0]])
    for kind in ("giou", "diou", "ciou"):
        g = jax.grad(lambda p: jnp.sum(losses.iou_box_loss(p, tgt, kind)))(pred)
        assert np.isfinite(np.asarray(g)).all(), kind


def test_giou_per_level_matches_flat_ops_level():
    """Fast ops-level version of the detector soak below: the per-level
    loss layout must be a pure layout optimization for giou (values AND
    gradients wrt the raw head maps), with no conv stack in the way."""
    from ssd_tpu.config import MatcherConfig

    n, k, c = 2, 2, 3
    level_hw = [(4, 4), (2, 2)]
    a_total = sum(h * w * k for h, w in level_hw)

    rng = np.random.default_rng(0)
    # plausible anchors: centers on the level grids, fixed extents
    anchors = []
    for h, w in level_hw:
        cy, cx = np.meshgrid(np.linspace(0.1, 0.9, h),
                             np.linspace(0.1, 0.9, w), indexing="ij")
        for s in (0.15, 0.3)[:k]:
            anchors.append(np.stack([cy - s, cx - s, cy + s, cx + s],
                                    -1).reshape(-1, 4))
    anchors = jnp.asarray(np.concatenate(anchors, 0).astype(np.float32))
    assert anchors.shape == (a_total, 4)

    gt_boxes = jnp.asarray(np.array(
        [[[0.1, 0.1, 0.6, 0.5], [0.4, 0.4, 0.9, 0.9]],
         [[0.3, 0.2, 0.9, 0.8], [0.0, 0.0, 0.0, 0.0]]], np.float32))
    gt_labels = jnp.asarray(np.array([[0, 2], [1, 0]], np.int32))
    num_boxes = jnp.asarray(np.array([2, 1], np.int32))
    cfg = LossConfig(box_loss="giou")
    mcfg = MatcherConfig()

    t_flat = create_targets(anchors, gt_boxes, gt_labels, num_boxes, c,
                            mcfg, class_onehot=True)
    t_lvl = create_targets(anchors, gt_boxes, gt_labels, num_boxes, c,
                           mcfg, class_onehot=False)

    raw = [(jnp.asarray(rng.normal(size=(n, h, w, k * c)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, h, w, k * 4)) * 0.3,
                        jnp.float32)) for h, w in level_hw]

    def flat_total(raw_levels):
        logits = jnp.concatenate(
            [cm.reshape(n, -1, c) for cm, _ in raw_levels], 1)
        deltas = jnp.concatenate(
            [bm.reshape(n, -1, 4) for _, bm in raw_levels], 1)
        return losses.detection_loss(logits, deltas, t_flat, cfg,
                                     anchors=anchors).total

    def lvl_total(raw_levels):
        return losses.detection_loss_levels(raw_levels, t_lvl, c, cfg,
                                            anchors=anchors).total

    l_flat, g_flat = jax.value_and_grad(flat_total)(raw)
    l_lvl, g_lvl = jax.value_and_grad(lvl_total)(raw)
    assert float(l_flat) > 0.0
    np.testing.assert_allclose(float(l_flat), float(l_lvl), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_flat, g_lvl)


def test_giou_per_level_matches_flat():
    """The per-level layout must stay a pure layout optimization for the
    IoU-family losses too (values and gradients)."""
    import dataclasses

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.models.detector import Detector

    base = Config(
        num_classes=3, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
    )
    flat = dataclasses.replace(
        base, losses=LossConfig(per_level=False, box_loss="giou"))
    lvl = dataclasses.replace(
        base, losses=LossConfig(per_level=True, box_loss="giou"))

    rng = np.random.default_rng(1)
    n, m = 2, 4
    batch = {
        "images": rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8),
        "boxes": np.array([[[0.1, 0.1, 0.6, 0.5]] + [[0.0] * 4] * (m - 1),
                           [[0.3, 0.2, 0.9, 0.8]] + [[0.0] * 4] * (m - 1)],
                          np.float32),
        "labels": np.zeros((n, m), np.int32),
        "num_boxes": np.ones((n,), np.int32),
    }

    det_flat, det_lvl = Detector(flat), Detector(lvl)
    variables = det_flat.init(jax.random.PRNGKey(0))

    l_flat, g_flat = jax.value_and_grad(
        lambda v: det_flat.loss(v, batch, train=False)[0])(variables)
    l_lvl, g_lvl = jax.value_and_grad(
        lambda v: det_lvl.loss(v, batch, train=False)[0])(variables)
    assert float(l_flat) > 0.0
    np.testing.assert_allclose(float(l_flat), float(l_lvl), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_flat, g_lvl,
    )


def test_decoded_target_recovers_gt_box():
    """encode/decode round-trip: the IoU loss's decoded target IS the
    matched ground-truth box, so a perfect prediction scores exactly 0."""
    from ssd_tpu.ops import box_utils

    anchors = jnp.array([[0.1, 0.1, 0.4, 0.5], [0.5, 0.5, 0.9, 0.8]])
    gt = jnp.array([[0.15, 0.12, 0.45, 0.52], [0.48, 0.55, 0.88, 0.79]])
    codes = box_utils.encode(gt, anchors)
    np.testing.assert_allclose(
        np.asarray(losses.iou_box_loss(box_utils.decode(codes, anchors), gt,
                                       "giou")),
        np.zeros(2), atol=1e-5)
