"""Rectangular (non-square) input resolutions.

The reference only supports square inputs (config ``image_size`` int);
this framework additionally accepts an explicit (height, width) pair —
anchors normalize per axis, every consumer derives shapes from
``Config.image_hw()``, and the serving letterbox maps boxes back through
per-axis valid fractions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector, normalize_images
from ssd_tpu.ops.anchors import anchor_counts_per_level, generate_anchors

RECT = Config(
    num_classes=3,
    image_size=(64, 128),
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    nms=NMSConfig(score_threshold=0.1, max_boxes=10, num_candidates=64,
                  pre_nms_top_k=32),
)


def test_config_shapes():
    assert RECT.image_hw() == (64, 128)
    for (fh, fw), stride in zip(RECT.feature_map_sizes(),
                                RECT.anchors.strides):
        assert fh == -(-64 // stride) and fw == -(-128 // stride)
    # json round trip keeps the pair
    rt = Config.from_json(RECT.to_json())
    assert rt.image_hw() == (64, 128)
    # square int form unchanged
    assert Config(image_size=64).image_hw() == (64, 64)


def test_anchor_generation_rectangular():
    a = generate_anchors((64, 128), RECT.anchors)
    counts = anchor_counts_per_level((64, 128), RECT.anchors)
    assert a.shape == (sum(counts), 4)
    assert a.shape[0] == RECT.num_anchors()
    # anchor centers cover both axes in normalized coords (coarse levels
    # may put their single cell center exactly at 1.0 on the short axis)
    cy = (a[:, 0] + a[:, 2]) / 2
    cx = (a[:, 1] + a[:, 3]) / 2
    assert 0.0 < cy.min() and cy.max() <= 1.0 + 1e-6
    assert 0.0 < cx.min() and cx.max() <= 1.0 + 1e-6
    # the same anchor grid cell is square in PIXELS: denormalizing the
    # first anchor's extents by (H, W) must give equal pixel h/w (aspect 1)
    h_pix = (a[0, 2] - a[0, 0]) * 64
    w_pix = (a[0, 3] - a[0, 1]) * 128
    np.testing.assert_allclose(h_pix, w_pix, rtol=1e-5)


def test_rectangular_forward_and_predict():
    det = Detector(RECT)
    variables = det.init(jax.random.PRNGKey(0))
    images = normalize_images(jnp.zeros((2, 64, 128, 3), jnp.uint8))
    logits, deltas = det.apply(variables, images)
    assert logits.shape == (2, RECT.num_anchors(), 3)
    assert deltas.shape == (2, RECT.num_anchors(), 4)

    out = det.predict(variables, jnp.zeros((1, 64, 128, 3), jnp.uint8))
    assert out.boxes.shape == (1, 10, 4)


def test_rectangular_loss_per_level_matches_flat():
    flat = dataclasses.replace(
        RECT, losses=dataclasses.replace(RECT.losses, per_level=False))
    det_flat, det_lvl = Detector(flat), Detector(RECT)
    variables = det_flat.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (2, 64, 128, 3)).astype(np.uint8),
        "boxes": np.tile(np.asarray(
            [[[0.2, 0.1, 0.7, 0.4]]], np.float32), (2, 1, 1)),
        "labels": np.ones((2, 1), np.int32),
        "num_boxes": np.ones((2,), np.int32),
    }
    lf = float(det_flat.loss(variables, batch, train=False)[0])
    ll = float(det_lvl.loss(variables, batch, train=False)[0])
    np.testing.assert_allclose(lf, ll, rtol=1e-4)


def test_rectangular_predictor_letterbox():
    from ssd_tpu.predictor import Predictor, letterbox_image

    canvas, fh, fw = letterbox_image(
        np.zeros((100, 100, 3), np.uint8), (64, 128))
    assert canvas.shape == (64, 128, 3)
    # square image into a 2:1 canvas: height-limited
    np.testing.assert_allclose(fh, 1.0)
    np.testing.assert_allclose(fw, 0.5)

    det = Detector(RECT)
    p = Predictor(RECT, det.init(jax.random.PRNGKey(0)))
    out = p.predict(np.zeros((100, 100, 3), np.uint8))
    assert out["boxes"].shape == (10, 4)
    assert int(out["num_boxes"]) >= 0
