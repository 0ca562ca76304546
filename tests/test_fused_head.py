"""Fused logits+max head (ops/fused_head.py) vs the unfused path."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector, normalize_images
from ssd_tpu.ops.fused_head import fused_head_detections, fused_logit_max
from ssd_tpu.ops.postprocess import postprocess_detections

CFG = Config(
    num_classes=6, image_size=64,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32",
                      head_final_kernel=1),
    nms=NMSConfig(score_threshold=0.01, max_boxes=20, num_candidates=64,
                  pre_nms_top_k=32),
)


def test_fused_logit_max_matches_matmul(rng):
    n, cells, ch, k, c = 2, 100, 32, 9, 6
    trunk = jnp.asarray(rng.normal(0, 1, (n, cells, ch)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (ch, k * c)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (k * c,)).astype(np.float32))

    got = fused_logit_max(trunk, w, b, k, interpret=True)  # (n, cells*k)
    want = (
        (trunk.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16))
        .astype(jnp.float32) + b
    ).reshape(n, cells, k, c).max(-1).reshape(n, cells * k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_fused_head_matches_unfused_detections(rng):
    det = Detector(CFG)
    v = det.init(jax.random.PRNGKey(2))
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    x = normalize_images(images, jnp.float32)

    logits, deltas = det.apply(v, x)  # unfused flatten path, same weights
    flat = postprocess_detections(logits, deltas, det.anchors, CFG.nms,
                                  exact_topk=True)

    cls_trunk, box_trunk = det.model.apply(v, x, train=False, trunk_only=True)
    fused = fused_head_detections(
        cls_trunk, box_trunk, v["params"]["head"], det.anchors,
        CFG.num_classes, CFG.anchors.num_anchors_per_cell, CFG.nms,
        interpret=True, exact_topk=True,
    )

    np.testing.assert_array_equal(np.asarray(flat.num_boxes),
                                  np.asarray(fused.num_boxes))
    nb = int(flat.num_boxes.max())
    np.testing.assert_array_equal(np.asarray(flat.labels)[:, :nb],
                                  np.asarray(fused.labels)[:, :nb])
    np.testing.assert_allclose(np.asarray(flat.scores)[:, :nb],
                               np.asarray(fused.scores)[:, :nb], atol=5e-3)
    np.testing.assert_allclose(np.asarray(flat.boxes)[:, :nb],
                               np.asarray(fused.boxes)[:, :nb], atol=5e-3)


def test_fused_predict_contract(rng):
    det = Detector(CFG)
    v = det.init(jax.random.PRNGKey(2))
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    out = jax.jit(det.predict)(v, images)
    assert out.boxes.shape == (2, CFG.nms.max_boxes, 4)
    assert np.all(np.asarray(out.boxes) >= 0)
    assert np.all(np.asarray(out.boxes) <= 1)


def test_final_kernel_3_unchanged(rng):
    # default config path must not route through the fused head
    cfg3 = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, head_final_kernel=3))
    det = Detector(cfg3)
    v = det.init(jax.random.PRNGKey(0))
    out = jax.jit(det.predict)(
        v, jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert out.boxes.shape == (1, CFG.nms.max_boxes, 4)
