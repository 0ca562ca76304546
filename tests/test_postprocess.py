"""Candidate pre-selection + full postprocess path tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config, NMSConfig
from ssd_tpu.ops.postprocess import postprocess_detections, select_candidates
from ssd_tpu.ops.anchors import generate_anchors


def _fake_outputs(rng, n, a, c):
    logits = rng.normal(-4.0, 1.0, (n, a, c)).astype(np.float32)
    # plant some confident detections
    for i in range(n):
        for j in rng.integers(0, a, 10):
            logits[i, j, rng.integers(0, c)] = rng.uniform(2.0, 6.0)
    deltas = rng.normal(0, 0.5, (n, a, 4)).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(deltas)


def test_select_candidates_keeps_confident_anchors(rng):
    cfg = Config(num_classes=6, image_size=128)
    anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
    a = anchors.shape[0]
    logits, deltas = _fake_outputs(rng, 2, a, 6)
    nms_cfg = NMSConfig(num_candidates=256)
    boxes, scores = select_candidates(logits, deltas, anchors, nms_cfg,
                                      exact=True)
    assert boxes.shape == (2, 256, 4)
    assert scores.shape == (2, 256, 6)
    # the globally most confident anchor must be among the candidates
    best_global = float(jax.nn.sigmoid(logits.max()))
    np.testing.assert_allclose(float(scores.max()), best_global, rtol=1e-5)
    # all candidate boxes valid
    b = np.asarray(boxes)
    assert np.all(b >= 0) and np.all(b <= 1)


def test_postprocess_pallas_matches_jnp(rng):
    cfg = Config(num_classes=6, image_size=128)
    anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
    a = anchors.shape[0]
    logits, deltas = _fake_outputs(rng, 2, a, 6)
    nms_cfg = NMSConfig(num_candidates=256, pre_nms_top_k=128, max_boxes=50)

    ref = postprocess_detections(logits, deltas, anchors, nms_cfg,
                                 use_pallas=False, exact_topk=True)
    ker = postprocess_detections(logits, deltas, anchors, nms_cfg,
                                 use_pallas=True, interpret=True,
                                 exact_topk=True)
    np.testing.assert_array_equal(np.asarray(ref.num_boxes),
                                  np.asarray(ker.num_boxes))
    nb = int(ref.num_boxes.max())
    np.testing.assert_allclose(np.asarray(ref.scores)[:, :nb],
                               np.asarray(ker.scores)[:, :nb], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.labels)[:, :nb],
                                  np.asarray(ker.labels)[:, :nb])
    np.testing.assert_allclose(np.asarray(ref.boxes)[:, :nb],
                               np.asarray(ker.boxes)[:, :nb], atol=1e-6)


def test_postprocess_respects_score_threshold(rng):
    cfg = Config(num_classes=4, image_size=128)
    anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
    a = anchors.shape[0]
    logits = jnp.full((1, a, 4), -10.0)  # nothing confident
    deltas = jnp.zeros((1, a, 4))
    nms_cfg = NMSConfig(score_threshold=0.3, num_candidates=128)
    det = postprocess_detections(logits, deltas, anchors, nms_cfg,
                                 exact_topk=True)
    assert int(det.num_boxes[0]) == 0


def test_pyramid_path_matches_flat_path(rng):
    """Per-level candidate selection == flatten-then-select (same NMS)."""
    import jax
    from ssd_tpu.config import ModelConfig
    from ssd_tpu.models.detector import Detector, normalize_images
    from ssd_tpu.ops.postprocess import postprocess_pyramid

    cfg = Config(
        num_classes=6, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
        nms=NMSConfig(score_threshold=0.01, max_boxes=20, num_candidates=64,
                      pre_nms_top_k=32),
    )
    det = Detector(cfg)
    v = det.init(jax.random.PRNGKey(1))
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))

    x = normalize_images(images, jnp.float32)
    logits, deltas = det.apply(v, x)
    flat = postprocess_detections(logits, deltas, det.anchors, cfg.nms,
                                  exact_topk=True)

    raw = det.model.apply(v, x, train=False, flatten=False)
    pyr = postprocess_pyramid(raw, det.anchors, cfg.num_classes, cfg.nms,
                              exact_topk=True)

    np.testing.assert_array_equal(np.asarray(flat.num_boxes),
                                  np.asarray(pyr.num_boxes))
    nb = int(flat.num_boxes.max())
    np.testing.assert_allclose(np.asarray(flat.scores)[:, :nb],
                               np.asarray(pyr.scores)[:, :nb], atol=1e-6)
    np.testing.assert_allclose(np.asarray(flat.boxes)[:, :nb],
                               np.asarray(pyr.boxes)[:, :nb], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(flat.labels)[:, :nb],
                                  np.asarray(pyr.labels)[:, :nb])


def test_cells_path_matches_flat_path(rng):
    """Cell-major selection (the default serving path) == flatten-then-
    select on sparse detections, where both paths keep every hot anchor.

    Sparse is the realistic regime: selection granularity (cells vs
    anchors) only diverges when more than Q_cells cells carry
    above-threshold anchors, i.e. when candidates overflow either way.
    """
    from ssd_tpu.ops.postprocess import postprocess_cells

    cfg = Config(num_classes=8, image_size=128)
    anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
    k = cfg.anchors.num_anchors_per_cell
    c = cfg.num_classes
    sizes = cfg.feature_map_sizes()
    n = 3

    raw = []
    for (h, w) in sizes:
        cls = np.full((n, h, w, k * c), -10.0, np.float32)
        box = rng.normal(0, 0.3, (n, h, w, k * 4)).astype(np.float32)
        raw.append([cls, box])
    for i in range(n):  # ~60 hot anchors per image, random cells/classes
        for _ in range(60):
            li = rng.integers(0, len(sizes))
            h, w = sizes[li]
            y, x = rng.integers(0, h), rng.integers(0, w)
            a, cc = rng.integers(0, k), rng.integers(0, c)
            raw[li][0][i, y, x, a * c + cc] = rng.normal(1.0, 1.0)
    raw = [(jnp.asarray(cl), jnp.asarray(bx)) for cl, bx in raw]
    logits = jnp.concatenate([cl.reshape(n, -1, c) for cl, _ in raw], 1)
    deltas = jnp.concatenate([bx.reshape(n, -1, 4) for _, bx in raw], 1)

    flat = postprocess_detections(logits, deltas, anchors, cfg.nms,
                                  exact_topk=True)
    cells = postprocess_cells(raw, anchors, c, cfg.nms)

    np.testing.assert_array_equal(np.asarray(flat.num_boxes),
                                  np.asarray(cells.num_boxes))
    for i in range(n):
        nb = int(flat.num_boxes[i])
        fs = sorted(zip(np.round(np.asarray(flat.scores[i, :nb]), 5),
                        np.asarray(flat.labels[i, :nb]),
                        map(tuple, np.round(np.asarray(flat.boxes[i, :nb]), 5))))
        cs = sorted(zip(np.round(np.asarray(cells.scores[i, :nb]), 5),
                        np.asarray(cells.labels[i, :nb]),
                        map(tuple, np.round(np.asarray(cells.boxes[i, :nb]), 5))))
        assert fs == cs


def test_cells_refine_full_overprovision_equals_exact_flat(rng):
    """Two-stage cell selection with overprovision covering ALL cells must
    reduce to the exact global top-Q anchor selection: the refine stage's
    top_k then sees every anchor, so its survivors equal the flat path's
    exact top-Q (VERDICT r2 #2 / BENCHMARKS round-3 refinement)."""
    import dataclasses

    from ssd_tpu.ops.postprocess import postprocess_cells

    cfg = Config(num_classes=6, image_size=64)
    nms = dataclasses.replace(cfg.nms, num_candidates=96, pre_nms_top_k=48,
                              cell_overprovision=1e9)  # all cells survive
    anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
    k = cfg.anchors.num_anchors_per_cell
    c = cfg.num_classes
    sizes = cfg.feature_map_sizes()
    n = 2

    raw = []
    for (h, w) in sizes:
        # DENSE random logits: many competing cells — the regime where
        # single-stage cell selection diverges from anchor selection
        cls = rng.normal(-2.0, 2.0, (n, h, w, k * c)).astype(np.float32)
        box = rng.normal(0, 0.3, (n, h, w, k * 4)).astype(np.float32)
        raw.append((jnp.asarray(cls), jnp.asarray(box)))
    logits = jnp.concatenate([cl.reshape(n, -1, c) for cl, _ in raw], 1)
    deltas = jnp.concatenate([bx.reshape(n, -1, 4) for _, bx in raw], 1)

    flat = postprocess_detections(logits, deltas, anchors, nms,
                                  exact_topk=True)
    cells = postprocess_cells(raw, anchors, c, nms)

    np.testing.assert_array_equal(np.asarray(flat.num_boxes),
                                  np.asarray(cells.num_boxes))
    for i in range(n):
        nb = int(flat.num_boxes[i])
        fs = sorted(zip(np.round(np.asarray(flat.scores[i, :nb]), 5),
                        np.asarray(flat.labels[i, :nb]),
                        map(tuple, np.round(np.asarray(flat.boxes[i, :nb]), 5))))
        cs = sorted(zip(np.round(np.asarray(cells.scores[i, :nb]), 5),
                        np.asarray(cells.labels[i, :nb]),
                        map(tuple, np.round(np.asarray(cells.boxes[i, :nb]), 5))))
        assert fs == cs
