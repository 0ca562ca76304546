import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.config import Config, ModelConfig
from ssd_tpu.models.detector import Detector, normalize_images

SMALL = Config(
    num_classes=4,
    image_size=128,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
)


def _batch_images(n, s):
    return np.zeros((n, s, s, 3), np.uint8)


def test_forward_shapes():
    det = Detector(SMALL)
    variables = det.init(jax.random.PRNGKey(0))
    images = normalize_images(jnp.asarray(_batch_images(2, 128)))
    logits, deltas = det.apply(variables, images)
    a = SMALL.num_anchors()
    assert logits.shape == (2, a, 4)
    assert deltas.shape == (2, a, 4)
    assert logits.dtype == jnp.float32


def test_class_prior_bias_init():
    det = Detector(SMALL)
    variables = det.init(jax.random.PRNGKey(0))
    images = normalize_images(jnp.asarray(_batch_images(1, 128)))
    logits, _ = det.apply(variables, images)
    probs = np.asarray(jax.nn.sigmoid(logits))
    # RetinaNet prior: initial foreground probability ~= 0.01
    assert 0.001 < probs.mean() < 0.05


@pytest.mark.parametrize("backbone,mult", [
    ("mobilenet", 0.25), ("mobilenet_v2", 0.25), ("shufflenet", 0.5),
    ("resnet50", 1.0), ("efficientnet_lite", 0.25),
])
def test_all_backbones_forward(backbone, mult):
    cfg = Config(
        num_classes=3, image_size=64,
        model=ModelConfig(backbone=backbone, width_multiplier=mult,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
    )
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(1))
    images = normalize_images(jnp.asarray(_batch_images(1, 64)))
    logits, deltas = det.apply(variables, images)
    assert logits.shape == (1, cfg.num_anchors(), 3)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(deltas)))


def test_predict_contract():
    det = Detector(SMALL)
    variables = det.init(jax.random.PRNGKey(0))
    images = jnp.asarray(_batch_images(2, 128))
    out = jax.jit(det.predict)(variables, images)
    m = SMALL.nms.max_boxes
    assert out.boxes.shape == (2, m, 4)
    assert out.scores.shape == (2, m)
    assert out.labels.shape == (2, m)
    assert out.num_boxes.shape == (2,)
    b = np.asarray(out.boxes)
    assert np.all(b >= 0.0) and np.all(b <= 1.0)


def test_batchnorm_state_updates():
    det = Detector(SMALL)
    variables = det.init(jax.random.PRNGKey(0))
    images = normalize_images(
        jnp.asarray((np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3)))
                    .astype(np.uint8)))
    (_, _), new_state = det.apply(variables, images, train=True,
                                  mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new)
    )
    assert changed


def test_normalize_images_range():
    images = jnp.full((1, 8, 8, 3), 255, jnp.uint8)
    out = np.asarray(normalize_images(images, jnp.float32))
    assert out.max() < 3.0 and out.min() > 1.5  # (255-mean)/std per channel


def test_groupnorm_backbone_trains_without_batch_stats():
    import dataclasses
    from ssd_tpu.config import ModelConfig
    from ssd_tpu.parallel import (create_mesh, create_train_state,
                                  jit_train_step, make_optimizer,
                                  make_train_step, shard_batch)
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(SMALL.model, norm="group"))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    assert not variables.get("batch_stats")
    mesh = create_mesh()
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jit_train_step(make_train_step(det, tx), mesh)
    batch = shard_batch(mesh, {
        "images": np.zeros((8, 128, 128, 3), np.uint8),
        "boxes": np.tile(np.array([0.2, 0.2, 0.8, 0.8], np.float32), (8, 4, 1)),
        "labels": np.zeros((8, 4), np.int32),
        "num_boxes": np.ones((8,), np.int32),
    })
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_space_to_depth_stem_same_anchors():
    import dataclasses
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(SMALL.model, stem_space_to_depth=True))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    images = normalize_images(jnp.asarray(_batch_images(1, 128)))
    logits, deltas = det.apply(variables, images)
    assert logits.shape == (1, cfg.num_anchors(), 4)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_dense4_stem_schedule():
    """dense4: same head contract, no narrow high-res activations, trains."""
    import dataclasses
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(SMALL.model, stem_schedule="dense4"))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    bb = variables["params"]["backbone"]
    # stem/ds1/ds2 are replaced by one dense conv to w(128) at stride 4
    assert "ds1" not in bb and "ds2" not in bb and "ds3" in bb
    assert bb["stem"]["conv"]["kernel"].shape == (3, 3, 48, 32)  # w=0.25
    images = normalize_images(jnp.asarray(_batch_images(2, 128)))
    logits, deltas = det.apply(variables, images)
    assert logits.shape == (2, cfg.num_anchors(), 4)
    assert np.all(np.isfinite(np.asarray(logits)))
    # the loss path (matching + focal + smooth-L1) runs and is finite
    batch = {
        "images": jnp.asarray(_batch_images(2, 128)),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.8, 0.8]), (2, 4, 1)),
        "labels": jnp.zeros((2, 4), jnp.int32),
        "num_boxes": jnp.ones((2,), jnp.int32),
    }
    loss, _ = det.loss(variables, batch, train=True)
    assert np.isfinite(float(loss))


def test_dense4_folded_stem_matches_packed():
    """The 12x12/s4 folded conv == s2d(4) + 3x3 SAME conv, exactly (f32)."""
    from ssd_tpu.models.layers import space_to_depth
    from ssd_tpu.models.mobilenet import _FoldedS2DConv

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    mod = _FoldedS2DConv(16, jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), img)
    folded = mod.apply(variables, img)
    packed = jax.lax.conv_general_dilated(
        space_to_depth(img, 4), variables["params"]["kernel"],
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert folded.shape == packed.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(packed),
                               rtol=1e-5, atol=1e-5)


def test_dense4_rejects_bad_combinations():
    import dataclasses
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(SMALL.model, stem_schedule="dense4",
                                         stem_space_to_depth=True))
    with pytest.raises(ValueError, match="space-to-depth"):
        Detector(cfg).init(jax.random.PRNGKey(0))
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(SMALL.model, stem_schedule="dense4",
                                         backbone="shufflenet"))
    with pytest.raises(ValueError, match="mobilenet"):
        Detector(cfg).init(jax.random.PRNGKey(0))


def test_int8_backbone_agrees_with_f32():
    import dataclasses
    cfg32 = dataclasses.replace(
        SMALL, model=dataclasses.replace(
            SMALL.model, width_multiplier=0.5, norm="group",
            compute_dtype="float32"))
    cfg8 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model, compute_dtype="int8"))
    det32, det8 = Detector(cfg32), Detector(cfg8)
    v = det32.init(jax.random.PRNGKey(0))
    # identical param trees: f32 checkpoints serve int8 directly
    assert jax.tree_util.tree_structure(v["params"]) == (
        jax.tree_util.tree_structure(det8.init(jax.random.PRNGKey(0))["params"]))
    rng_ = np.random.default_rng(0)
    img = jnp.asarray(rng_.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8))
    l32, _ = det32.apply(v, normalize_images(img, jnp.float32))
    l8, _ = det8.apply(v, normalize_images(img, jnp.bfloat16))
    corr = np.corrcoef(np.asarray(l32, np.float32).ravel(),
                       np.asarray(l8, np.float32).ravel())[0, 1]
    assert corr > 0.95, corr


def test_int8_rejects_unbounded_backbones():
    import dataclasses
    import pytest
    cfg = dataclasses.replace(
        SMALL, model=dataclasses.replace(
            SMALL.model, backbone="resnet50", compute_dtype="int8"))
    with pytest.raises(ValueError, match="ReLU6"):
        Detector(cfg).init(jax.random.PRNGKey(0))


def test_efficientnet_lite_schedule():
    """lite0 schedule invariants: tap strides/channels and the 5x5
    depthwise kernels (stages 2/4/5) that distinguish it from v2."""
    from ssd_tpu.models.efficientnet import EfficientNetLite
    m = EfficientNetLite(compute_dtype="float32")
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(variables, x)
    assert taps["c3"].shape == (1, 8, 8, 40)
    assert taps["c4"].shape == (1, 4, 4, 112)
    assert taps["c5"].shape == (1, 2, 2, 320)
    kernels = [np.asarray(k).shape for k in
               jax.tree_util.tree_leaves(variables["params"])
               if getattr(k, "ndim", 0) == 4]
    assert any(s[:2] == (5, 5) for s in kernels)   # lite's 5x5 depthwise
    assert any(s[:2] == (3, 3) for s in kernels)
    # width multiplier pins the final 320 stage (checkpoint compat with
    # published lite schedules)
    m_small = EfficientNetLite(width_multiplier=0.5, compute_dtype="float32")
    taps_s = m_small.apply(m_small.init(jax.random.PRNGKey(0), x), x)
    assert taps_s["c5"].shape[-1] == 320
    assert taps_s["c3"].shape[-1] == 16  # _width(40, 0.5): floor to mult of 8


def test_dense4_fold_normalize_gradients():
    """The folded-normalize stem (raw uint8 input) must be differentiable
    in bf16: jax 0.9's conv transpose rejects mixed-dtype
    (preferred_element_type=f32) convs, so the train path lowers to the
    same-dtype conv — regression for the round-4 summarize --train break."""
    import dataclasses

    cfg = Config(
        num_classes=3, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          stem_schedule="dense4",
                          compute_dtype="bfloat16"),
    )
    det = Detector(cfg)
    v = det.init(jax.random.PRNGKey(0))
    batch = {
        "images": np.zeros((2, 64, 64, 3), np.uint8),
        "boxes": np.tile(np.array([0.2, 0.2, 0.8, 0.8], np.float32),
                         (2, 4, 1)),
        "labels": np.zeros((2, 4), np.int32),
        "num_boxes": np.ones((2,), np.int32),
    }

    def loss_fn(params):
        vv = dict(v)
        vv["params"] = params
        loss, _ = det.loss(vv, batch, train=True)
        return loss

    g = jax.grad(loss_fn)(v["params"])
    stem_g = np.asarray(g["backbone"]["stem"]["conv"]["kernel"])
    assert stem_g.shape == (3, 3, 48, 32)
    assert np.isfinite(stem_g).all() and np.any(stem_g != 0)
