import numpy as np
import pytest

import jax

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.export import (export_stablehlo, load_inference_artifact,
                            load_stablehlo, save_inference_artifact)
from ssd_tpu.models.detector import Detector

CFG = Config(
    num_classes=3, image_size=64,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    nms=NMSConfig(max_boxes=8, num_candidates=64, pre_nms_top_k=32),
)


def test_artifact_roundtrip(tmp_path):
    det = Detector(CFG)
    variables = det.init(jax.random.PRNGKey(3))
    save_inference_artifact(str(tmp_path / "e"), CFG, variables,
                            label_map={0: "a", 1: "b", 2: "c"})
    cfg2, v2 = load_inference_artifact(str(tmp_path / "e"))
    assert cfg2 == CFG
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(v2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json, os
    assert json.load(open(tmp_path / "e" / "label_map.json"))["1"] == "b"


def test_stablehlo_export_is_self_contained(tmp_path):
    det = Detector(CFG)
    variables = det.init(jax.random.PRNGKey(3))
    images = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)
    ).astype(np.uint8)

    want = jax.jit(det.predict)(variables, images)

    path = export_stablehlo(str(tmp_path / "hlo"), CFG, variables,
                            batch_size=2)
    fn = load_stablehlo(path)
    got = fn(images)
    np.testing.assert_array_equal(np.asarray(want.num_boxes),
                                  np.asarray(got["num_boxes"]))
    np.testing.assert_allclose(np.asarray(want.boxes),
                               np.asarray(got["boxes"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(want.scores),
                               np.asarray(got["scores"]), atol=1e-6)


def test_predictor_names(tmp_path):
    from ssd_tpu.predictor import Predictor
    det = Detector(CFG)
    variables = det.init(jax.random.PRNGKey(3))
    p = Predictor(CFG, variables, label_map={0: "cat", 1: "dog", 2: "bird"})
    out = p.predict(np.zeros((64, 64, 3), np.uint8))
    assert "names" in out
    assert out["names"].shape == (CFG.nms.max_boxes,)


def test_warm_start_copies_matching_leaves(tmp_path):
    import dataclasses
    import jax.numpy as jnp
    from ssd_tpu.parallel import create_train_state, make_optimizer
    from ssd_tpu.train import warm_start

    det = Detector(CFG)
    donor_vars = det.init(jax.random.PRNGKey(7))
    save_inference_artifact(str(tmp_path / "donor"), CFG, donor_vars)

    # new task: different class count -> head predict leaves mismatch
    cfg2 = dataclasses.replace(CFG, num_classes=5)
    det2 = Detector(cfg2)
    tx = make_optimizer(cfg2)
    state = create_train_state(det2, jax.random.PRNGKey(0), tx)
    state2 = warm_start(state, str(tmp_path / "donor"))

    # backbone stem copied from donor
    donor_stem = np.asarray(
        donor_vars["params"]["backbone"]["stem"]["conv"]["kernel"])
    got_stem = np.asarray(state2.params["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(donor_stem, got_stem)
    # class-head predict kernel shape differs -> kept fresh (not donor's)
    fresh_head = np.asarray(
        state.params["head"]["class_net"]["predict"]["kernel"])
    got_head = np.asarray(
        state2.params["head"]["class_net"]["predict"]["kernel"])
    np.testing.assert_array_equal(fresh_head, got_head)


def test_savedmodel_export_matches_jax(tmp_path):
    """The jax2tf SavedModel (the reference's save.py artifact, SURVEY.md
    §3.3) reloads in plain TF and reproduces the jax predict outputs."""
    tf = pytest.importorskip("tensorflow")

    from ssd_tpu.export import export_savedmodel

    det = Detector(CFG)
    variables = det.init(jax.random.PRNGKey(3))
    images = np.random.default_rng(1).integers(
        0, 255, (2, 64, 64, 3)
    ).astype(np.uint8)

    want = jax.jit(det.predict)(variables, images)

    out_dir = export_savedmodel(str(tmp_path / "e"), CFG, variables,
                                batch_size=2, platforms=("cpu",))
    loaded = tf.saved_model.load(out_dir)
    got = loaded.signatures["serving_default"](images=tf.constant(images))

    assert set(got) == {"boxes", "scores", "labels", "num_boxes"}
    np.testing.assert_array_equal(np.asarray(want.num_boxes),
                                  got["num_boxes"].numpy())
    np.testing.assert_array_equal(np.asarray(want.labels),
                                  got["labels"].numpy())
    np.testing.assert_allclose(np.asarray(want.boxes),
                               got["boxes"].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(want.scores),
                               got["scores"].numpy(), atol=1e-6)
