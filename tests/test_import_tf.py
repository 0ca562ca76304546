"""TF-weight importer: round-trip through the Keras mirror must be exact.

flax init -> transplant into the Keras mirror (test_tf_parity helpers) ->
import back through ssd_tpu.tools.import_tf -> bit-identical variable
tree. This validates the full mapping machinery (layer-name derivation,
depthwise kernel transpose, BN splits) without needing the reference's
actual checkpoints (unavailable — SURVEY.md §⚠️).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
tf = pytest.importorskip("tensorflow")

from test_tf_parity import _cfg, build_keras_mirror, transplant  # noqa: E402

from ssd_tpu.models.detector import Detector  # noqa: E402
from ssd_tpu.tools.import_tf import (import_weights, keras_reader,  # noqa: E402
                                      parameter_spec)


@pytest.fixture(scope="module")
def donor():
    cfg = _cfg()
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(3))
    kmodel = build_keras_mirror(cfg)
    transplant(kmodel, variables["params"], variables["batch_stats"])
    return cfg, variables, kmodel


def test_round_trip_exact(donor):
    cfg, variables, kmodel = donor
    got = import_weights(cfg, keras_reader(kmodel))
    for coll in ("params", "batch_stats"):
        want_flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        got_flat = dict(jax.tree_util.tree_flatten_with_path(got[coll])[0])
        assert len(want_flat) == len(got_flat)
        for path, leaf in want_flat:
            np.testing.assert_array_equal(
                np.asarray(got_flat[path]), np.asarray(leaf),
                err_msg=str(path))


def test_spec_covers_whole_tree(donor):
    cfg, variables, _ = donor
    n_leaves = sum(
        len(jax.tree_util.tree_leaves(variables[c]))
        for c in ("params", "batch_stats"))
    assert len(parameter_spec(cfg)) == n_leaves


def test_missing_layer_fails_loudly(donor):
    cfg, _, kmodel = donor
    read = keras_reader(kmodel)

    def broken(e):
        if e.layer == "backbone.ds3.pointwise.conv":
            return None
        return read(e)

    with pytest.raises(ValueError, match="ds3.pointwise"):
        import_weights(cfg, broken)


def test_wrong_shape_fails_loudly(donor):
    cfg, _, kmodel = donor
    read = keras_reader(kmodel)

    def broken(e):
        w = read(e)
        if e.layer.startswith("fpn.lateral3") and e.suffix == "kernel":
            return w[..., :-1]
        return w

    with pytest.raises(ValueError, match="lateral3"):
        import_weights(cfg, broken)


def test_dense4_rejected():
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_schedule="dense4"))
    with pytest.raises(ValueError, match="dense4"):
        parameter_spec(cfg)


def test_tf_checkpoint_with_name_map(tmp_path, donor):
    """Name-based TF checkpoint under foreign scopes + a name map."""
    cfg, variables, _ = donor
    from ssd_tpu.tools.import_tf import checkpoint_reader

    entries = parameter_spec(cfg)
    want_flat = {}
    for coll in ("params", "batch_stats"):
        want_flat[coll] = dict(
            jax.tree_util.tree_flatten_with_path(variables[coll])[0])

    # write every expected tensor under a FOREIGN scope (TF-1 style names).
    # Graph-mode saving needs disable_eager_execution(), which is global
    # and would poison every later Keras read in this process — so the
    # checkpoint is written by a SUBPROCESS from an npz dump.
    name_map = {}
    dump = {}
    for e in entries:
        scope = "FeatureExtractor/" + e.layer.replace(".", "/")
        name_map[e.layer] = scope
        path = tuple(jax.tree_util.DictKey(k) for k in e.path)
        w = np.asarray(want_flat[e.collection][path])
        if e.depthwise:  # store in TF layout
            w = w.transpose(0, 1, 3, 2)
        dump[f"{scope}/{e.suffix}"] = w
    np.savez(tmp_path / "vars.npz", **dump)
    script = tmp_path / "write_ckpt.py"
    script.write_text(
        "import sys, numpy as np, tensorflow as tf\n"
        "tf1 = tf.compat.v1\n"
        "tf1.disable_eager_execution()\n"
        "data = np.load(sys.argv[1])\n"
        "g = tf1.Graph()\n"
        "with g.as_default():\n"
        "    for name in data.files:\n"
        "        tf1.get_variable(name, initializer=data[name])\n"
        "    saver = tf1.train.Saver()\n"
        "    with tf1.Session() as sess:\n"
        "        sess.run(tf1.global_variables_initializer())\n"
        "        saver.save(sess, sys.argv[2])\n")
    import subprocess
    import sys as _sys
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [_sys.executable, str(script), str(tmp_path / "vars.npz"),
         str(tmp_path / "model.ckpt")],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ckpt = str(tmp_path / "model.ckpt")

    got = import_weights(cfg, checkpoint_reader(ckpt, name_map))
    for coll in ("params", "batch_stats"):
        got_flat = dict(jax.tree_util.tree_flatten_with_path(got[coll])[0])
        for path, leaf in want_flat[coll].items():
            np.testing.assert_array_equal(
                np.asarray(got_flat[path]), np.asarray(leaf),
                err_msg=str(path))


def test_imported_weights_serve(tmp_path, donor):
    """The written artifact loads through Predictor and predicts."""
    cfg, variables, kmodel = donor
    got = import_weights(cfg, keras_reader(kmodel))
    from ssd_tpu.export import save_inference_artifact
    from ssd_tpu.predictor import Predictor

    save_inference_artifact(str(tmp_path / "art"), cfg, got)
    p = Predictor.from_checkpoint(str(tmp_path / "art"))
    out = p.predict(np.zeros((64, 64, 3), np.uint8))
    assert out["boxes"].shape[0] == out["scores"].shape[0]


def test_cli_keras_model_to_artifact(tmp_path, donor):
    """Full CLI path: saved .keras model in, serving artifact out."""
    cfg, variables, kmodel = donor
    cfg.save(str(tmp_path / "cfg.json"))
    kmodel.save(str(tmp_path / "mirror.keras"))
    from ssd_tpu.tools.import_tf import main

    main(["--config", str(tmp_path / "cfg.json"),
          "--keras-model", str(tmp_path / "mirror.keras"),
          "--output", str(tmp_path / "art")])
    from ssd_tpu.predictor import Predictor

    p = Predictor.from_checkpoint(str(tmp_path / "art"))
    out = p.predict(np.zeros((64, 64, 3), np.uint8))
    assert out["boxes"].shape[0] == out["scores"].shape[0]
