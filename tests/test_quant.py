"""int8 PTQ: calibration, full-path quantized inference, artifact flow.

The scheme under test (ssd_tpu/quant.py + models/layers.QuantConv): the
f32 parameter tree is UNCHANGED; weights quantize per-output-channel at
trace time, activations per-tensor from calibrated scales stored in a
"quant" collection (shape-keyed so the shared head subnets get one scale
per pyramid level). Backbone-only int8 (static ReLU6 bounds) predates
this and must keep working without any calibration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.config import Config, ModelConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.quant import abstract_quant_tree, calibrate

CFG32 = Config(
    num_classes=4, image_size=128,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=2,
                      compute_dtype="float32"),
)


def _int8_cfg(base=CFG32, **model_kw):
    kw = dict(compute_dtype="int8", int8_neck=True)
    kw.update(model_kw)
    return dataclasses.replace(
        base, model=dataclasses.replace(base.model, **kw))


def _images(n=4, size=128, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, size, size, 3)).astype(np.uint8)


def _trained_like_vars(det, seed=0):
    """init vars with non-degenerate BN stats so bf16/int8 deltas are
    exercised on realistic activation magnitudes."""
    v = det.init(jax.random.PRNGKey(seed))
    return v


def _perturbed_vars(det, seed=0, scale=0.05):
    """init + noise on every kernel: at exact init weights the head logits
    are bias-dominated and ReLU6-saturated, so an absolute-logit parity
    bound would pass under a real clipping regression. Perturbed weights
    make the logits activation-dominated."""
    v = _trained_like_vars(det, seed)
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    leaves = [
        leaf + scale * jax.random.normal(k, leaf.shape, leaf.dtype)
        if leaf.ndim >= 2 else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return dict(v, params=jax.tree_util.tree_unflatten(treedef, leaves))


def _serving_forward(det, v, imgs):
    """The REAL serving forward: raw uint8 in, normalization inside —
    the same path calibrate() observes and predict() runs. Parity tests
    must evaluate here, not det.apply() on un-normalized uint8."""
    return det.model.apply(v, jnp.asarray(imgs), train=False,
                           raw_input=True)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_uncalibrated_neck_raises():
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    with pytest.raises(ValueError, match="calibrated activation scale"):
        det8.apply(v, jnp.asarray(_images()))


def test_calibrated_full_path_matches_f32():
    det32 = Detector(CFG32)
    det8 = Detector(_int8_cfg())
    v = _perturbed_vars(det32)
    imgs = _images()

    qv, seen = calibrate(det8, v, [imgs])
    assert seen == imgs.shape[0]
    assert "quant" in qv and jax.tree_util.tree_leaves(qv["quant"])

    l32, d32 = _serving_forward(det32, v, imgs)
    l8, d8 = _serving_forward(det8, qv, imgs)
    # relative bound on activation-dominated outputs, evaluated through
    # the calibrated distribution — a clipping regression fails this
    # (deltas get a wider bound: their magnitudes are ~100x smaller than
    # the logits', so per-tensor activation quantization noise is a
    # proportionally larger share; measured 0.07 at perturbed-init)
    assert _rel_err(l8, l32) < 0.05, _rel_err(l8, l32)
    assert _rel_err(d8, d32) < 0.12, _rel_err(d8, d32)


def test_head_scales_are_per_level():
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    qv, _ = calibrate(det8, v, [_images()])
    head = qv["quant"]["head"]["class_net"]["conv0"]
    # 128px model: P3..P7 = 16, 8, 4, 2, 1 — one scale per level
    assert sorted(head.keys()) == [
        "act_scale_16x16", "act_scale_1x1", "act_scale_2x2",
        "act_scale_4x4", "act_scale_8x8"]


def test_calibration_scales_only_widen():
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    qv1, _ = calibrate(det8, v, [_images(seed=1)])
    qv2, _ = calibrate(det8, qv1, [np.zeros((2, 128, 128, 3), np.uint8)])
    s1 = jax.tree_util.tree_leaves(qv1["quant"])
    s2 = jax.tree_util.tree_leaves(qv2["quant"])
    for a, b in zip(s1, s2):
        assert float(b) >= float(a) - 1e-9


def test_calibrated_scales_track_observed_range():
    """Scales are seeded from observed |x| alone — small activations get a
    fine grid, not the static act_range/127 floor (which now only backs
    the uncalibrated serve-time fallback)."""
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    # near-mean-gray images: normalized input ~0, so neck activations at
    # init weights are far below the ReLU6 bound
    gray = np.full((2, 128, 128, 3), 120, np.uint8)
    qv, _ = calibrate(det8, v, [gray])
    scales = np.array([float(s) for s in
                       jax.tree_util.tree_leaves(qv["quant"])])
    assert np.all(scales > 0)
    assert scales.min() < 6.0 / 127.0 * 0.5, scales.min()


def test_percentile_calibration_narrows_scales():
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    imgs = _images()
    q_abs, _ = calibrate(det8, v, [imgs])
    q_pct, _ = calibrate(det8, v, [imgs], percentile=90.0)
    a = jax.tree_util.tree_leaves(q_abs["quant"])
    b = jax.tree_util.tree_leaves(q_pct["quant"])
    assert all(float(y) <= float(x) + 1e-9 for x, y in zip(a, b))
    assert any(float(y) < float(x) * 0.999 for x, y in zip(a, b))


def test_stale_calibration_wrong_resolution_raises():
    """Calibrate at 128, serve at 256: the shape-keyed neck scales are
    missing for the new spatial shapes, and require_scale must raise
    rather than silently fall back to the (inapplicable) static bound."""
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    qv, _ = calibrate(det8, v, [_images()])
    cfg256 = dataclasses.replace(_int8_cfg(), image_size=256)
    det256 = Detector(cfg256)
    with pytest.raises(ValueError, match="calibrated activation scale"):
        _serving_forward(det256, qv, _images(n=1, size=256))


def test_backbone_only_needs_no_calibration():
    cfg8 = dataclasses.replace(
        CFG32, model=dataclasses.replace(CFG32.model, compute_dtype="int8"))
    det32, det8 = Detector(CFG32), Detector(cfg8)
    v = _perturbed_vars(det32)
    imgs = _images()
    l32, _ = _serving_forward(det32, v, imgs)
    l8, _ = _serving_forward(det8, v, imgs)  # no "quant" collection at all
    assert _rel_err(l8, l32) < 0.1, _rel_err(l8, l32)


def test_artifact_round_trip_and_predictor(tmp_path):
    from ssd_tpu.export import load_inference_artifact
    from ssd_tpu.predictor import Predictor
    from ssd_tpu.quant import quantize_artifact
    from ssd_tpu.export import save_inference_artifact

    det32 = Detector(CFG32)
    v = _trained_like_vars(det32)
    src = str(tmp_path / "export")
    save_inference_artifact(src, CFG32, v)

    dst = str(tmp_path / "export_int8")
    quantize_artifact(src, dst, [_images()])

    cfg, qv = load_inference_artifact(dst)
    assert cfg.model.compute_dtype == "int8" and cfg.model.int8_neck
    assert "quant" in qv
    det8 = Detector(cfg)
    out = det8.predict(qv, jnp.asarray(_images(n=2)))
    assert out.boxes.shape[-1] == 4

    p = Predictor.from_checkpoint(dst)
    r = p.predict(_images(n=1)[0])
    assert "num_boxes" in r


def test_int8_neck_export_without_quant_raises(tmp_path):
    from ssd_tpu.export import save_inference_artifact

    det32 = Detector(CFG32)
    v = _trained_like_vars(det32)
    with pytest.raises(ValueError, match="quant"):
        save_inference_artifact(str(tmp_path / "x"), _int8_cfg(), v)


def test_int8_folded_dense4_stem_matches_f32_fold():
    """_Int8FoldedS2DConv: exact-integer input lowering of the folded
    dense4 stem — the only error vs the f32 folded-normalize path is the
    per-channel weight rounding (~0.5% relative)."""
    from ssd_tpu.models.mobilenet import _FoldedS2DConv, _Int8FoldedS2DConv

    x = jnp.asarray(_images(n=2, size=64, seed=3))
    f32 = _FoldedS2DConv(16, jnp.float32, fold_normalize=True)
    v = f32.init(jax.random.PRNGKey(0), x)
    y32 = np.asarray(f32.apply(v, x), np.float32)
    # same (3, 3, 48, features) param tree: an f32/bf16 checkpoint serves
    # the int8 stem unchanged
    y8 = np.asarray(_Int8FoldedS2DConv(16).apply(v, x), np.float32)
    rel = np.abs(y8 - y32).max() / np.abs(y32).max()
    assert rel < 0.02, rel


def test_int8_folded_stem_border_correction_sign():
    """A constant-128 image zeroes the integer conv term, so the output
    IS the +correction map — it must equal the f32 folded path's output
    on the same image (catches a sign flip or a wrong constant)."""
    from ssd_tpu.models.mobilenet import _FoldedS2DConv, _Int8FoldedS2DConv

    x = jnp.full((1, 48, 48, 3), 128, jnp.uint8)
    f32 = _FoldedS2DConv(8, jnp.float32, fold_normalize=True)
    v = f32.init(jax.random.PRNGKey(1), x)
    y32 = np.asarray(f32.apply(v, x), np.float32)
    y8 = np.asarray(_Int8FoldedS2DConv(8).apply(v, x), np.float32)
    # weight rounding only; the interior/border structure must agree
    assert np.abs(y8 - y32).max() / max(np.abs(y32).max(), 1e-6) < 0.02


def test_int8_dense4_full_path_matches_f32():
    """Full predict path: dense4 + int8_neck + calibrated scales vs the
    f32 dense4 model — covers the stem, the requant-friendly barrier
    gating, and the detector's fold decision for int8."""
    cfgd = dataclasses.replace(CFG32, model=dataclasses.replace(
        CFG32.model, stem_schedule="dense4"))
    det32 = Detector(cfgd)
    det8 = Detector(_int8_cfg(cfgd))
    v = _perturbed_vars(det32)
    imgs = _images()
    qv, _ = calibrate(det8, v, [imgs])
    l32, d32 = _serving_forward(det32, v, imgs)
    l8, d8 = _serving_forward(det8, qv, imgs)
    # slightly wider than the ref-stem bound: the stem's weight rounding
    # lands pre-BN, so its ~0.5% relative error is renormalized and rides
    # through the whole depth (the stem-level tests above bound the stem
    # itself at 2% relative)
    assert _rel_err(l8, l32) < 0.08, _rel_err(l8, l32)
    assert _rel_err(d8, d32) < 0.08, _rel_err(d8, d32)


def test_abstract_quant_tree_matches_calibrated():
    det8 = Detector(_int8_cfg())
    v = _trained_like_vars(Detector(CFG32))
    qv, _ = calibrate(det8, v, [_images()])
    ab = abstract_quant_tree(det8)
    assert (jax.tree_util.tree_structure(ab)
            == jax.tree_util.tree_structure(qv["quant"]))
