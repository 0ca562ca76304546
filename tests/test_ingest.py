"""Packed ingest (ops/ingest.py + native ssd_pack_s2d): the input
pipeline delivers the space-to-depth(4)-packed, -128-shifted s8 tensor
the int8 dense4 stem consumes directly.

The whole scheme is exact relabeling + the exact u8^0x80 == u8-128 bit
trick, so the contract under test is BIT-IDENTITY: all three pack
implementations (numpy / jax / native C++) agree exactly, and the packed
predict reproduces the raw-uint8 predict exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config, ModelConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.ops.ingest import (pack_s2d, pack_s2d_jax, packed_shape,
                                unpack_s2d)
from ssd_tpu.quant import calibrate

CFG8 = Config(
    num_classes=4, image_size=128,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=2,
                      compute_dtype="int8", int8_neck=True,
                      stem_schedule="dense4"),
)


def _images(n=2, size=128, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)


def test_pack_roundtrip_and_twins_agree():
    x = _images(3, 64)
    packed = pack_s2d(x)
    assert packed.shape == packed_shape((64, 64), 3)
    assert packed.dtype == np.int8
    # exact inverse
    np.testing.assert_array_equal(unpack_s2d(packed), x)
    # jax twin
    np.testing.assert_array_equal(np.asarray(pack_s2d_jax(jnp.asarray(x))),
                                  packed)
    # the -128 shift is the XOR bit trick: check extremes explicitly
    ext = np.zeros((1, 4, 4, 3), np.uint8)
    ext[0, 0, 0, 0] = 255
    p = pack_s2d(ext)
    assert p.min() == -128 and p.max() == 127


def test_native_pack_matches_numpy():
    from ssd_tpu.data import native
    x = _images(2, 96, seed=3)
    np.testing.assert_array_equal(native.pack_s2d(x), pack_s2d(x))
    # non-square, threaded
    y = _images(5, 64, seed=4)[:, :, :32]
    np.testing.assert_array_equal(native.pack_s2d(y, n_threads=3),
                                  pack_s2d(y))


def test_pack_matches_device_pack_conv():
    """The on-device one-hot pack conv (_s2d_pack_kernel order) and the
    host pack produce the same channel layout — checked value-for-value
    through the conv itself."""
    from ssd_tpu.models.mobilenet import _s2d_pack_kernel
    x = _images(1, 32, seed=5)
    xor = jax.lax.bitcast_convert_type(
        jnp.asarray(x) ^ jnp.uint8(0x80), jnp.int8)
    conv = jax.lax.conv_general_dilated(
        xor.astype(jnp.int32),
        jnp.asarray(_s2d_pack_kernel(), jnp.int32), (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(conv, np.int8), pack_s2d(x))


def test_packed_predict_bit_identical():
    """predict(packed) == predict(raw uint8), exactly — the int8 stem
    dispatches on input dtype and both forms feed the same s8 tensor to
    the same quantized conv."""
    det = Detector(CFG8)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = _images(2)
    variables, _ = calibrate(det, variables, [imgs])

    raw = jax.jit(det.predict)(variables, jnp.asarray(imgs))
    packed = jax.jit(det.predict)(variables, jnp.asarray(pack_s2d(imgs)))
    for name in ("boxes", "scores", "labels", "num_boxes"):
        np.testing.assert_array_equal(np.asarray(getattr(raw, name)),
                                      np.asarray(getattr(packed, name)),
                                      err_msg=name)


def test_predictor_auto_packed_matches_raw_feed():
    """Predictor auto-enables packed ingest for the int8 dense4 config and
    its detections match the forced raw-uint8 feed exactly."""
    from ssd_tpu.predictor import Predictor
    det = Detector(CFG8)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = _images(2)
    variables, _ = calibrate(det, variables, [imgs])

    packed_p = Predictor(CFG8, variables)
    raw_p = Predictor(CFG8, variables, packed_ingest=False)
    assert packed_p._packed and not raw_p._packed
    a, b = packed_p.predict(imgs), raw_p.predict(imgs)
    for k in ("boxes", "scores", "labels", "num_boxes"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # non-dense4 stems never auto-pack
    ref = dataclasses.replace(CFG8, model=dataclasses.replace(
        CFG8.model, compute_dtype="bfloat16", int8_neck=False,
        stem_schedule="reference"))
    assert not Predictor(
        ref, Detector(ref).init(jax.random.PRNGKey(0)))._packed


def test_packed_predict_bf16_close():
    """bf16/f32 dense4 packed ingest: conv((p-mean)/std, w) ==
    conv(p-128, w/std) + border((128-mean)w/std) up to conv summation
    order. f32 config -> tight tolerance on the raw-vs-packed predict."""
    cfg = dataclasses.replace(CFG8, model=dataclasses.replace(
        CFG8.model, compute_dtype="float32", int8_neck=False))
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(1))
    imgs = _images(2, seed=9)
    raw = jax.jit(det.predict)(variables, jnp.asarray(imgs))
    packed = jax.jit(det.predict)(variables, jnp.asarray(pack_s2d(imgs)))
    np.testing.assert_array_equal(np.asarray(raw.num_boxes),
                                  np.asarray(packed.num_boxes))
    np.testing.assert_allclose(np.asarray(raw.scores),
                               np.asarray(packed.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw.boxes),
                               np.asarray(packed.boxes), atol=1e-5)

    from ssd_tpu.predictor import Predictor
    assert Predictor(cfg, variables)._packed  # dense4 auto rule, any dtype


def test_daemon_packed_handler_matches_direct_predict():
    """The serve daemon's handler threads pack per image at decode time
    (serve._decode) and Predictor's pre-packed fast path consumes them —
    detections over HTTP must equal the direct raw-uint8 predict."""
    import io
    import json as jsonlib
    import urllib.request

    from PIL import Image

    from ssd_tpu.predictor import Predictor
    from ssd_tpu.serve import DetectionServer

    det = Detector(CFG8)
    variables = det.init(jax.random.PRNGKey(0))
    variables, _ = calibrate(det, variables, [_images(2)])
    predictor = Predictor(CFG8, variables)
    assert predictor._packed
    predictor.warmup(1)
    srv = DetectionServer(predictor, host="127.0.0.1", port=0,
                          max_batch=4, max_wait_ms=5.0,
                          default_score_threshold=0.0)
    srv.start()
    try:
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/detect?score_threshold=0",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            via_http = jsonlib.loads(resp.read())["detections"]
        # decode exactly like the handler, then direct raw predict
        from ssd_tpu.data import native
        image = native.decode_jpeg(buf.getvalue(), 128, 128)
        direct = Predictor(CFG8, variables, packed_ingest=False).predict(image)
        assert len(via_http) == int(direct["num_boxes"])
        for d, score, box in zip(via_http, direct["scores"],
                                 direct["boxes"]):
            assert abs(d["score"] - float(score)) < 1e-3
            np.testing.assert_allclose(d["box_yxyx"], box, atol=1e-3)
    finally:
        srv.stop()
