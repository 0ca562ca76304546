"""Weight-transplant parity: the TF/Keras mirror vs the flax model.

VERDICT r1 #3 / SURVEY.md §4 "golden-parity": with /root/reference empty,
the strongest obtainable accuracy cross-check is to transplant one set of
weights between bench_reference.py's faithful Keras mirror of the reference
architecture and the ssd_tpu flax model, then assert the two stacks produce
the same raw outputs AND the same final detections on fixed images. Any
architectural drift (padding, BN epsilon, activation, layer order, reshape
order, decode formula, NMS semantics) breaks this test.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from ssd_tpu.config import Config, ModelConfig, NMSConfig  # noqa: E402
from ssd_tpu.constants import BATCH_NORM_EPSILON, SCALE_FACTORS  # noqa: E402
from ssd_tpu.models.detector import (Detector, MEAN_RGB,  # noqa: E402
                                     STD_RGB)

WIDTH = 0.25


def _w(ch: int) -> int:  # mirror of mobilenet._width
    return max(8, int(ch * WIDTH + 0.5) // 8 * 8)


def _cfg() -> Config:
    return Config(
        num_classes=4,
        image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=WIDTH,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
        nms=NMSConfig(use_pallas=False),
    )


def build_keras_mirror(cfg: Config) -> "tf.keras.Model":
    """bench_reference.py's architecture, parametrized to the tiny config,
    with layer names matching the flax param tree paths."""
    l = tf.keras.layers

    def conv_bn(x, ch, name, k=3, s=1, depthwise=False):
        if depthwise:
            x = l.DepthwiseConv2D(k, strides=s, padding="same",
                                  use_bias=False, name=f"{name}.conv")(x)
        else:
            x = l.Conv2D(ch, k, strides=s, padding="same",
                         use_bias=False, name=f"{name}.conv")(x)
        x = l.BatchNormalization(epsilon=BATCH_NORM_EPSILON,
                                 name=f"{name}.bn")(x)
        return l.ReLU(6.0)(x)

    def ds(x, ch, name, s=1):
        x = conv_bn(x, None, f"{name}.depthwise", 3, s, depthwise=True)
        return conv_bn(x, ch, f"{name}.pointwise", 1, 1)

    s = cfg.image_size
    images = tf.keras.Input((s, s, 3))
    x = conv_bn(images, _w(32), "backbone.stem", 3, 2)
    x = ds(x, _w(64), "backbone.ds1")
    x = ds(x, _w(128), "backbone.ds2", 2)
    x = ds(x, _w(128), "backbone.ds3")
    x = ds(x, _w(256), "backbone.ds4", 2)
    x = ds(x, _w(256), "backbone.ds5")
    c3 = x
    x = ds(x, _w(512), "backbone.ds6", 2)
    for i in range(5):
        x = ds(x, _w(512), f"backbone.ds{7 + i}")
    c4 = x
    x = ds(x, _w(1024), "backbone.ds12", 2)
    c5 = ds(x, _w(1024), "backbone.ds13")

    f = cfg.model.fpn_channels
    p5 = l.Conv2D(f, 1, name="fpn.lateral5")(c5)
    p4 = l.Add()([l.Conv2D(f, 1, name="fpn.lateral4")(c4),
                  l.UpSampling2D()(p5)])
    p3 = l.Add()([l.Conv2D(f, 1, name="fpn.lateral3")(c3),
                  l.UpSampling2D()(p4)])
    p3 = l.Conv2D(f, 3, padding="same", name="fpn.smooth3")(p3)
    p4 = l.Conv2D(f, 3, padding="same", name="fpn.smooth4")(p4)
    p5 = l.Conv2D(f, 3, padding="same", name="fpn.smooth5")(p5)
    p6 = l.Conv2D(f, 3, strides=2, padding="same", name="fpn.p6")(c5)
    p7 = l.Conv2D(f, 3, strides=2, padding="same",
                  name="fpn.p7")(l.ReLU()(p6))

    k = cfg.anchors.num_anchors_per_cell

    def subnet(name, out_ch):
        convs = [l.Conv2D(f, 3, padding="same", activation="relu",
                          name=f"{name}.conv{i}")
                 for i in range(cfg.model.head_depth)]
        out = l.Conv2D(out_ch, 3, padding="same", name=f"{name}.predict")
        return convs, out

    cls_convs, cls_out = subnet("head.class_net", k * cfg.num_classes)
    box_convs, box_out = subnet("head.box_net", k * 4)
    logits_l, deltas_l = [], []
    for p in [p3, p4, p5, p6, p7]:
        cx = p
        for cv in cls_convs:
            cx = cv(cx)
        logits_l.append(l.Reshape((-1, cfg.num_classes))(cls_out(cx)))
        bx = p
        for cv in box_convs:
            bx = cv(bx)
        deltas_l.append(l.Reshape((-1, 4))(box_out(bx)))
    return tf.keras.Model(
        images,
        [tf.keras.layers.Concatenate(axis=1)(logits_l),
         tf.keras.layers.Concatenate(axis=1)(deltas_l)],
    )


def transplant(kmodel, params, stats) -> int:
    """Copy every flax parameter into the Keras mirror. Returns #layers set."""
    n_set = 0

    def set_conv(name, p, depthwise=False):
        nonlocal n_set
        w = np.asarray(p["kernel"])
        if depthwise:  # flax (k, k, 1, C) -> keras (k, k, C, 1)
            w = w.transpose(0, 1, 3, 2)
        weights = [w]
        if "bias" in p:
            weights.append(np.asarray(p["bias"]))
        kmodel.get_layer(name).set_weights(weights)
        n_set += 1

    def set_bn(name, p, s):
        nonlocal n_set
        kmodel.get_layer(name).set_weights([
            np.asarray(p["scale"]), np.asarray(p["bias"]),
            np.asarray(s["mean"]), np.asarray(s["var"]),
        ])
        n_set += 1

    b, bs = params["backbone"], stats["backbone"]
    set_conv("backbone.stem.conv", b["stem"]["conv"])
    set_bn("backbone.stem.bn", b["stem"]["bn"], bs["stem"]["bn"])
    for i in range(1, 14):
        blk = f"ds{i}"
        set_conv(f"backbone.{blk}.depthwise.conv",
                 b[blk]["depthwise"]["conv"], depthwise=True)
        set_bn(f"backbone.{blk}.depthwise.bn",
               b[blk]["depthwise"]["bn"], bs[blk]["depthwise"]["bn"])
        set_conv(f"backbone.{blk}.pointwise.conv", b[blk]["pointwise"]["conv"])
        set_bn(f"backbone.{blk}.pointwise.bn",
               b[blk]["pointwise"]["bn"], bs[blk]["pointwise"]["bn"])
    for name in ("lateral3", "lateral4", "lateral5",
                 "smooth3", "smooth4", "smooth5", "p6", "p7"):
        set_conv(f"fpn.{name}", params["fpn"][name]["conv"])
    for net in ("class_net", "box_net"):
        for key in params["head"][net]:
            set_conv(f"head.{net}.{key}", params["head"][net][key])
    return n_set


@pytest.fixture(scope="module")
def stacks():
    cfg = _cfg()
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(7))
    kmodel = build_keras_mirror(cfg)
    n_set = transplant(kmodel, variables["params"],
                       variables["batch_stats"])
    # every conv/bn in the mirror must have been filled
    assert n_set == sum(
        1 for layer in kmodel.layers
        if layer.weights  # conv + bn layers only
    ), "keras mirror has layers the transplant did not cover"
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    norm = ((images_u8.astype(np.float32) - MEAN_RGB) / STD_RGB)
    return cfg, det, variables, kmodel, images_u8, norm


def test_raw_output_parity(stacks):
    """Same weights + same input -> same (logits, deltas) from both stacks."""
    cfg, det, variables, kmodel, _, norm = stacks
    j_logits, j_deltas = det.apply(variables, norm.astype(np.float32))
    t_logits, t_deltas = kmodel(tf.constant(norm), training=False)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(j_deltas), t_deltas.numpy(),
                               atol=5e-4)


def _tf_reference_postprocess(logits, deltas, anchors, nms):
    """The reference's postprocess (SURVEY.md §3.2): decode all anchors,
    per-image per-class tf.image.non_max_suppression, global top-k merge."""
    scores = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    cya = (anchors[:, 0] + anchors[:, 2]) / 2
    cxa = (anchors[:, 1] + anchors[:, 3]) / 2
    ha = anchors[:, 2] - anchors[:, 0]
    wa = anchors[:, 3] - anchors[:, 1]
    sy, sx, sh, sw = SCALE_FACTORS
    ty, tx, th, tw = np.moveaxis(deltas.astype(np.float64), -1, 0)
    cy = ty / sy * ha + cya
    cx = tx / sx * wa + cxa
    h = np.exp(np.minimum(th / sh, 10.0)) * ha
    w = np.exp(np.minimum(tw / sw, 10.0)) * wa
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
    boxes = np.clip(boxes, 0.0, 1.0).astype(np.float32)

    out = []
    for i in range(len(boxes)):
        bs, ss, ls = [], [], []
        for c in range(scores.shape[-1]):
            keep = tf.image.non_max_suppression(
                boxes[i], scores[i, :, c].astype(np.float32),
                max_output_size=nms.pre_nms_top_k,
                iou_threshold=nms.iou_threshold,
                score_threshold=nms.score_threshold,
            ).numpy()
            bs.append(boxes[i][keep])
            ss.append(scores[i, keep, c])
            ls.append(np.full(len(keep), c, np.int32))
        ss = np.concatenate(ss)
        order = np.argsort(-ss, kind="stable")[:nms.max_boxes]
        out.append((np.concatenate(bs)[order], ss[order],
                    np.concatenate(ls)[order]))
    return out


def test_detection_parity(stacks):
    """End-to-end: ssd_tpu predict == reference-style TF postprocess on the
    transplanted mirror's outputs (boxes/scores/labels within tolerance)."""
    cfg, det, variables, kmodel, images_u8, norm = stacks
    mine = det.predict(variables, images_u8)
    t_logits, t_deltas = kmodel(tf.constant(norm), training=False)
    ref = _tf_reference_postprocess(
        t_logits.numpy(), t_deltas.numpy(),
        np.asarray(det.anchors), cfg.nms,
    )
    for i, (rb, rs, rl) in enumerate(ref):
        n = int(mine.num_boxes[i])
        assert n == len(rs), f"image {i}: {n} vs {len(rs)} detections"
        mb = np.asarray(mine.boxes[i, :n])
        ms = np.asarray(mine.scores[i, :n])
        ml = np.asarray(mine.labels[i, :n])
        # order-insensitive match: every detection must have a counterpart
        used = np.zeros(n, bool)
        for b, s, lab in zip(rb, rs, rl):
            cand = np.where(
                (~used) & (ml == lab) & (np.abs(ms - s) < 1e-3)
                & (np.abs(mb - b).max(-1) < 1e-3)
            )[0]
            assert len(cand), f"image {i}: no match for {lab} @ {s:.4f}"
            used[cand[0]] = True
        assert used.all()
