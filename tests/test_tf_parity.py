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


# ------------------------------------------------------------- train step
# VERDICT r2 #3: extend transplant parity from inference to TRAINING — the
# reference-recipe loss (IoU-argmax matching, focal a=0.25/g=2, smooth-L1,
# L2 on kernels) implemented INDEPENDENTLY in numpy+TF on the Keras mirror,
# one step on a fixed batch from identical weights, loss value and gradient
# parity vs the flax loss the train step differentiates.

def _numpy_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ymin = np.maximum(a[:, None, 0], b[None, :, 0])
    xmin = np.maximum(a[:, None, 1], b[None, :, 1])
    ymax = np.minimum(a[:, None, 2], b[None, :, 2])
    xmax = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ymax - ymin, 0, None) * np.clip(xmax - xmin, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-8)


def _numpy_targets(anchors, gt_boxes, gt_labels, num_classes,
                   pos_thr=0.5, neg_thr=0.4):
    """The reference recipe (SURVEY.md §2 target-creation row), scalar
    numpy — written independently of ssd_tpu.ops."""
    a = len(anchors)
    ious = _numpy_iou(anchors, gt_boxes)         # (A, G)
    best_gt = ious.argmax(1)
    best_iou = ious.max(1)
    match = np.where(best_iou >= pos_thr, best_gt, -1)
    match[(best_iou >= neg_thr) & (best_iou < pos_thr)] = -2
    # force-match each gt's best anchor (later gt wins collisions)
    for j in range(len(gt_boxes)):
        match[ious[:, j].argmax()] = j

    pos = match >= 0
    reg_t = np.zeros((a, 4), np.float32)
    cls_t = np.zeros((a, num_classes), np.float32)
    if pos.any():
        gb = gt_boxes[match[pos]]
        an = anchors[pos]
        cy, cx = (gb[:, 0] + gb[:, 2]) / 2, (gb[:, 1] + gb[:, 3]) / 2
        h = np.maximum(gb[:, 2] - gb[:, 0], 1e-8)
        w = np.maximum(gb[:, 3] - gb[:, 1], 1e-8)
        cya, cxa = (an[:, 0] + an[:, 2]) / 2, (an[:, 1] + an[:, 3]) / 2
        ha = np.maximum(an[:, 2] - an[:, 0], 1e-8)
        wa = np.maximum(an[:, 3] - an[:, 1], 1e-8)
        sy, sx, sh, sw = SCALE_FACTORS
        reg_t[pos] = np.stack([
            (cy - cya) / ha * sy, (cx - cxa) / wa * sx,
            np.log(h / ha) * sh, np.log(w / wa) * sw], -1)
        cls_t[pos, gt_labels[match[pos]]] = 1.0
    cls_w = (match != -2).astype(np.float32)
    reg_w = pos.astype(np.float32)
    return reg_t, cls_t, cls_w, reg_w


def _tf_detection_loss(logits, deltas, targets_list, cfg,
                       alpha=0.25, gamma=2.0):
    """Reference-recipe loss in TF ops (focal + smooth-L1 / num_pos)."""
    reg_t = tf.constant(np.stack([t[0] for t in targets_list]))
    cls_t = tf.constant(np.stack([t[1] for t in targets_list]))
    cls_w = tf.constant(np.stack([t[2] for t in targets_list]))
    reg_w = tf.constant(np.stack([t[3] for t in targets_list]))
    num_pos = tf.maximum(tf.reduce_sum(reg_w), 1.0)

    bce = tf.nn.sigmoid_cross_entropy_with_logits(cls_t, logits)
    prob = tf.sigmoid(logits)
    p_t = prob * cls_t + (1 - prob) * (1 - cls_t)
    alpha_t = alpha * cls_t + (1 - alpha) * (1 - cls_t)
    focal = alpha_t * tf.pow(1 - p_t, gamma) * bce
    cls_loss = tf.reduce_sum(
        tf.reduce_sum(focal, -1) * cls_w) / num_pos

    diff = tf.abs(deltas - reg_t)
    sl1 = tf.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    loc_loss = tf.reduce_sum(tf.reduce_sum(sl1, -1) * reg_w) / num_pos
    return cls_loss + loc_loss


def _keras_name_for(path_keys) -> tuple[str, str]:
    """flax param path -> (keras layer name, weight attr)."""
    keys = [k.key for k in path_keys]
    leaf = keys[-1]
    layer = ".".join(keys[:-1])
    if leaf == "scale":
        return layer, "gamma"
    if leaf == "bias" and keys[-2] == "bn":
        return layer, "beta"
    return layer, {"kernel": "kernel", "bias": "bias"}[leaf]


def test_train_step_loss_and_gradient_parity(stacks):
    """Same transplanted weights + same fixed batch -> same loss value and
    matching gradients (cosine > 0.999 per leaf) from the flax loss the
    train step differentiates and an independent TF implementation of the
    reference recipe on the Keras mirror."""
    cfg, det, variables, kmodel, images_u8, norm = stacks
    wd = cfg.losses.weight_decay

    rng = np.random.default_rng(3)
    n = 2
    gt_boxes = np.zeros((n, 4, 4), np.float32)
    gt_labels = np.zeros((n, 4), np.int32)
    num_boxes = np.array([2, 3], np.int32)
    for i in range(n):
        for j in range(int(num_boxes[i])):
            y, x = rng.uniform(0, 0.5, 2)
            h, w = rng.uniform(0.2, 0.45, 2)
            gt_boxes[i, j] = [y, x, min(y + h, 1.0), min(x + w, 1.0)]
            gt_labels[i, j] = rng.integers(0, cfg.num_classes)
    batch = {"images": images_u8, "boxes": gt_boxes, "labels": gt_labels,
             "num_boxes": num_boxes}

    anchors = np.asarray(det.anchors, np.float64).astype(np.float32)
    targets_list = [
        _numpy_targets(anchors, gt_boxes[i, :num_boxes[i]],
                       gt_labels[i, :num_boxes[i]], cfg.num_classes)
        for i in range(n)
    ]

    # --- targets parity: batched einsum machinery == scalar recipe -------
    from ssd_tpu.ops.targets import create_targets
    t = create_targets(det.anchors, gt_boxes, gt_labels, num_boxes,
                       cfg.num_classes, cfg.matcher)
    np.testing.assert_allclose(
        np.asarray(t.reg_targets),
        np.stack([tl[0] for tl in targets_list]), atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(t.cls_targets),
        np.stack([tl[1] for tl in targets_list]))
    np.testing.assert_array_equal(
        np.asarray(t.reg_weights), np.stack([tl[3] for tl in targets_list]))
    np.testing.assert_array_equal(
        np.asarray(t.cls_weights), np.stack([tl[2] for tl in targets_list]))

    # --- flax side: the exact loss the train step differentiates ---------
    import jax as _jax
    import jax.numpy as jnp

    def flax_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        total, _ = det.loss(v, batch, train=False)
        return total

    j_loss, j_grads = _jax.value_and_grad(flax_loss)(variables["params"])

    # --- TF side: independent loss on the mirror, same batch -------------
    with tf.GradientTape() as tape:
        logits, deltas = kmodel(tf.constant(norm), training=False)
        loss_t = _tf_detection_loss(logits, deltas, targets_list, cfg)
        l2 = tf.add_n([tf.reduce_sum(tf.square(v))
                       for v in kmodel.trainable_variables
                       if v.shape.rank >= 2]) * 0.5 * wd
        total_t = loss_t + l2
    t_grads = tape.gradient(total_t, kmodel.trainable_variables)

    np.testing.assert_allclose(float(j_loss), float(total_t), rtol=2e-4)

    # --- (a) TIGHT: loss gradients wrt raw outputs on IDENTICAL inputs ---
    # feeding both losses the same (logits, deltas) removes the stacks'
    # ~5e-4 forward float noise; the two gradient formulas must then agree
    # to float precision
    lg0 = np.asarray(logits)
    dl0 = np.asarray(deltas)

    def jl_outputs(lg, dl):
        from ssd_tpu.ops import losses as L
        return L.detection_loss(lg, dl, t, cfg.losses).total

    jgl, jgd = _jax.grad(jl_outputs, argnums=(0, 1))(
        jnp.asarray(lg0), jnp.asarray(dl0))
    lg_v, dl_v = tf.Variable(lg0), tf.Variable(dl0)
    with tf.GradientTape() as tape2:
        tv = _tf_detection_loss(lg_v, dl_v, targets_list, cfg)
    tgl, tgd = tape2.gradient(tv, [lg_v, dl_v])
    np.testing.assert_allclose(np.asarray(jgl), tgl.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jgd), tgd.numpy(), atol=1e-6)

    # --- (b) TIGHT: full-chain backprop parity with a fixed linear probe -
    # d(sum(logits*R1)+sum(deltas*R2))/dparams exercises every layer's
    # backward pass without the focal loss's curvature amplifying forward
    # noise; both stacks must agree to ~1e-5 of the global gradient scale
    rngp = np.random.default_rng(11)
    r1 = rngp.normal(0, 1, lg0.shape).astype(np.float32)
    r2 = rngp.normal(0, 1, dl0.shape).astype(np.float32)

    def probe(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        lg, dl = det.apply(v, jnp.asarray(norm))
        return jnp.sum(lg * r1) + jnp.sum(dl * r2)

    pj_grads = _jax.grad(probe)(variables["params"])
    with tf.GradientTape() as tape3:
        lg_t, dl_t = kmodel(tf.constant(norm), training=False)
        pt = tf.reduce_sum(lg_t * r1) + tf.reduce_sum(dl_t * r2)
    pt_grads = tape3.gradient(pt, kmodel.trainable_variables)

    # var identity -> (layer name, weight kind); Keras 3 variable names no
    # longer embed the layer path, so walk layers explicitly
    var_meta = {}
    for layer in kmodel.layers:
        for w in layer.trainable_weights:
            wname = w.name.split(":")[0].rsplit("/", 1)[-1]
            if (isinstance(layer, tf.keras.layers.DepthwiseConv2D)
                    and "kernel" in wname):
                wname = "depthwise_kernel"
            var_meta[id(w)] = (layer.name, wname)

    def grads_by_name(grad_list):
        return {var_meta[id(v)]: np.asarray(g)
                for v, g in zip(kmodel.trainable_variables, grad_list)}

    def compare_trees(jtree, t_by_name, abs_tol_frac, label):
        flat = _jax.tree_util.tree_flatten_with_path(jtree)[0]
        assert len(flat) == len(t_by_name), label
        global_scale = max(
            float(np.abs(np.asarray(g)).max()) for _, g in flat)
        for path, g in flat:
            layer, attr = _keras_name_for(path)
            key = (layer, attr)
            if key not in t_by_name and attr == "kernel":
                key = (layer, "depthwise_kernel")
            if key not in t_by_name and layer.endswith(".conv"):
                key = (layer[:-5], attr)  # fpn convs: flax nests a .conv
            tg = t_by_name[key]
            g = np.asarray(g)
            if key[1] == "depthwise_kernel":  # (k,k,1,C) <-> (k,k,C,1)
                g = g.transpose(0, 1, 3, 2)
            assert g.shape == tg.shape, (label, key, g.shape, tg.shape)
            diff = np.abs(g - tg).max()
            assert diff < abs_tol_frac * global_scale, (
                label, key, diff, global_scale)

    compare_trees(pj_grads, grads_by_name(pt_grads), 1e-4, "probe")

    # --- (c) end-to-end: full train-step gradients --------------------
    # looser bound BY DESIGN: the end-to-end diff is second-order — the
    # stacks' ~5e-4 forward noise passed through the focal loss's
    # curvature — measured ~4e-3 of the global grad scale on
    # cancellation-heavy BN-beta sums; (a)+(b) above pin each factor
    # exactly, this asserts their composition stays bounded
    compare_trees(j_grads, grads_by_name(t_grads), 2e-2, "end-to-end")
