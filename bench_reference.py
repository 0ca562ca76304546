"""Measure a faithful TF mirror of the reference detector — the baseline.

The reference (TF-1, MobileNet-v1 + FPN + per-class CPU NMS under
``tf.map_fn``) publishes no benchmark numbers and its mount is empty
(BASELINE.md "Open items"). This script reconstructs the same computation in
TF-2 graph mode — identical backbone schedule, FPN, shared subnets, anchor
count, decode, and the reference's serialized per-image per-class
``tf.image.non_max_suppression`` postprocess — and measures images/sec on
this host's CPU (the reference repo itself is CPU/GPU TF; CPU is what this
sandbox can measure). Result is cached to ``reference_baseline.json`` and
used by bench.py as the ``vs_baseline`` denominator.

Run: python bench_reference.py   (takes a few minutes; one-time)
"""

from __future__ import annotations

import json
import time

BATCH = 8          # the TF CPU reference OOMs/slows at 32; rate is per-image
ITERS = 3
IMAGE_SIZE = 640
NUM_CLASSES = 80


def build_and_measure() -> float:
    import numpy as np
    import tensorflow as tf

    tf.config.threading.set_intra_op_parallelism_threads(0)  # all cores

    l = tf.keras.layers

    def conv_bn(x, ch, k=3, s=1, depthwise=False):
        if depthwise:
            x = l.DepthwiseConv2D(k, strides=s, padding="same",
                                  use_bias=False)(x)
        else:
            x = l.Conv2D(ch, k, strides=s, padding="same", use_bias=False)(x)
        x = l.BatchNormalization()(x)
        return l.ReLU(6.0)(x)

    def ds_block(x, ch, s=1):
        x = conv_bn(x, None, 3, s, depthwise=True)
        return conv_bn(x, ch, 1, 1)

    images = tf.keras.Input((IMAGE_SIZE, IMAGE_SIZE, 3), batch_size=BATCH)
    x = conv_bn(images, 32, 3, 2)
    x = ds_block(x, 64)
    x = ds_block(x, 128, 2)
    x = ds_block(x, 128)
    x = ds_block(x, 256, 2)
    x = ds_block(x, 256)
    c3 = x
    x = ds_block(x, 512, 2)
    for _ in range(5):
        x = ds_block(x, 512)
    c4 = x
    x = ds_block(x, 1024, 2)
    c5 = ds_block(x, 1024)

    # FPN P3-P7 (128ch) + shared 4-conv subnets, K=9 anchors/cell
    fpn_ch, k, depth = 128, 9, 4
    p5 = l.Conv2D(fpn_ch, 1)(c5)
    p4 = l.Add()([l.Conv2D(fpn_ch, 1)(c4), l.UpSampling2D()(p5)])
    p3 = l.Add()([l.Conv2D(fpn_ch, 1)(c3), l.UpSampling2D()(p4)])
    p3 = l.Conv2D(fpn_ch, 3, padding="same")(p3)
    p4 = l.Conv2D(fpn_ch, 3, padding="same")(p4)
    p5 = l.Conv2D(fpn_ch, 3, padding="same")(p5)
    p6 = l.Conv2D(fpn_ch, 3, strides=2, padding="same")(c5)
    p7 = l.Conv2D(fpn_ch, 3, strides=2, padding="same")(l.ReLU()(p6))

    cls_convs = [l.Conv2D(fpn_ch, 3, padding="same", activation="relu")
                 for _ in range(depth)]
    cls_out = l.Conv2D(k * NUM_CLASSES, 3, padding="same")
    box_convs = [l.Conv2D(fpn_ch, 3, padding="same", activation="relu")
                 for _ in range(depth)]
    box_out = l.Conv2D(k * 4, 3, padding="same")

    logits_l, deltas_l = [], []
    for p in [p3, p4, p5, p6, p7]:
        cx = p
        for conv in cls_convs:
            cx = conv(cx)
        logits_l.append(l.Reshape((-1, NUM_CLASSES))(cls_out(cx)))
        bx = p
        for conv in box_convs:
            bx = conv(bx)
        deltas_l.append(l.Reshape((-1, 4))(box_out(bx)))
    logits = l.Concatenate(axis=1)(logits_l)
    deltas = l.Concatenate(axis=1)(deltas_l)
    model = tf.keras.Model(images, [logits, deltas])

    num_anchors = logits.shape[1]
    anchors = np.random.uniform(0.2, 0.8, (num_anchors, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + 0.1
    anchors_t = tf.constant(anchors)

    @tf.function
    def predict(images):
        logits, deltas = model(images, training=False)
        scores = tf.sigmoid(logits)
        # reference-style decode
        acy = (anchors_t[:, 0] + anchors_t[:, 2]) / 2
        acx = (anchors_t[:, 1] + anchors_t[:, 3]) / 2
        ah = anchors_t[:, 2] - anchors_t[:, 0]
        aw = anchors_t[:, 3] - anchors_t[:, 1]
        ty, tx, th, tw = tf.unstack(deltas, axis=-1)
        cy = ty / 10.0 * ah + acy
        cx = tx / 10.0 * aw + acx
        h = tf.exp(tf.minimum(th / 5.0, 10.0)) * ah
        w = tf.exp(tf.minimum(tw / 5.0, 10.0)) * aw
        boxes = tf.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
        boxes = tf.clip_by_value(boxes, 0.0, 1.0)

        # the reference's serialized postprocess: map_fn over batch,
        # per-class CPU NMS (SURVEY.md §3.2)
        def per_image(args):
            b, s = args
            outs = []
            for c in range(NUM_CLASSES):
                sc = s[:, c]
                keep = tf.image.non_max_suppression(
                    b, sc, max_output_size=100, iou_threshold=0.5,
                    score_threshold=0.05)
                outs.append(tf.gather(sc, keep))
            merged = tf.concat(outs, 0)
            top = tf.math.top_k(
                tf.pad(merged, [[0, tf.maximum(0, 100 - tf.shape(merged)[0])]]),
                k=100)
            return top.values

        final = tf.map_fn(per_image, (boxes, scores), fn_output_signature=tf.float32)
        return final

    dummy = tf.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), tf.float32)
    predict(dummy)  # trace + warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = predict(dummy)
    _ = r.numpy()
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def main() -> None:
    rate = build_and_measure()
    payload = {
        "images_per_sec": round(rate, 2),
        "config": {
            "model": "mobilenet_v1_fpn_640 (faithful TF mirror)",
            "batch": BATCH,
            "hardware": "host CPU (TF; reference is a TF CPU/GPU codebase)",
            "postprocess": "per-image map_fn, per-class tf.image.non_max_suppression",
        },
        "note": "reference publishes no numbers (BASELINE.json published={}); "
                "this measured stand-in anchors bench.py's vs_baseline",
    }
    with open("reference_baseline.json", "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
