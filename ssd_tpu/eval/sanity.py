"""Deterministic accuracy smoke for the bench row (``sanity_map``).

VERDICT r4 #6: ``BENCH_r*.json`` carried only speed; accuracy lived in
BENCHMARKS.md prose, so a silent mAP regression between rounds would not
show in the driver artifact. This module gives ``bench.py`` a
machine-captured accuracy field:

  * a tiny flagship-shaped artifact (dense4 MobileNet, 8 classes, 128 px)
    is committed at ``bench_assets/sanity_artifact/`` — trained once by
    ``python -m ssd_tpu.tools.make_bench_artifact`` on fixed-seed
    synthetic crowded scenes (the tools/crowded_validation.py task,
    shrunk);
  * at bench time the SAME generator re-derives the held-out scenes from
    their seed (nothing but the weights is stored), the artifact predicts
    them, and the full COCO evaluator (eval/coco_map.py) scores the
    result. The int8 variant quantizes the same weights through the real
    CLI path (``quant.calibrate``) so quantization accuracy drift is
    captured per round too.

The absolute value is task-specific and only comparable round-over-round
on the same protocol — which is exactly the drift-detection contract.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

SANITY_SEED_TRAIN = 7
SANITY_SEED_VAL = 1234
SANITY_CLASSES = 8
SANITY_SIZE = 128
SANITY_VAL_IMAGES = 32
ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "bench_assets", "sanity_artifact")


def sanity_scene(rng: np.random.Generator):
    """One raw (no JPEG) synthetic crowded scene at the sanity shape."""
    from ssd_tpu.tools.crowded_validation import _palette

    size, num_classes = SANITY_SIZE, SANITY_CLASSES
    palette = _palette(num_classes)
    img = rng.integers(0, 40, (size, size, 3)).astype(np.uint8)
    n = int(rng.integers(8, 25))
    boxes, labels = [], []
    for _ in range(n):
        h = int(rng.integers(10, 49))
        w = int(rng.integers(10, 49))
        y = int(rng.integers(0, size - h))
        x = int(rng.integers(0, size - w))
        c = int(rng.integers(0, num_classes))
        img[y:y + h, x:x + w] = palette[c]
        img[y, x:x + w] = palette[c] // 2
        img[y + h - 1, x:x + w] = palette[c] // 2
        img[y:y + h, x] = palette[c] // 2
        img[y:y + h, x + w - 1] = palette[c] // 2
        boxes.append([y / size, x / size, (y + h) / size, (x + w) / size])
        labels.append(c)
    return img, np.asarray(boxes, np.float32), np.asarray(labels, np.int32)


def sanity_batches(n_images: int, seed: int, batch: int = 8,
                   max_gt: int = 32):
    """Deterministic padded batches: (images u8, boxes, labels, num_boxes).

    ``max_gt`` is fixed (not data-derived) so every batch shares one shape
    — one jit trace for the whole stream."""
    rng = np.random.default_rng(seed)
    scenes = [sanity_scene(rng) for _ in range(n_images)]
    assert max(len(s[2]) for s in scenes) <= max_gt
    for i in range(0, n_images, batch):
        chunk = scenes[i:i + batch]
        while len(chunk) < batch:
            chunk.append(chunk[-1])
        imgs = np.stack([c[0] for c in chunk])
        boxes = np.zeros((batch, max_gt, 4), np.float32)
        labels = np.zeros((batch, max_gt), np.int32)
        nb = np.zeros((batch,), np.int32)
        valid = np.zeros((batch,), bool)
        for j, (_, b, l) in enumerate(chunk):
            boxes[j, :len(l)] = b
            labels[j, :len(l)] = l
            nb[j] = len(l)
            valid[j] = i + j < n_images
        yield imgs, boxes, labels, nb, valid


def sanity_config():
    from ssd_tpu.config import (Config, DataConfig, ModelConfig, NMSConfig,
                                TrainConfig)
    return Config(
        num_classes=SANITY_CLASSES,
        image_size=SANITY_SIZE,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          stem_schedule="dense4", bn_momentum=0.9),
        nms=NMSConfig(),
        train=TrainConfig(batch_size=16, optimizer="adam",
                          learning_rate=1.5e-3, warmup_steps=50),
        data=DataConfig(max_gt_boxes=32),
    )


def evaluate_artifact_map(int8: bool = False,
                          artifact_dir: str = ARTIFACT_DIR) -> float:
    """mAP of the committed sanity artifact on the seed-derived val set."""
    import jax

    from ssd_tpu.eval.coco_map import DetectionEvaluator
    from ssd_tpu.export import load_inference_artifact
    from ssd_tpu.models.detector import Detector

    cfg, variables = load_inference_artifact(artifact_dir)
    if int8:
        from ssd_tpu.quant import calibrate
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, compute_dtype="int8", int8_neck=True))
        det = Detector(cfg)
        cal = next(sanity_batches(8, SANITY_SEED_TRAIN))[0]
        variables, _ = calibrate(det, variables, [cal])
    else:
        det = Detector(cfg)

    predict = jax.jit(det.predict)
    ev = DetectionEvaluator(cfg.num_classes)
    for imgs, boxes, labels, nb, valid in sanity_batches(
            SANITY_VAL_IMAGES, SANITY_SEED_VAL):
        out = jax.device_get(predict(variables, imgs))
        ev.add_batch(out._asdict(), boxes, labels, nb, valid=valid)
    return float(ev.result()["mAP"])
