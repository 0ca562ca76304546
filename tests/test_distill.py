"""Knowledge distillation (ops/distill.py + train.distill_from)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.config import Config, ModelConfig, TrainConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.ops.distill import distillation_loss
from ssd_tpu.parallel import (
    create_mesh, create_train_state, jit_train_step, make_optimizer,
    make_train_step, shard_batch,
)

STUDENT = Config(
    num_classes=3,
    image_size=64,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    train=TrainConfig(batch_size=8, num_steps=100, learning_rate=0.01,
                      warmup_steps=0, lr_schedule="cosine"),
)
TEACHER = dataclasses.replace(
    STUDENT, model=dataclasses.replace(
        STUDENT.model, width_multiplier=0.5, fpn_channels=48))


def _batch(rng, n=8, size=64, max_gt=4):
    images = rng.integers(0, 255, (n, size, size, 3)).astype(np.uint8)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    labels = np.zeros((n, max_gt), np.int32)
    num = np.ones((n,), np.int32)
    for i in range(n):
        boxes[i, 0] = [0.2, 0.2, 0.7, 0.7]
        labels[i, 0] = i % 3
    return {"images": images, "boxes": boxes, "labels": labels,
            "num_boxes": num}


def _raw(cfg, variables, images, flatten):
    det = Detector(cfg)
    from ssd_tpu.models.detector import normalize_images
    return det.model.apply(variables, normalize_images(images),
                           train=False, flatten=flatten)


def test_zero_when_teacher_equals_student(rng):
    det = Detector(STUDENT)
    v = det.init(jax.random.PRNGKey(0))
    images = jnp.asarray(_batch(rng)["images"])
    raw = _raw(STUDENT, v, images, flatten=True)
    dd = distillation_loss(raw, raw, STUDENT.num_classes)
    assert float(dd.total) == pytest.approx(0.0, abs=1e-5)
    assert float(dd.classification) == pytest.approx(0.0, abs=1e-5)
    assert float(dd.localization) == 0.0


def test_positive_and_layout_consistent(rng):
    """Different weights -> positive loss; flat == per-level layout."""
    sd = Detector(STUDENT)
    td = Detector(TEACHER)
    sv = sd.init(jax.random.PRNGKey(0))
    tv = td.init(jax.random.PRNGKey(1))
    images = jnp.asarray(_batch(rng)["images"])

    flat = distillation_loss(
        _raw(STUDENT, sv, images, True), _raw(TEACHER, tv, images, True),
        STUDENT.num_classes)
    levels = distillation_loss(
        _raw(STUDENT, sv, images, False), _raw(TEACHER, tv, images, False),
        STUDENT.num_classes)

    assert float(flat.total) > 0.0
    assert float(flat.classification) > 0.0
    assert float(flat.localization) > 0.0
    np.testing.assert_allclose(float(flat.total), float(levels.total),
                               rtol=1e-4)


def test_geometry_mismatch_rejected(rng):
    sd = Detector(STUDENT)
    sv = sd.init(jax.random.PRNGKey(0))
    wrong = dataclasses.replace(STUDENT, num_classes=5)
    wd = Detector(wrong)
    wv = wd.init(jax.random.PRNGKey(1))
    images = jnp.asarray(_batch(rng)["images"])
    with pytest.raises(ValueError, match="shapes differ"):
        distillation_loss(_raw(STUDENT, sv, images, True),
                          _raw(wrong, wv, images, True),
                          STUDENT.num_classes)


def test_train_step_with_teacher(rng):
    """The distilled step runs sharded, reports the metric, and pulls the
    student toward the teacher (distill loss decreases over steps on a
    fixed batch with a pure-distillation objective)."""
    mesh = create_mesh()
    # pure-distillation objective (gt terms off) so the distill metric
    # must decrease monotonically-ish on a fixed batch
    cfg = dataclasses.replace(
        STUDENT,
        losses=dataclasses.replace(
            STUDENT.losses, classification_weight=0.0,
            localization_weight=0.0, weight_decay=0.0),
    )
    sd = Detector(cfg)
    td = Detector(TEACHER)
    tv = td.init(jax.random.PRNGKey(7))
    tx = make_optimizer(cfg)
    state = create_train_state(sd, jax.random.PRNGKey(0), tx)
    step = jit_train_step(
        make_train_step(sd, tx, teacher=(td.model, tv)), mesh)
    batch = shard_batch(mesh, _batch(rng))

    first = last = None
    for _ in range(8):
        state, metrics = step(state, batch)
        last = float(metrics["distill_loss"])
        if first is None:
            first = last
    assert np.isfinite(last)
    assert "distill_loss" in metrics
    assert last < first  # student is moving toward the teacher


def test_train_cli_with_distillation(tmp_path, rng):
    """End-to-end: export a teacher artifact, then train a student with
    train.distill_from through the real driver."""
    from ssd_tpu.data.tfrecord import RecordWriter, encode_detection_example
    from ssd_tpu.export import save_inference_artifact
    from ssd_tpu.train import train

    # teacher artifact (random weights are fine — we test plumbing)
    td = Detector(TEACHER)
    tv = td.init(jax.random.PRNGKey(3))
    teacher_dir = str(tmp_path / "teacher")
    save_inference_artifact(teacher_dir, TEACHER, tv)

    # tiny dataset
    import io

    from PIL import Image
    data = str(tmp_path / "train.tfrecords")
    r = np.random.default_rng(0)
    with RecordWriter(data) as w:
        for _ in range(16):
            img = r.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG")
            w.write(encode_detection_example(
                buf.getvalue(),
                np.asarray([[0.2, 0.2, 0.7, 0.7]], np.float32),
                np.asarray([1], np.int64), image_hw=(64, 64)))

    cfg = dataclasses.replace(
        STUDENT,
        train=dataclasses.replace(
            STUDENT.train, distill_from=teacher_dir, num_steps=2,
            checkpoint_every=100, eval_every=0, log_every=1,
            batch_size=8),
        data=dataclasses.replace(
            STUDENT.data, train_file_pattern=data,
            val_file_pattern=str(tmp_path / "missing.tfrecords")),
    )
    metrics = train(cfg, str(tmp_path / "run"), resume=False)
    assert np.isfinite(metrics["loss"])
    assert "distill_loss" in metrics
    assert os.path.isdir(str(tmp_path / "run" / "export"))


def test_teacher_class_mismatch_rejected(tmp_path):
    from ssd_tpu.export import save_inference_artifact
    from ssd_tpu.train import train

    wrong = dataclasses.replace(TEACHER, num_classes=7)
    td = Detector(wrong)
    tv = td.init(jax.random.PRNGKey(3))
    teacher_dir = str(tmp_path / "teacher")
    save_inference_artifact(teacher_dir, wrong, tv)

    cfg = dataclasses.replace(
        STUDENT, train=dataclasses.replace(
            STUDENT.train, distill_from=teacher_dir, num_steps=1))
    with pytest.raises(ValueError, match="classes"):
        train(cfg, str(tmp_path / "run"), resume=False)
