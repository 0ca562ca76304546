"""Data layer tests: tfrecord wire format, augmentations, pipeline."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from ssd_tpu.config import Config, DataConfig, ModelConfig
from ssd_tpu.data import native
from ssd_tpu.data.augment import (augment_example, random_crop_with_boxes,
                                  random_flip)
from ssd_tpu.data.pipeline import Pipeline, ShardIndex
from ssd_tpu.data.tfrecord import (RecordWriter, decode_detection_example,
                                   encode_detection_example, read_records,
                                   record_offsets)


def make_jpeg(rng, h=96, w=128):
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def write_dataset(path, rng, n=12):
    with RecordWriter(path) as w:
        for i in range(n):
            boxes = np.array([[0.2, 0.2, 0.6, 0.6], [0.1, 0.5, 0.5, 0.9]],
                             np.float32)[: 1 + i % 2]
            labels = np.arange(len(boxes), dtype=np.int64)
            w.write(encode_detection_example(make_jpeg(rng), boxes, labels))
    return path


def test_example_roundtrip(rng):
    boxes = rng.uniform(0, 1, (5, 4)).astype(np.float32)
    labels = rng.integers(0, 10, 5)
    payload = encode_detection_example(b"\xff\xd8jpg", boxes, labels)
    j, b, l = decode_detection_example(payload)
    assert j == b"\xff\xd8jpg"
    np.testing.assert_allclose(b, boxes, atol=1e-7)
    np.testing.assert_array_equal(l, labels)


def test_example_roundtrip_empty_boxes():
    payload = encode_detection_example(
        b"x", np.zeros((0, 4), np.float32), np.zeros(0, np.int64)
    )
    j, b, l = decode_detection_example(payload)
    assert b.shape == (0, 4) and len(l) == 0


def test_record_framing_and_offsets(tmp_path, rng):
    p = write_dataset(str(tmp_path / "a.tfrecords"), rng, 7)
    payloads = list(read_records(p, verify_crc=True))
    assert len(payloads) == 7
    offs = record_offsets(p)
    assert len(offs) == 7
    with open(p, "rb") as f:
        f.seek(offs[3][0])
        assert f.read(offs[3][1]) == payloads[3]


def test_shard_index_random_access(tmp_path, rng):
    p1 = write_dataset(str(tmp_path / "a.tfrecords"), rng, 5)
    p2 = write_dataset(str(tmp_path / "b.tfrecords"), rng, 4)
    idx = ShardIndex([p1, p2])
    assert len(idx) == 9
    direct = list(read_records(p2))
    assert idx.read(5 + 2) == direct[2]


def test_crop_preserves_box_validity(rng):
    image = rng.integers(0, 255, (100, 150, 3)).astype(np.uint8)
    boxes = np.array([[0.3, 0.3, 0.7, 0.7]], np.float32)
    labels = np.array([2])
    for trial in range(20):
        r = np.random.default_rng(trial)
        img, b, l = random_crop_with_boxes(image, boxes, labels, r)
        assert img.size > 0
        if len(b):
            assert np.all(b >= -1e-6) and np.all(b <= 1 + 1e-6)
            assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])
            assert len(l) == len(b)


def test_flip_flips_pixels_and_boxes(rng):
    image = np.zeros((10, 10, 3), np.uint8)
    image[:, :5] = 255  # left half white
    boxes = np.array([[0.0, 0.0, 1.0, 0.5]], np.float32)
    r = np.random.default_rng(0)
    img, b = random_flip(image, boxes, r, probability=1.0)
    assert img[0, -1, 0] == 255 and img[0, 0, 0] == 0
    np.testing.assert_allclose(b, [[0.0, 0.5, 1.0, 1.0]], atol=1e-6)


def _small_cfg():
    return Config(
        num_classes=4, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
        data=DataConfig(max_gt_boxes=8),
    )


def test_pipeline_contract(tmp_path, rng):
    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 12)
    cfg = _small_cfg()
    pipe = Pipeline(p, cfg, is_training=True, batch_size=4, seed=1)
    batch = next(iter(pipe))
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["images"].dtype == np.uint8
    assert batch["boxes"].shape == (4, 8, 4)
    assert batch["labels"].shape == (4, 8)
    assert batch["num_boxes"].shape == (4,)
    assert np.all(batch["num_boxes"] >= 0)
    # images should have real content (not all zeros)
    assert batch["images"].mean() > 10


def test_pipeline_determinism_and_resume(tmp_path, rng):
    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 12)
    cfg = _small_cfg()

    pipe1 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=7)
    it1 = pipe1._generate()
    batches1 = [next(it1) for _ in range(5)]

    # fresh pipeline, same seed -> identical stream
    pipe2 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=7)
    it2 = pipe2._generate()
    batches2 = [next(it2) for _ in range(5)]
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["boxes"], b["boxes"])

    # resume from saved state after consuming 3 batches -> stream continues
    # at batch 3 (state derives from CONSUMED batches; the prefetch thread
    # may have produced further ahead)
    pipe3 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=0)
    it3 = iter(pipe3)
    for i in range(3):
        next(it3)
    state_after_3 = pipe3.state()
    assert state_after_3 == {"epoch": 1, "position": 0, "seed": 0}  # nb=3

    pipe4 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=0)
    pipe4.restore(state_after_3)
    b4 = next(iter(pipe4))
    b3 = next(it3)
    np.testing.assert_array_equal(b3["images"], b4["images"])


def test_pipeline_multihost_sharding(tmp_path, rng):
    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 12)
    cfg = _small_cfg()
    seen = set()
    for host in range(2):
        pipe = Pipeline(p, cfg, is_training=False, batch_size=2,
                        host_id=host, num_hosts=2)
        ids = set(pipe._local.tolist())
        assert not (seen & ids)
        seen |= ids
    assert len(seen) == 12


def test_eval_pipeline_terminates(tmp_path, rng):
    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 8)
    cfg = _small_cfg()
    pipe = Pipeline(p, cfg, is_training=False, batch_size=4)
    batches = list(pipe)
    assert len(batches) == 2


def test_native_decode_matches_pil(rng):
    data = make_jpeg(rng, 64, 80)
    ours = native.decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == pil.shape
    assert np.abs(ours.astype(int) - pil.astype(int)).mean() < 2.0


def test_eval_pipeline_pads_tail_no_drop_no_dup(tmp_path, rng):
    """17 examples @ batch 16 -> 2 batches, 17 valid rows, zero duplicates
    (VERDICT r1 #5: eval must neither drop the tail nor tile tiny sets)."""
    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 17)
    cfg = _small_cfg()
    pipe = Pipeline(p, cfg, is_training=False, batch_size=16)
    batches = list(pipe)
    assert len(batches) == 2
    valid = np.concatenate([b["valid"] for b in batches])
    assert int(valid.sum()) == 17
    # padded rows are inert: no gt, zero image
    assert batches[1]["valid"].tolist() == [True] + [False] * 15
    assert batches[1]["num_boxes"][1:].sum() == 0
    # tiny val set (3 < batch 16): one padded batch, no duplication
    pipe2 = Pipeline(p, cfg, is_training=False, batch_size=16)
    pipe2._local = pipe2._local[:3]
    pipe2._eval_batches = 1
    (b,) = list(pipe2)
    assert int(b["valid"].sum()) == 3


def test_eval_batching_invariance_of_map(tmp_path, rng):
    """mAP over a 17-example val set is identical at batch 16 and batch 1
    when fed the same per-example detections (VERDICT r1 #5 done-criterion)."""
    from ssd_tpu.eval.coco_map import DetectionEvaluator

    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 17)
    cfg = _small_cfg()

    def run(batch_size):
        ev = DetectionEvaluator(4)
        for batch in Pipeline(p, cfg, is_training=False,
                              batch_size=batch_size):
            b = len(batch["images"])
            # synthetic detections derived from each example's OWN gt, so
            # they are batching-independent: gt boxes jittered + one FP
            boxes = np.zeros((b, 8, 4), np.float32)
            scores = np.zeros((b, 8), np.float32)
            labels = np.zeros((b, 8), np.int32)
            nd = np.zeros((b,), np.int32)
            for j in range(b):
                k = int(batch["num_boxes"][j])
                boxes[j, :k] = np.clip(batch["boxes"][j, :k] + 0.01, 0, 1)
                scores[j, :k] = 0.9
                labels[j, :k] = batch["labels"][j, :k]
                boxes[j, k] = [0.0, 0.0, 0.05, 0.05]
                scores[j, k] = 0.5
                nd[j] = k + 1
            ev.add_batch(
                {"boxes": boxes, "scores": scores, "labels": labels,
                 "num_boxes": nd},
                batch["boxes"], batch["labels"], batch["num_boxes"],
                valid=batch.get("valid"),
            )
        return ev.result()

    a, b = run(16), run(1)
    assert a["mAP"] == b["mAP"] and a["AP50"] == b["AP50"]


def test_prefetch_thread_errors_propagate(tmp_path):
    """A crash in the prefetch thread must raise in the consumer, not
    silently end the stream (which made eval report nan mAP over zero
    batches instead of the real traceback)."""
    rng = np.random.default_rng(0)
    path = write_dataset(str(tmp_path / "x.tfrecords"), rng, 4)
    cfg = _small_cfg()
    p = Pipeline(path, cfg, is_training=False, batch_size=2)
    p._make_batch = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("decode exploded"))
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(iter(p))


def test_detection_record_carries_dims_and_source_id():
    """image/height+width and image/source_id come back from the SINGLE
    record parse; older records without them decode to None (ADVICE r2)."""
    from ssd_tpu.data.tfrecord import (decode_detection_record,
                                       encode_detection_example)

    boxes = np.asarray([[0.1, 0.2, 0.6, 0.9]], np.float32)
    labels = np.asarray([3], np.int64)
    new = encode_detection_example(b"jpegbytes", boxes, labels,
                                   source_id=42, image_hw=(480, 640))
    r = decode_detection_record(new)
    assert r["jpeg"] == b"jpegbytes"
    assert r["source_id"] == 42
    assert (r["height"], r["width"]) == (480, 640)
    np.testing.assert_allclose(r["boxes"], boxes)

    old = encode_detection_example(b"jpegbytes", boxes, labels)
    r = decode_detection_record(old)
    assert r["source_id"] is None
    assert r["height"] is None and r["width"] is None


def test_pipeline_crowd_flags(tmp_path):
    """Crowd boxes never reach training targets but ride into eval batches
    as ignore flags (VERDICT r2 #6)."""
    import io as _io
    import sys

    from PIL import Image as _Image

    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.data.tfrecord import RecordWriter, encode_detection_example

    sys.path.insert(0, "tests")
    from test_e2e import make_cfg

    buf = _io.BytesIO()
    _Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "JPEG")
    jpeg = buf.getvalue()
    boxes = np.array([[0.1, 0.1, 0.4, 0.4],
                      [0.5, 0.5, 0.9, 0.9]], np.float32)
    labels = np.array([0, 1], np.int64)
    path = tmp_path / "train.tfrecords"
    with RecordWriter(str(path)) as w:
        for _ in range(4):
            w.write(encode_detection_example(
                jpeg, boxes, labels, is_crowd=[0, 1]))

    cfg = make_cfg(tmp_path)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4),
        data=dataclasses.replace(cfg.data,
                                 train_file_pattern=str(path),
                                 val_file_pattern=str(path)))

    train_batch = next(iter(Pipeline(str(path), cfg, is_training=True,
                                     batch_size=4)))
    # the crowd box (label 1) was dropped before target creation
    np.testing.assert_array_equal(train_batch["num_boxes"], [1, 1, 1, 1])
    assert (train_batch["labels"][:, 0] == 0).all()

    eval_batch = next(iter(Pipeline(str(path), cfg, is_training=False,
                                    batch_size=4)))
    np.testing.assert_array_equal(eval_batch["num_boxes"], [2, 2, 2, 2])
    np.testing.assert_array_equal(eval_batch["is_crowd"][0, :2], [False, True])


# ----------------------------------------------------------------- mosaic

def test_mosaic_example_geometry():
    """Quadrant placement + box remapping: solid-color source images with
    one full-frame box each must land in their quadrant exactly."""
    from ssd_tpu.data.augment import mosaic_example

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    images = [np.full((40 + 8 * i, 50, 3), c, np.uint8)
              for i, c in enumerate(colors)]
    boxes = [np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)] * 4
    labels = [np.array([i]) for i in range(4)]
    rng = np.random.default_rng(3)
    canvas, out_boxes, out_labels = mosaic_example(
        images, boxes, labels, rng, (64, 64))
    assert canvas.shape == (128, 128, 3)
    assert out_boxes.shape == (4, 4)
    assert sorted(out_labels.tolist()) == [0, 1, 2, 3]
    # each full-frame box = its quadrant; quadrants tile the canvas exactly
    for b, lab in zip(out_boxes, out_labels):
        y0, x0, y1, x1 = (b * 128).round().astype(int)
        region = canvas[y0 + 2:y1 - 2, x0 + 2:x1 - 2]  # inset for jpeg-free exactness
        expected = np.array(colors[int(lab)])
        assert np.abs(region.astype(int) - expected).max() <= 30, lab
    # coverage: the four boxes partition [0,1]^2 (areas sum to 1)
    areas = ((out_boxes[:, 2] - out_boxes[:, 0])
             * (out_boxes[:, 3] - out_boxes[:, 1]))
    np.testing.assert_allclose(areas.sum(), 1.0, atol=0.02)


def test_mosaic_example_empty_boxes():
    from ssd_tpu.data.augment import mosaic_example

    images = [np.zeros((32, 32, 3), np.uint8)] * 4
    empty = np.zeros((0, 4), np.float32)
    canvas, b, l = mosaic_example(
        images, [empty] * 4, [np.zeros((0,), np.int64)] * 4,
        np.random.default_rng(0), (64, 64))
    assert b.shape == (0, 4) and l.shape == (0,)


def test_pipeline_mosaic_determinism_and_density(tmp_path, rng):
    """mosaic_probability=1: every example composes 4 records (box count
    grows), the stream stays deterministic, and shapes hold."""
    import dataclasses

    p = write_dataset(str(tmp_path / "t.tfrecords"), rng, 12)
    cfg = _small_cfg()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, mosaic_probability=1.0, crop_probability=0.0))

    pipe1 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=5)
    b1 = next(iter(pipe1))
    pipe2 = Pipeline(p, cfg, is_training=True, batch_size=4, seed=5)
    b2 = next(iter(pipe2))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["boxes"], b2["boxes"])
    np.testing.assert_array_equal(b1["num_boxes"], b2["num_boxes"])
    # 4 source records of 1-2 boxes each: every mosaic has >= 4 boxes
    assert (b1["num_boxes"] >= 4).all()
    assert b1["images"].shape == (4, 64, 64, 3)
    # boxes stay normalized
    assert (b1["boxes"] >= 0).all() and (b1["boxes"] <= 1).all()

    # off by default: plain pipeline unaffected (same seed, no mosaic)
    plain = next(iter(Pipeline(p, _small_cfg(), is_training=True,
                               batch_size=4, seed=5)))
    assert (plain["num_boxes"] <= 2).all()
