"""Robustness: corrupt inputs, edge shapes, fuzzed kernel parity."""

import io

import numpy as np
import pytest
from PIL import Image

from ssd_tpu.config import NMSConfig
from ssd_tpu.data import native
from ssd_tpu.data.tfrecord import (RecordWriter, encode_detection_example,
                                   read_records)


def test_truncated_record_file_stops_cleanly(tmp_path):
    p = str(tmp_path / "t.tfrecords")
    payload = encode_detection_example(
        b"x" * 100, np.zeros((1, 4), np.float32), np.zeros(1, np.int64))
    with RecordWriter(p) as w:
        w.write(payload)
        w.write(payload)
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: len(data) - 7])  # chop mid-record
    got = list(read_records(p))
    assert len(got) == 1  # second record dropped, no exception


def test_corrupt_crc_detected(tmp_path):
    p = str(tmp_path / "t.tfrecords")
    payload = encode_detection_example(
        b"y" * 50, np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
    with RecordWriter(p) as w:
        w.write(payload)
    data = bytearray(open(p, "rb").read())
    data[20] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(read_records(p, verify_crc=True))
    # without verification the (corrupt) payload still frames correctly
    assert len(list(read_records(p))) == 1


def test_non_tfrecord_file_raises_clear_error(tmp_path):
    """A JSON sidecar swept in by a broad glob must fail with a named error.

    ``record_offsets`` used to trust the first 8 bytes as a length and
    drive ``seek`` into EINVAL; now the header CRC check rejects the file
    with a message naming it (seen live: ``train-*`` matching the
    ``train-label_map.json`` sidecar written by create_tfrecords).
    """
    from ssd_tpu.data.tfrecord import record_offsets

    p = str(tmp_path / "train-label_map.json")
    with open(p, "w") as f:
        f.write('{"red": 1, "green": 2}')
    with pytest.raises(IOError, match="label_map"):
        record_offsets(p)


def test_record_offsets_truncated_tail_stops_cleanly(tmp_path):
    from ssd_tpu.data.tfrecord import record_offsets

    p = str(tmp_path / "t.tfrecords")
    payload = encode_detection_example(
        b"x" * 100, np.zeros((1, 4), np.float32), np.zeros(1, np.int64))
    with RecordWriter(p) as w:
        w.write(payload)
        w.write(payload)
    full = record_offsets(p)
    assert len(full) == 2
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: len(data) - 7])  # chop mid-record
    assert record_offsets(p) == full[:1]


def test_invalid_jpeg_falls_back_gracefully():
    out = native.decode_jpeg_batch([b"not a jpeg at all"], 32, 32)
    assert out.shape == (1, 32, 32, 3)
    assert not out.any()  # zeroed slot, no crash


def test_grayscale_jpeg_decodes():
    img = np.random.default_rng(0).integers(0, 255, (40, 40)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, "JPEG")
    out = native.decode_jpeg(buf.getvalue())
    assert out.shape == (40, 40, 3)
    # channels equal (gray expanded)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_nms_fuzz_vs_oracle(rng):
    from ssd_tpu.ops.nms_pallas import batched_nms_pallas
    from tests.test_nms import nms_oracle
    for seed in range(6):
        r = np.random.default_rng(seed)
        n, a, c = int(r.integers(1, 3)), int(r.integers(10, 120)), int(r.integers(1, 5))
        lo = r.uniform(0, 0.7, (n, a, 2))
        hi = lo + r.uniform(0.01, 0.3, (n, a, 2))
        boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
        scores = (r.permutation(n * a * c).astype(np.float32)
                  / (n * a * c)).reshape(n, a, c)
        thr = float(r.uniform(0.05, 0.5))
        iou_thr = float(r.uniform(0.3, 0.7))
        cfg = NMSConfig(score_threshold=thr, iou_threshold=iou_thr,
                        max_boxes=a * c, pre_nms_top_k=a)
        det = batched_nms_pallas(boxes, scores, cfg, interpret=True)
        for i in range(n):
            want = sorted(
                round(float(scores[i, j, cl]), 6)
                for cl in range(c)
                for j in nms_oracle(boxes[i], scores[i, :, cl], iou_thr, thr)
            )
            nb = int(det.num_boxes[i])
            got = sorted(round(float(np.asarray(det.scores)[i, q]), 6)
                         for q in range(nb))
            assert got == want, (seed, i)


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp
    from ssd_tpu.utils import profiling
    with profiling.annotate("unit-test-region"):
        _ = jnp.ones(8).sum()
    with profiling.trace(str(tmp_path / "trace")):
        _ = (jnp.ones(16) * 2).sum()
    import glob
    assert glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)


def test_degenerate_boxes_do_not_nan():
    import jax.numpy as jnp
    from ssd_tpu.ops import box_utils
    degenerate = jnp.asarray([[0.5, 0.5, 0.5, 0.5]], jnp.float32)
    normal = jnp.asarray([[0.4, 0.4, 0.6, 0.6]], jnp.float32)
    out = np.asarray(box_utils.iou(degenerate, normal))
    assert np.isfinite(out).all() and out[0, 0] == 0.0
    codes = box_utils.encode(normal, degenerate)
    assert np.isfinite(np.asarray(codes)).all()


def test_native_index_matches_python(tmp_path):
    """C++ tfrecord_index == Python record_offsets on every edge case."""
    from ssd_tpu.data.tfrecord import record_offsets

    lib = native._load()
    if lib is None or not hasattr(lib, "ssd_tfrecord_index"):
        pytest.skip("native lib unavailable")  # pragma: no cover

    p = str(tmp_path / "t.tfrecords")
    payload = encode_detection_example(
        b"z" * 77, np.zeros((2, 4), np.float32), np.zeros(2, np.int64))
    with RecordWriter(p) as w:
        for _ in range(5):
            w.write(payload)
    assert native.tfrecord_index(p) == record_offsets(p)

    # truncated tail: both stop cleanly at the same count
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: len(data) - 9])
    assert native.tfrecord_index(p) == record_offsets(p)

    # empty file
    open(p, "wb").close()
    assert native.tfrecord_index(p) == record_offsets(p) == []

    # non-tfrecord file: same loud error (must exceed one 12-byte header;
    # anything shorter reads as a clean truncated tail in both walkers)
    j = str(tmp_path / "train-label_map.json")
    open(j, "w").write('{"red": 1, "green": 2, "blue": 3}')
    with pytest.raises(IOError, match="label_map"):
        native.tfrecord_index(j)
    with pytest.raises(IOError, match="label_map"):
        record_offsets(j)
