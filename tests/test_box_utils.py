import jax.numpy as jnp
import numpy as np

from ssd_tpu.ops import box_utils


def random_boxes(rng, *shape):
    lo = rng.uniform(0.0, 0.8, size=shape + (2,))
    hi = lo + rng.uniform(0.05, 0.2, size=shape + (2,))
    return np.concatenate(
        [lo[..., :1], lo[..., 1:], hi[..., :1], hi[..., 1:]], axis=-1
    ).astype(np.float32)


def iou_numpy(b1, b2):
    n, m = b1.shape[0], b2.shape[0]
    out = np.zeros((n, m), dtype=np.float64)
    for i in range(n):
        for j in range(m):
            y0 = max(b1[i, 0], b2[j, 0]); x0 = max(b1[i, 1], b2[j, 1])
            y1 = min(b1[i, 2], b2[j, 2]); x1 = min(b1[i, 3], b2[j, 3])
            inter = max(y1 - y0, 0) * max(x1 - x0, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            out[i, j] = inter / max(a1 + a2 - inter, 1e-8)
    return out


def test_area(rng):
    boxes = np.array([[0.0, 0.0, 0.5, 0.5], [0.2, 0.2, 0.2, 0.8]], np.float32)
    np.testing.assert_allclose(box_utils.area(boxes), [0.25, 0.0], atol=1e-6)


def test_iou_matches_numpy_oracle(rng):
    b1, b2 = random_boxes(rng, 13), random_boxes(rng, 7)
    got = np.asarray(box_utils.iou(b1, b2))
    np.testing.assert_allclose(got, iou_numpy(b1, b2), atol=1e-5)


def test_iou_identity_and_disjoint():
    b = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    far = np.array([[0.6, 0.6, 0.9, 0.9]], np.float32)
    np.testing.assert_allclose(box_utils.iou(b, b), [[1.0]], atol=1e-6)
    np.testing.assert_allclose(box_utils.iou(b, far), [[0.0]], atol=1e-6)


def test_iou_batched_broadcast(rng):
    b1 = random_boxes(rng, 3, 5)
    b2 = random_boxes(rng, 3, 4)
    got = np.asarray(box_utils.iou(b1, b2))
    assert got.shape == (3, 5, 4)
    for n in range(3):
        np.testing.assert_allclose(got[n], iou_numpy(b1[n], b2[n]), atol=1e-5)


def test_encode_decode_roundtrip(rng):
    boxes = random_boxes(rng, 64)
    anchors = random_boxes(rng, 64)
    codes = box_utils.encode(boxes, anchors)
    back = np.asarray(box_utils.decode(codes, anchors))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_encode_zero_for_matching_anchor(rng):
    anchors = random_boxes(rng, 8)
    codes = np.asarray(box_utils.encode(anchors, anchors))
    np.testing.assert_allclose(codes, np.zeros_like(codes), atol=1e-5)


def test_center_corner_roundtrip(rng):
    boxes = random_boxes(rng, 16)
    back = np.asarray(box_utils.to_corner_form(box_utils.to_center_form(boxes)))
    np.testing.assert_allclose(back, boxes, atol=1e-6)


def test_clip_boxes():
    boxes = np.array([[-0.2, 0.5, 0.7, 1.3]], np.float32)
    got = np.asarray(box_utils.clip_boxes(boxes))
    np.testing.assert_allclose(got, [[0.0, 0.5, 0.7, 1.0]], atol=1e-6)


def test_flip_boxes(rng):
    boxes = random_boxes(rng, 10)
    flipped = np.asarray(box_utils.flip_boxes_horizontally(boxes))
    twice = np.asarray(box_utils.flip_boxes_horizontally(flipped))
    np.testing.assert_allclose(twice, boxes, atol=1e-6)
    # flip preserves IoU structure
    np.testing.assert_allclose(
        np.asarray(box_utils.iou(boxes, boxes)),
        np.asarray(box_utils.iou(flipped, flipped)),
        atol=1e-5,
    )


def test_decode_is_stable_for_large_logits():
    anchors = np.array([[0.4, 0.4, 0.6, 0.6]], np.float32)
    codes = np.array([[1e4, -1e4, 1e4, 1e4]], np.float32)
    out = np.asarray(box_utils.decode(codes, anchors))
    assert np.all(np.isfinite(out))
