import numpy as np

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops.nms import batched_nms, greedy_suppression_mask


def nms_oracle(boxes, scores, iou_thr, score_thr):
    """O(n^2) single-class greedy NMS in numpy. Returns kept indices."""
    idx = np.argsort(-scores, kind="stable")
    kept = []
    for i in idx:
        if scores[i] < score_thr:
            continue
        ok = True
        for j in kept:
            y0 = max(boxes[i, 0], boxes[j, 0]); x0 = max(boxes[i, 1], boxes[j, 1])
            y1 = min(boxes[i, 2], boxes[j, 2]); x1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(y1 - y0, 0) * max(x1 - x0, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-8) > iou_thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def random_boxes_scores(rng, n):
    lo = rng.uniform(0, 0.7, (n, 2))
    hi = lo + rng.uniform(0.05, 0.3, (n, 2))
    boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_suppression_mask_matches_oracle(rng):
    for trial in range(5):
        boxes, scores = random_boxes_scores(rng, 40)
        order = np.argsort(-scores, kind="stable")
        sboxes, sscores = boxes[order], scores[order]
        valid = sscores >= 0.2
        keep = np.asarray(
            greedy_suppression_mask(sboxes, valid, 0.5)
        )
        got = order[keep].tolist()
        want = nms_oracle(boxes, scores, 0.5, 0.2)
        assert sorted(got) == sorted(want)


def test_suppression_overlapping_cluster():
    # three near-identical boxes + one distant: keep best of cluster + distant
    boxes = np.array(
        [
            [0.1, 0.1, 0.4, 0.4],
            [0.11, 0.11, 0.41, 0.41],
            [0.09, 0.1, 0.39, 0.4],
            [0.7, 0.7, 0.9, 0.9],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    keep = np.asarray(greedy_suppression_mask(boxes, scores > 0, 0.5))
    np.testing.assert_array_equal(keep, [True, False, False, True])


def test_batched_nms_contract(rng):
    n, a, c = 2, 50, 3
    lo = rng.uniform(0, 0.7, (n, a, 2))
    hi = lo + rng.uniform(0.05, 0.3, (n, a, 2))
    boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, a, c)).astype(np.float32)
    cfg = NMSConfig(score_threshold=0.3, iou_threshold=0.5, max_boxes=10,
                    pre_nms_top_k=32)
    det = batched_nms(boxes, scores, cfg)
    assert det.boxes.shape == (n, 10, 4)
    assert det.scores.shape == (n, 10)
    assert det.labels.shape == (n, 10)
    assert det.num_boxes.shape == (n,)
    sc = np.asarray(det.scores)
    nb = np.asarray(det.num_boxes)
    lb = np.asarray(det.labels)
    for i in range(n):
        # scores sorted descending within valid region, zero after
        assert np.all(np.diff(sc[i, : nb[i]]) <= 1e-6)
        assert np.all(sc[i, nb[i]:] == 0.0)
        assert np.all(lb[i, nb[i]:] == -1)
        assert np.all(lb[i, : nb[i]] >= 0)
        assert np.all(sc[i, : nb[i]] >= 0.3)


def test_batched_nms_classwise_independence():
    # same box in two classes must NOT suppress each other
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (4, 1))[None]
    scores = np.zeros((1, 4, 2), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 1] = 0.8
    cfg = NMSConfig(score_threshold=0.1, iou_threshold=0.5, max_boxes=5,
                    pre_nms_top_k=4)
    det = batched_nms(boxes, scores, cfg)
    assert int(det.num_boxes[0]) == 2
    got = set(np.asarray(det.labels)[0, :2].tolist())
    assert got == {0, 1}


def test_batched_nms_vs_oracle_per_class(rng):
    n, a, c = 1, 60, 4
    lo = rng.uniform(0, 0.7, (n, a, 2))
    hi = lo + rng.uniform(0.05, 0.3, (n, a, 2))
    boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, a, c)).astype(np.float32)
    cfg = NMSConfig(score_threshold=0.25, iou_threshold=0.45, max_boxes=200,
                    pre_nms_top_k=60)
    det = batched_nms(boxes, scores, cfg)

    want = []
    for cl in range(c):
        for i in nms_oracle(boxes[0], scores[0, :, cl], 0.45, 0.25):
            want.append((cl, round(float(scores[0, i, cl]), 5)))
    nb = int(det.num_boxes[0])
    got = [
        (int(np.asarray(det.labels)[0, i]),
         round(float(np.asarray(det.scores)[0, i]), 5))
        for i in range(nb)
    ]
    assert sorted(got) == sorted(want)


def test_nms_empty_input():
    boxes = np.zeros((1, 10, 4), np.float32)
    scores = np.zeros((1, 10, 2), np.float32)
    cfg = NMSConfig(score_threshold=0.5, max_boxes=5, pre_nms_top_k=8)
    det = batched_nms(boxes, scores, cfg)
    assert int(det.num_boxes[0]) == 0
    assert np.all(np.asarray(det.scores) == 0.0)
