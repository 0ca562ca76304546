import time

import numpy as np

from ssd_tpu.eval.coco_map import (COCO_IOU_THRESHOLDS, DetectionEvaluator,
                                   average_precision, match_image,
                                   match_image_multi)


def test_perfect_detections_give_map_1():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]], np.float32)
    labels = np.array([0, 2])
    ev.add_image(gt, np.array([0.9, 0.8]), labels, gt, labels)
    res = ev.result()
    assert res["mAP"] == 1.0
    assert res["AP50"] == 1.0


def test_completely_wrong_detections_give_zero():
    ev = DetectionEvaluator(num_classes=2)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    det = np.array([[0.6, 0.6, 0.9, 0.9]], np.float32)
    ev.add_image(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    res = ev.result()
    assert res["mAP"] == 0.0


def test_localization_quality_affects_map_not_ap50():
    # det with IoU ~0.6: TP at 0.5, FP at high thresholds
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0.0, 0.0, 0.5, 0.5]], np.float32)
    det = np.array([[0.0, 0.0, 0.5, 0.38]], np.float32)  # IoU = 0.76
    ev.add_image(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    res = ev.result()
    assert res["AP50"] == 1.0
    assert 0.0 < res["mAP"] < 1.0


def test_duplicate_detections_are_fps():
    ev = DetectionEvaluator(num_classes=1, iou_thresholds=[0.5])
    gt = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    det = np.tile(gt, (3, 1))
    ev.add_image(det, np.array([0.9, 0.8, 0.7]), np.zeros(3, int),
                 gt, np.array([0]))
    res = ev.result()
    # 1 TP then 2 FPs: precision drops after recall 1.0 -> AP stays 1.0
    # under all-point interpolation (first det is the TP)
    assert res["AP50"] == 1.0
    # reversed: if the TP had the LOWEST score, AP < 1
    ev2 = DetectionEvaluator(num_classes=1, iou_thresholds=[0.5])
    # shift duplicates so only the last (lowest-score) overlaps gt
    det2 = np.array([[0.6, 0.6, 0.9, 0.9], [0.6, 0.6, 0.9, 0.9],
                     [0.1, 0.1, 0.5, 0.5]], np.float32)
    ev2.add_image(det2, np.array([0.9, 0.8, 0.7]), np.zeros(3, int),
                  gt, np.array([0]))
    assert ev2.result()["AP50"] < 1.0


def test_match_image_one_gt_per_detection():
    gt = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    det = np.tile(gt, (2, 1))
    tp = match_image(det, gt, 0.5)
    assert tp.tolist() == [True, False]


def test_average_precision_known_value():
    # 2 gt; dets: TP(0.9), FP(0.8), TP(0.7)
    scores = np.array([0.9, 0.8, 0.7])
    tp = np.array([True, False, True])
    ap = average_precision(scores, tp, 2)
    # PR points: (0.5, 1.0), (0.5, 0.5), (1.0, 2/3); envelope: p=1 until
    # r=0.5, then 2/3 until r=1 -> AP = 0.5*1 + 0.5*2/3
    np.testing.assert_allclose(ap, 0.5 + 0.5 * 2 / 3, atol=1e-6)


def test_missing_class_is_nan_excluded():
    ev = DetectionEvaluator(num_classes=5)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    ev.add_image(gt, np.array([0.9]), np.array([1]), gt, np.array([1]))
    res = ev.result()
    assert res["mAP"] == 1.0  # classes with no gt excluded from the mean


def test_add_batch_with_padded_contract():
    ev = DetectionEvaluator(num_classes=2, iou_thresholds=[0.5])
    det = {
        "boxes": np.zeros((1, 10, 4), np.float32),
        "scores": np.zeros((1, 10), np.float32),
        "labels": np.full((1, 10), -1, np.int32),
        "num_boxes": np.array([1], np.int32),
    }
    det["boxes"][0, 0] = [0.1, 0.1, 0.5, 0.5]
    det["scores"][0, 0] = 0.9
    det["labels"][0, 0] = 1
    gt_boxes = np.zeros((1, 5, 4), np.float32)
    gt_boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
    gt_labels = np.zeros((1, 5), np.int32)
    gt_labels[0, 0] = 1
    ev.add_batch(det, gt_boxes, gt_labels, np.array([1]))
    assert ev.result()["AP50"] == 1.0


def _match_scalar(ious, thr):
    """Scalar greedy matcher — the loop match_image_multi vectorized away,
    kept as the behavioral oracle (incl. last-index tie-break)."""
    d, g = ious.shape
    tp = np.zeros(d, bool)
    taken = np.zeros(g, bool)
    for i in range(d):
        j = -1
        best = thr
        for k in range(g):
            if not taken[k] and ious[i, k] >= best:
                best = ious[i, k]
                j = k
        if j >= 0:
            taken[j] = True
            tp[i] = True
    return tp


def test_match_multi_equals_scalar_oracle(rng):
    for _ in range(100):
        d, g = rng.integers(0, 12, 2)
        ious = np.round(rng.random((d, g)), 1)  # coarse -> many exact ties
        got = match_image_multi(ious, COCO_IOU_THRESHOLDS)
        want = np.stack(
            [_match_scalar(ious, t) for t in COCO_IOU_THRESHOLDS], axis=1
        )
        np.testing.assert_array_equal(got, want)


def _random_image(r):
    gt = np.sort(r.random((6, 4)).astype(np.float32), axis=-1)
    gtl = r.integers(0, 7, 6)
    det = np.concatenate([gt + r.normal(0, 0.02, gt.shape).astype(np.float32),
                          np.sort(r.random((10, 4)).astype(np.float32), -1)])
    ds = r.random(len(det)).astype(np.float32)
    dl = np.concatenate([gtl, r.integers(0, 7, 10)])
    return det, ds, dl, gt, gtl


def test_merge_equals_single_stream(rng):
    """Two evaluators over disjoint shards, merged == one evaluator."""
    single = DetectionEvaluator(7)
    shards = [DetectionEvaluator(7), DetectionEvaluator(7)]
    for i in range(20):
        img = _random_image(np.random.default_rng(i))
        single.add_image(*img)
        shards[i % 2].add_image(*img)
    shards[0].merge(shards[1])
    a, b = single.result(), shards[0].result()
    assert a["mAP"] == b["mAP"] and a["AP50"] == b["AP50"]


def test_pack_load_roundtrip(rng):
    """_pack/_load_packed (the multi-host gather wire format) is lossless."""
    ev = DetectionEvaluator(7)
    for i in range(10):
        ev.add_image(*_random_image(np.random.default_rng(i)))
    ev2 = DetectionEvaluator(7)
    ev2._load_packed(ev._pack())
    a, b = ev.result(), ev2.result()
    assert a["mAP"] == b["mAP"] and a["AP50"] == b["AP50"]


def test_add_batch_valid_mask_skips_padded_rows():
    box = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    det = {
        "boxes": np.tile(box, (2, 1, 1))[:, None][:, 0][:, None, :].reshape(2, 1, 4),
        "scores": np.full((2, 1), 0.9, np.float32),
        "labels": np.zeros((2, 1), np.int32),
        "num_boxes": np.ones(2, np.int32),
    }
    # row 1 is a padded eval row: its (would-be wrong) detection must not count
    det["boxes"][1, 0] = [0.6, 0.6, 0.9, 0.9]
    gt_boxes = np.tile(box, (2, 1, 1)).reshape(2, 1, 4)
    gt_labels = np.zeros((2, 1), np.int32)
    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_batch(det, gt_boxes, gt_labels, np.ones(2, np.int32),
                 valid=np.array([True, False]))
    assert ev.result()["AP50"] == 1.0
    assert int(ev._num_gt[0, 0]) == 1  # "all"-area gt count


def test_evaluator_coco_scale_timing():
    """VERDICT r1 #2 done-criterion: 5000 images x 80 classes in < 60 s."""
    ev = DetectionEvaluator(80)
    t0 = time.time()
    for i in range(5000):
        r = np.random.default_rng(i)
        gt = np.sort(r.random((8, 4)).astype(np.float32), -1)
        gtl = r.integers(0, 80, 8)
        det = np.sort(r.random((100, 4)).astype(np.float32), -1)
        ev.add_image(det, r.random(100).astype(np.float32),
                     r.integers(0, 80, 100), gt, gtl)
    ev.result()
    elapsed = time.time() - t0
    assert elapsed < 60.0, f"COCO-scale eval took {elapsed:.1f}s"


def test_detections_to_coco_format():
    from ssd_tpu.eval.coco_map import detections_to_coco

    det = {
        "boxes": np.asarray([[[0.1, 0.2, 0.5, 0.6], [0, 0, 0, 0]],
                             [[0.0, 0.0, 1.0, 1.0], [0, 0, 0, 0]]],
                            np.float32),
        "scores": np.asarray([[0.9, 0.0], [0.7, 0.0]], np.float32),
        "labels": np.asarray([[2, 0], [0, 0]], np.int32),
        "num_boxes": np.asarray([1, 1], np.int32),
    }
    res = detections_to_coco(
        det, source_ids=np.asarray([42, 7]),
        orig_hw=np.asarray([[100, 200], [50, 50]]),
        valid=np.asarray([True, False]),       # second row padded out
        category_ids={2: 17},
    )
    assert len(res) == 1
    r = res[0]
    assert r["image_id"] == 42 and r["category_id"] == 17
    # normalized (0.1,0.2,0.5,0.6) on a 100x200 image -> xywh abs
    np.testing.assert_allclose(r["bbox"], [40.0, 10.0, 80.0, 40.0])
    assert abs(r["score"] - 0.9) < 1e-6


def test_pipeline_eval_carries_source_ids(tmp_path):
    import io

    from PIL import Image

    from ssd_tpu.config import Config, DataConfig, ModelConfig
    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.data.tfrecord import RecordWriter, encode_detection_example

    path = str(tmp_path / "v.tfrecords")
    rng = np.random.default_rng(0)
    with RecordWriter(path) as w:
        for sid, (h, ww) in zip((101, 202, 303), ((40, 60), (60, 40), (32, 32))):
            img = rng.integers(0, 255, (h, ww, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG")
            w.write(encode_detection_example(
                buf.getvalue(), np.asarray([[0.1, 0.1, 0.6, 0.6]], np.float32),
                np.asarray([0]), source_id=sid))
    cfg = Config(num_classes=2, image_size=64,
                 model=ModelConfig(width_multiplier=0.25, fpn_channels=32,
                                   head_depth=1, compute_dtype="float32"),
                 data=DataConfig(max_gt_boxes=4))
    batch = next(iter(Pipeline(path, cfg, is_training=False, batch_size=4)))
    assert list(batch["source_ids"][:3]) == [101, 202, 303]
    assert batch["orig_hw"][:3].tolist() == [[40, 60], [60, 40], [32, 32]]
    assert list(batch["valid"]) == [True, True, True, False]


# ---------------------------------------------------------------- COCO
# full-protocol tests: crowd ignore regions, area buckets, AR@k
# (pycocotools semantics reimplemented in coco_map — VERDICT r2 #6)

def test_crowd_gt_is_ignore_region():
    """A detection inside a crowd region is neither TP nor FP; the crowd
    IoU variant (intersection / det area) matches a small det fully inside
    a big region even though the standard IoU is tiny."""
    gt = np.array([[0.1, 0.1, 0.3, 0.3],    # real object
                   [0.5, 0.5, 1.0, 1.0]], np.float32)   # big crowd region
    crowd = np.array([0, 1])
    det = np.array([[0.1, 0.1, 0.3, 0.3],    # TP on the real gt
                    [0.7, 0.7, 0.75, 0.75],  # inside crowd -> ignored
                    [0.35, 0.0, 0.45, 0.1]], np.float32)  # plain FP
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.zeros(3, np.int32)

    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_image(det, scores, labels, gt, np.zeros(2, np.int32),
                 gt_is_crowd=crowd)
    r = ev.result()
    # PR list after ignore-removal: [tp(0.9), fp(0.7)], 1 gt -> AP = 1.0
    assert r["AP50"] == 1.0
    assert int(ev._num_gt[0, 0]) == 1  # crowd gt not counted

    # control: WITHOUT crowd flagging the middle detection is a plain FP
    # against 2 gts -> AP drops
    ev2 = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev2.add_image(det, scores, labels, gt, np.zeros(2, np.int32))
    assert ev2.result()["AP50"] < 1.0


def test_area_buckets_ap_small_medium_large():
    """Per-area AP re-matches with out-of-range gts ignored; matched
    detections of other sizes never contaminate a bucket."""
    hw = (640, 640)
    # 20x20 px gt (area 400 -> small), 200x200 px gt (40000 -> large)
    gt = np.array([[0.0, 0.0, 20 / 640, 20 / 640],
                   [0.5, 0.5, 0.5 + 200 / 640, 0.5 + 200 / 640]], np.float32)
    det = gt.copy()  # perfect detections
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.zeros(2, np.int32)

    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_image(det, scores, labels, gt, np.zeros(2, np.int32),
                 image_hw=hw)
    r = ev.result()
    assert r["mAP"] == 1.0
    assert r["AP_small"] == 1.0
    assert r["AP_large"] == 1.0
    assert np.isnan(r["AP_medium"])  # no medium gt anywhere
    assert r["AR_small"] == 1.0 and r["AR_large"] == 1.0


def test_unmatched_out_of_area_detection_not_fp():
    """In the small bucket, an unmatched LARGE detection is dropped from
    scoring (not an FP) — while in the all bucket it is a real FP."""
    hw = (640, 640)
    gt = np.array([[0.0, 0.0, 20 / 640, 20 / 640]], np.float32)  # small gt
    det = np.array([[0.4, 0.4, 0.9, 0.9],          # large, unmatched
                    [0.0, 0.0, 20 / 640, 20 / 640]], np.float32)  # TP
    scores = np.array([0.95, 0.9], np.float32)  # FP ranks first
    labels = np.zeros(2, np.int32)

    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_image(det, scores, labels, gt, np.zeros(1, np.int32),
                 image_hw=hw)
    r = ev.result()
    assert r["AP_small"] == 1.0          # large det ignored in this bucket
    assert abs(r["mAP"] - 0.5) < 1e-9    # [fp, tp] -> precision 1/2 at R=1


def test_ar_at_maxdets():
    """AR@k slices the greedy matching at detection rank k exactly."""
    # 3 gts; matching dets at ranks 0, 2, 11; everything else FP
    gts = np.array([[0.0, 0.0, 0.1, 0.1],
                    [0.2, 0.2, 0.3, 0.3],
                    [0.4, 0.4, 0.5, 0.5]], np.float32)
    dets = [gts[0]]
    dets += [[0.6, 0.6, 0.62, 0.62]]       # rank 1 FP
    dets += [gts[1]]
    dets += [[0.7, 0.0, 0.72, 0.02 + 0.01 * i] for i in range(8)]  # FPs 3-10
    dets += [gts[2]]                        # rank 11
    dets = np.asarray(dets, np.float32)
    scores = np.linspace(0.99, 0.5, len(dets)).astype(np.float32)
    labels = np.zeros(len(dets), np.int32)

    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_image(dets, scores, labels, gts, np.zeros(3, np.int32))
    r = ev.result()
    assert abs(r["AR@1"] - 1 / 3) < 1e-9
    assert abs(r["AR@10"] - 2 / 3) < 1e-9
    assert abs(r["AR@100"] - 1.0) < 1e-9


def test_ap75_stricter_than_ap50():
    """An off-by-a-bit detection passes at 0.5 IoU but fails at 0.75."""
    gt = np.array([[0.0, 0.0, 0.4, 0.4]], np.float32)
    det = np.array([[0.0, 0.0, 0.32, 0.4]], np.float32)  # IoU = 0.8*1 = 0.8?
    # IoU = (0.32*0.4) / (0.4*0.4) = 0.8 -> passes 0.75; shrink more:
    det2 = np.array([[0.0, 0.0, 0.26, 0.4]], np.float32)  # IoU = 0.65
    ev = DetectionEvaluator(1)
    ev.add_image(det2, np.array([0.9], np.float32), np.zeros(1, np.int32),
                 gt, np.zeros(1, np.int32))
    r = ev.result()
    assert r["AP50"] == 1.0
    assert r["AP75"] == 0.0


def test_crowd_region_absorbs_multiple_detections():
    """Crowd gts stay available: many detections can match one region and
    all are ignored."""
    gt = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    crowd = np.array([1])
    det = np.array([[0.1, 0.1, 0.2, 0.2],
                    [0.3, 0.3, 0.4, 0.4],
                    [0.5, 0.5, 0.6, 0.6]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    ev = DetectionEvaluator(1, iou_thresholds=[0.5])
    ev.add_image(det, scores, np.zeros(3, np.int32), gt,
                 np.zeros(1, np.int32), gt_is_crowd=crowd)
    r = ev.result()
    # zero non-ignored gt anywhere -> class contributes nan, not FPs
    assert np.isnan(r["AP50"])
    assert int(ev._num_gt[0, 0]) == 0
