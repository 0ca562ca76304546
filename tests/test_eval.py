import numpy as np

from ssd_tpu.eval.coco_map import (DetectionEvaluator, average_precision,
                                   match_image)


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
