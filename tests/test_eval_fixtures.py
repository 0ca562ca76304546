"""Hand-derived known-answer fixtures for the COCO evaluator.

Every claim the framework makes about mAP parity flows through
``ssd_tpu/eval/coco_map.py`` — a from-scratch reimplementation (pycocotools
is unavailable offline). These fixtures were derived BY HAND from
pycocotools' published algorithm (``cocoeval.py``), not by running this
implementation, and pin the trickiest semantic interactions:

  * crowd-ignore: non-ignored gts preferred over higher-IoU crowd regions;
    crowd regions absorb unlimited detections and are never consumed;
  * area-range re-matching: a gt outside a range becomes an ignore for
    that range, CHANGING the greedy assignment (not just filtering it);
  * score ties: stable (insertion-order) processing decides who matches;
  * maxDets: AR@k truncates to the k highest-scoring detections.

AP integration uses this evaluator's documented all-point interpolation
(PASCAL VOC-2010+) rather than pycocotools' 101-point sampling — the
derivations below integrate the same step-function PR curves by hand.

------------------------------------------------------------------------
DERIVATIONS (image 100x100; thresholds T = {0.50, 0.55, ..., 0.95};
"medium" = area in [32^2, 96^2] px, "small" = below)

Scene ``crowd_preference_and_absorption``
  gt: g0 = [.2,.2,.6,.6] (40x40 px, 1600 px^2, medium), g1 = CROWD over
  the whole image. dets: d0 (0.9) = [.2,.2,.56,.56] -> IoU(d0,g0) =
  .36^2 / .4^2 = 0.81; crowd-IoU(d0,g1) = 1.0. d1 (0.3) = g0 exactly.
  - t <= 0.80: d0 must match g0 (non-ignored PREFERRED over the
    higher-IoU crowd) -> TP, consumes g0; d1 then matches the crowd
    (absorbs a second det) -> ignored. PR: [TP] -> AP(t) = 1.
  - t >= 0.85: IoU(d0,g0)=0.81 < t, crowd-IoU 1.0 >= t -> d0 is IGNORED
    (not FP!) and g0 stays free; d1 matches g0 at IoU 1.0 -> TP.
    PR: [TP] -> AP(t) = 1.   => mAP = AP50 = AP75 = 1.0.
  - AR@1 truncates to d0 only: TP for the 7 thresholds <= 0.80, ignored
    (recall 0) for the 3 above -> AR@1 = 0.7. AR@10/@100 = 1.0.
  - Areas: g0 medium (1600), d0 1296 medium, d1 1600 medium -> the medium
    range reproduces "all"; small/large have no gt -> NaN.
  An evaluator that lets the crowd outbid g0 at low t, consumes the crowd,
  or counts d0 as FP at high t gets mAP in {0.85, 0.7, ...} != 1.0.

Scene ``area_range_rematching``
  gt: g0 = [0,0,.2,.2] (400 px^2, small), g1 = [0,0,.5,.5] (2500, medium).
  dets: d0 (0.9) = [0,0,.24,.24] (576 px^2, small): IoU(d0,g0) =
  .04/.0576 = 0.6944, IoU(d0,g1) = .0576/.25 = 0.2304; d1 (0.8) = g0
  exactly (400, small): IoU(d1,g1) = .04/.25 = 0.16; d2 (0.7) = g1 exactly
  (2500, medium).
  "all" range (num_gt = 2):
  - t in {.50,.55,.60,.65}: d0->g0 TP (0.6944 >= t); d1 FP (g0 taken,
    0.16 < t); d2->g1 TP. PR over [TP,FP,TP]: recall .5 at P=1, recall 1
    at P=2/3 -> AP = .5*1 + .5*2/3 = 5/6.
  - t in {.70..95}: d0 FP (0.6944 < t); d1->g0 TP; d2 TP.
    PR over [FP,TP,TP]: envelope P = 2/3 everywhere -> AP = 2/3.
  => mAP = (4*(5/6) + 6*(2/3))/10 = 11/15 = 0.73333; AP50 = 5/6;
     AP75 = 2/3.
  "medium" range (g0 ignored, num_gt = 1): at t <= .65 d0 matches the
  IGNORED g0 (no non-ignored candidate >= t) -> d0 ignored AND g0
  consumed; d1 unmatched, area 400 out of range -> ignored; d2 TP.
  At t >= .70 d0 unmatched -> area out of range -> ignored; d1 matches
  ignored g0 -> ignored; d2 TP. Every threshold: PR = [TP] ->
  AP_medium = 1.0. (Matching once at "all" and filtering would have made
  d0 an FP here — the re-matching is the point of the fixture.)
  "small" range (g1 ignored, num_gt = 1): t <= .65: d0->g0 TP; d1 FP
  (in-range area 400, g0 taken, ignored g1 below t); d2 matches ignored
  g1 (IoU 1.0) -> ignored. PR [TP,FP] -> AP = 1. t >= .70: d0 FP
  (unmatched, in-range area 576); d1->g0 TP; d2 ignored. PR [FP,TP]:
  envelope P = .5 -> AP = .5.  => AP_small = (4*1 + 6*.5)/10 = 0.7.
  AR ("all", num_gt 2): every t has 2 TPs among ranks 0..2 -> AR@10 =
  AR@100 = 1. AR@1 (d0 only): TP at 4 of 10 t -> 4*(1/2)/10 = 0.2.
  AR_small: 1 TP of 1 gt at every t -> 1.0; AR_medium: d2 always TP
  -> 1.0.

Scene ``score_tie_greedy_order``
  gt: g0 = [0,0,.4,.4], g1 = [.5,.5,.9,.9] (both 1600 px^2, medium).
  dets: d0 (0.9) = [.45,.45,.85,.85]: IoU(d0,g1) = .1225/.1975 = 0.6203;
  d1 (0.9, TIED, added after d0) = g1 exactly; d2 (0.5) = g0 exactly.
  Stable sort keeps d0 before d1, so d0 matches FIRST:
  - t in {.50,.55,.60}: d0 takes g1 (0.6203 >= t) -> TP; d1 FP; d2 TP.
    AP = 5/6 (same PR shape as above).
  - t in {.65..95}: d0 FP; d1->g1 TP; d2 TP. AP = 2/3.
  => mAP = (3*(5/6) + 7*(2/3))/10 = 0.71667; AP50 = 5/6; AP75 = 2/3.
  AR@1 (d0 only): TP at 3 t -> 3*(1/2)/10 = 0.15; AR@10 = AR@100 = 1.
  All boxes medium -> medium mirrors "all"; small/large NaN.

Scene ``maxdets_truncation``
  12 disjoint gts on a 4x3 grid (each 20x25 px = 500 px^2, small), 12
  exact detections with scores 0.95, 0.90, ..., 0.40, plus one 2x2 px FP
  at score 0.2. All 12 real dets are IoU-1.0 TPs at every threshold; the
  trailing FP arrives after recall 1.0, so the all-point envelope keeps
  AP = 1.0 at every threshold and range.
  AR@k counts TPs among the k highest-scoring dets: AR@1 = 1/12,
  AR@10 = 10/12, AR@100 = 12/12 = 1. All areas small -> small mirrors
  "all"; medium/large NaN.
"""

import json
import os

import numpy as np
import pytest

from ssd_tpu.eval.coco_map import DetectionEvaluator

FIXTURES = os.path.join(os.path.dirname(__file__), "goldens",
                        "coco_eval_fixtures.json")

METRICS = ("mAP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
           "AR@1", "AR@10", "AR@100", "AR_small", "AR_medium", "AR_large")


def _load():
    with open(FIXTURES) as f:
        return json.load(f)["scenes"]


def _grid_scene(spec):
    g = spec["grid"]
    boxes, scores = [], []
    s = g["scores_start"]
    for y0 in g["rows_y0"]:
        for x0 in g["cols_x0"]:
            boxes.append([y0, x0, y0 + g["height"], x0 + g["width"]])
            scores.append(round(s, 4))
            s += g["scores_step"]
    gt_boxes = np.asarray(boxes, np.float32)
    det_boxes = np.concatenate(
        [gt_boxes, np.asarray([spec["extra_fp"]["box"]], np.float32)])
    det_scores = np.asarray(scores + [spec["extra_fp"]["score"]], np.float32)
    n = len(gt_boxes)
    return (det_boxes, det_scores, np.zeros(n + 1, np.int64),
            gt_boxes, np.zeros(n, np.int64), np.zeros(n, bool))


def _run_scene(spec) -> dict:
    ev = DetectionEvaluator(spec["num_classes"])
    if "grid" in spec:
        db, ds, dl, gb, gl, gc = _grid_scene(spec)
    else:
        db = np.asarray(spec["det_boxes"], np.float32)
        ds = np.asarray(spec["det_scores"], np.float32)
        dl = np.asarray(spec["det_labels"], np.int64)
        gb = np.asarray(spec["gt_boxes"], np.float32)
        gl = np.asarray(spec["gt_labels"], np.int64)
        gc = np.asarray(spec["gt_is_crowd"], bool)
    ev.add_image(db, ds, dl, gb, gl, gt_is_crowd=gc,
                 image_hw=tuple(spec["image_hw"]))
    return ev.result()


@pytest.mark.parametrize("name", list(_load().keys()))
def test_hand_derived_fixture(name):
    spec = _load()[name]
    got = _run_scene(spec)
    for m in METRICS:
        want = spec["expected"][m]
        if isinstance(want, float) and np.isnan(want):
            assert np.isnan(got[m]), (name, m, got[m])
        else:
            np.testing.assert_allclose(got[m], want, atol=1e-9,
                                       err_msg=f"{name}:{m}")


# ---------------------------------------------------------------- properties


def _random_scene(rng, n_gt=6, n_det=10):
    lo = rng.uniform(0, 0.6, (n_gt, 2))
    hi = lo + rng.uniform(0.1, 0.35, (n_gt, 2))
    gt = np.concatenate([lo, hi], -1).astype(np.float32)
    lo = rng.uniform(0, 0.6, (n_det, 2))
    hi = lo + rng.uniform(0.1, 0.35, (n_det, 2))
    det = np.concatenate([lo, hi], -1).astype(np.float32)
    scores = rng.permutation(n_det).astype(np.float32) / n_det + 0.05
    return gt, det, scores


def _result(gt, det, scores, crowd=None, extra_det=None):
    ev = DetectionEvaluator(1)
    if extra_det is not None:
        det = np.concatenate([det, np.asarray([extra_det[0]], np.float32)])
        scores = np.concatenate(
            [scores, np.asarray([extra_det[1]], np.float32)])
    n_gt = len(gt)
    ev.add_image(det, scores, np.zeros(len(det), np.int64),
                 gt, np.zeros(n_gt, np.int64),
                 gt_is_crowd=crowd, image_hw=(100, 100))
    return ev.result()


def test_property_crowd_absorbed_det_changes_nothing(rng):
    """A detection fully inside a crowd region is ignored at every
    threshold and area range (crowd-IoU = 1.0 >= any t), so adding one —
    at ANY score — must leave every AP metric unchanged (pycocotools:
    ignored detections are neither TP nor FP).

    AR@k is deliberately excluded for HIGH added scores: pycocotools
    truncates to the k top-scoring detections BEFORE dropping ignores
    (``dtm[:, :maxDet]`` in accumulate), so an ignored high-score
    detection legitimately occupies an AR@k slot and can push a rank-k TP
    out — this implementation reproduces that. With the LOWEST score the
    extra det ranks last and AR must also be unchanged."""
    for seed in range(5):
        r = np.random.default_rng(seed)
        gt, det, scores = _random_scene(r)
        # keep real gts clear of the crowd region: a non-crowd gt
        # overlapping the added detection would (correctly) be preferred
        # over the crowd match and break the premise
        gt = np.clip(gt, 0.0, 0.65)
        crowd_region = np.asarray([[0.7, 0.7, 1.0, 1.0]], np.float32)
        gt_all = np.concatenate([gt, crowd_region])
        crowd = np.asarray([False] * len(gt) + [True])
        base = _result(gt_all, det, scores, crowd=crowd)
        inside = [0.8, 0.8, 0.9, 0.9]
        for score in (0.99, 0.5, 0.01):
            got = _result(gt_all, det, scores, crowd=crowd,
                          extra_det=(inside, score))
            ar_safe = score < float(np.min(scores))  # ranks last
            for m in METRICS:
                if m.startswith("AR") and not ar_safe:
                    continue
                a, b = base[m], got[m]
                assert (np.isnan(a) and np.isnan(b)) or a == b, (
                    seed, score, m, a, b)


def test_property_perfect_detections_score_one(rng):
    """Detections identical to the (non-crowd) gts -> every defined AP/AR
    metric is exactly 1.0."""
    for seed in range(4):
        r = np.random.default_rng(100 + seed)
        gt, _, _ = _random_scene(r, n_gt=5)
        scores = np.linspace(0.9, 0.5, len(gt)).astype(np.float32)
        res = _result(gt, gt.copy(), scores)
        for m in ("mAP", "AP50", "AP75", "AR@10", "AR@100"):
            assert res[m] == pytest.approx(1.0), (seed, m, res[m])


def test_property_raising_tp_score_never_lowers_ap(rng):
    """Moving a true positive earlier in the ranking can only improve (or
    keep) every AP metric — precision at each recall level is monotone in
    the rank of TPs."""
    for seed in range(4):
        r = np.random.default_rng(200 + seed)
        gt, det, scores = _random_scene(r)
        # make det[0] a guaranteed TP: copy gt[0]
        det = det.copy()
        det[0] = gt[0]
        base = _result(gt, det, scores)
        boosted_scores = scores.copy()
        boosted_scores[0] = 2.0  # top rank
        boosted = _result(gt, det, boosted_scores)
        for m in ("mAP", "AP50", "AP75"):
            a, b = base[m], boosted[m]
            if np.isnan(a):
                continue
            assert b >= a - 1e-12, (seed, m, a, b)
