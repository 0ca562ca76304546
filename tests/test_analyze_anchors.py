"""Anchor-coverage tool: report structure and sanity on synthetic data."""

import dataclasses

import numpy as np

from test_e2e import make_cfg, write_synth_dataset

from ssd_tpu.tools.analyze_anchors import analyze


def _dataset_cfg(tmp_path, n=24):
    write_synth_dataset(tmp_path / "train.tfrecords", n, seed=0)
    write_synth_dataset(tmp_path / "val.tfrecords", n, seed=1)
    return make_cfg(tmp_path)


def test_report_shape_and_invariants(tmp_path):
    cfg = _dataset_cfg(tmp_path)
    r = analyze(cfg, split="val", batch_size=8)
    assert r["images"] == 24
    assert r["gts"] > 0
    assert 0.0 <= r["matched_recall"] <= 1.0
    assert 0.0 <= r["forced_only_frac"] <= 1.0
    # every gt is either threshold-matched or (at most) forced
    assert r["matched_recall"] + r["forced_only_frac"] <= 1.0 + 1e-9
    assert 0.0 <= r["best_iou_mean"] <= 1.0
    n_levels = cfg.anchors.max_level - cfg.anchors.min_level + 1
    assert len(r["level_positive_share"]) == n_levels
    assert abs(sum(r["level_positive_share"]) - 1.0) < 0.01
    # bucket gts partition all gts
    assert sum(r["bucket_gts"].values()) == r["gts"]


def test_limit_truncates(tmp_path):
    cfg = _dataset_cfg(tmp_path)
    r = analyze(cfg, split="val", limit=5, batch_size=8)
    assert r["images"] == 5


def test_matched_anchor_spec_scores_high(tmp_path):
    """Anchors whose scale matches the boxes -> near-total recall."""
    cfg = _dataset_cfg(tmp_path)
    # synth boxes are 14-30 px on a 64-px input; the default toy anchor
    # spec under-covers them (seen live). Shrink the anchor scale to the
    # box range and recall must become (near-)perfect.
    cfg = dataclasses.replace(
        cfg, anchors=dataclasses.replace(
            cfg.anchors, anchor_scale=2.5))
    r = analyze(cfg, split="val", batch_size=8)
    assert r["matched_recall"] > 0.9, r
    assert r["forced_only_frac"] < 0.1, r


def test_zero_gt_images_are_counted(tmp_path):
    """Images with no boxes flow through without skewing gt stats."""
    from ssd_tpu.data.tfrecord import (RecordWriter,
                                       encode_detection_example)

    cfg = _dataset_cfg(tmp_path)
    p = tmp_path / "val.tfrecords"
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "JPEG")
    with RecordWriter(str(p)) as w:
        for _ in range(4):
            w.write(encode_detection_example(
                buf.getvalue(), np.zeros((0, 4), np.float32),
                np.zeros(0, np.int64)))
    r = analyze(cfg, split="val", batch_size=2)
    assert r["images"] == 4
    assert r["gts"] == 0
    assert r["matched_recall"] == 0.0
