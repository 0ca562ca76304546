"""Pallas NMS kernel vs the numpy oracle, in interpret mode on CPU
(SURVEY.md §4 "Kernel tests"). Real-TPU execution is covered by bench.py and
the tpu-marked test below."""

import jax
import numpy as np
import pytest

from ssd_tpu.config import NMSConfig
from ssd_tpu.ops.nms_pallas import batched_nms_pallas
from tests.test_nms import nms_oracle


def _random_instance(rng, n, a, c):
    lo = rng.uniform(0, 0.7, (n, a, 2))
    hi = lo + rng.uniform(0.05, 0.3, (n, a, 2))
    boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    # tie-free scores so kernel/oracle order agree exactly
    base = rng.permutation(n * a * c).astype(np.float32) / (n * a * c)
    scores = base.reshape(n, a, c)
    return boxes, scores


@pytest.mark.parametrize("n,a,c", [(1, 60, 4), (2, 200, 3)])
def test_pallas_nms_matches_oracle(rng, n, a, c):
    boxes, scores = _random_instance(rng, n, a, c)
    cfg = NMSConfig(score_threshold=0.2, iou_threshold=0.5, max_boxes=400,
                    pre_nms_top_k=a)
    det = batched_nms_pallas(boxes, scores, cfg, interpret=True)

    for i in range(n):
        want = []
        for cl in range(c):
            for j in nms_oracle(boxes[i], scores[i, :, cl], 0.5, 0.2):
                want.append((cl, round(float(scores[i, j, cl]), 6)))
        nb = int(det.num_boxes[i])
        got = [
            (int(np.asarray(det.labels)[i, q]),
             round(float(np.asarray(det.scores)[i, q]), 6))
            for q in range(nb)
        ]
        assert sorted(got) == sorted(want)


def test_pallas_matches_jnp_reference(rng):
    from ssd_tpu.ops.nms import batched_nms
    boxes, scores = _random_instance(rng, 2, 150, 5)
    cfg = NMSConfig(score_threshold=0.3, iou_threshold=0.45, max_boxes=50,
                    pre_nms_top_k=128)
    a = batched_nms(boxes, scores, cfg)
    b = batched_nms_pallas(boxes, scores, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.num_boxes), np.asarray(b.num_boxes))
    nb = int(a.num_boxes[0])
    np.testing.assert_allclose(
        np.asarray(a.scores)[:, :nb], np.asarray(b.scores)[:, :nb], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.labels)[:, :nb], np.asarray(b.labels)[:, :nb]
    )


def test_pallas_nms_adversarial_overlaps(rng):
    # chains of boxes where each overlaps the next but not the one after
    boxes = np.zeros((1, 8, 4), np.float32)
    for i in range(8):
        boxes[0, i] = [0.0, 0.06 * i, 0.2, 0.06 * i + 0.1]
    scores = np.linspace(0.9, 0.5, 8, dtype=np.float32).reshape(1, 8, 1)
    cfg = NMSConfig(score_threshold=0.1, iou_threshold=0.3, max_boxes=8,
                    pre_nms_top_k=8)
    det = batched_nms_pallas(boxes, scores, cfg, interpret=True)
    want = nms_oracle(boxes[0], scores[0, :, 0], 0.3, 0.1)
    assert int(det.num_boxes[0]) == len(want)


def test_pallas_nms_empty():
    boxes = np.zeros((1, 16, 4), np.float32)
    scores = np.zeros((1, 16, 2), np.float32)
    cfg = NMSConfig(score_threshold=0.5, max_boxes=5, pre_nms_top_k=16)
    det = batched_nms_pallas(boxes, scores, cfg, interpret=True)
    assert int(det.num_boxes[0]) == 0


def test_choose_block_mosaic_aligned():
    """Blocks must be 8-aligned sublanes (the K=512/block=4 Mosaic reject
    of the round-3 crowded sweep) and fit ~3x(B,K,K) f32 in VMEM (the
    K=512/block=8 24MB scoped-vmem OOM); 0 = exact jnp fallback."""
    from ssd_tpu.ops.nms_pallas import _choose_block

    assert _choose_block(128) == 32  # the measured-fastest headline point
    for k in (128, 256):
        b = _choose_block(k)
        assert b > 0 and b % 8 == 0, (k, b)
        assert 3 * b * k * k * 4 <= 12 * 1024 * 1024
    for k in (384, 512, 1024):  # would OOM the 16MB VMEM even at block 8
        assert _choose_block(k) == 0, k


def test_large_k_falls_back_to_jnp(rng):
    """K past the VMEM budget still produces oracle-exact detections."""
    boxes, scores = _random_instance(rng, 1, 600, 2)
    cfg = NMSConfig(score_threshold=0.2, iou_threshold=0.5, max_boxes=50,
                    pre_nms_top_k=400)  # k rounds to 512 -> block 0
    det = batched_nms_pallas(boxes, scores, cfg, interpret=True)
    from ssd_tpu.ops.nms import batched_nms
    want = batched_nms(boxes, scores, cfg)
    np.testing.assert_array_equal(np.asarray(det.num_boxes),
                                  np.asarray(want.num_boxes))


@pytest.mark.tpu
def test_pallas_nms_on_tpu(rng):
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU")
    boxes, scores = _random_instance(rng, 2, 300, 4)
    cfg = NMSConfig(score_threshold=0.2, iou_threshold=0.5, max_boxes=100,
                    pre_nms_top_k=256)
    det = batched_nms_pallas(boxes, scores, cfg, interpret=False)
    assert np.all(np.isfinite(np.asarray(det.scores)))


@pytest.mark.tpu
def test_pallas_nms_on_tpu_shrunk_block(rng):
    """K=256 forces block=8 — the shrunk-block path Mosaic rejected
    (non-8-aligned sublanes), then VMEM-OOMed, before _choose_block."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU")
    boxes, scores = _random_instance(rng, 2, 600, 4)
    # exact per-class top-k: on TPU the approx path picks a slightly
    # different candidate tail than the jnp reference (recall 0.95 by
    # design), which is measured separately — this test isolates the
    # shrunk-BLOCK suppression kernel.
    cfg = NMSConfig(score_threshold=0.2, iou_threshold=0.5, max_boxes=100,
                    pre_nms_top_k=200, approx_class_topk=False)
    det = batched_nms_pallas(boxes, scores, cfg, interpret=False)
    from ssd_tpu.ops.nms import batched_nms
    want = batched_nms(boxes, scores, cfg)
    np.testing.assert_array_equal(np.asarray(det.num_boxes),
                                  np.asarray(want.num_boxes))
    nb = int(want.num_boxes[0])
    np.testing.assert_allclose(np.asarray(det.scores)[:, :nb],
                               np.asarray(want.scores)[:, :nb], atol=1e-6)


def test_sharded_nms_matches_unsharded(rng):
    """shard_map-wrapped kernel over the 8-device data axis (interpret mode)
    == the plain kernel: the multi-device DP serving path
    (NMSConfig.use_pallas "auto" + Detector.predict(mesh=...)) is exact."""
    from ssd_tpu.ops.nms_pallas import batched_nms_pallas_sharded
    from ssd_tpu.parallel import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices, (data, model) = (8, 1)
    n = mesh.shape["data"]  # one image per shard keeps interpret mode fast
    boxes, scores = _random_instance(rng, n, 64, 3)
    cfg = NMSConfig(score_threshold=0.25, iou_threshold=0.5, max_boxes=24,
                    pre_nms_top_k=48)
    want = batched_nms_pallas(boxes, scores, cfg, interpret=True)
    got = batched_nms_pallas_sharded(boxes, scores, cfg, mesh,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(want.num_boxes),
                                  np.asarray(got.num_boxes))
    np.testing.assert_allclose(np.asarray(want.scores),
                               np.asarray(got.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(want.labels),
                                  np.asarray(got.labels))
    np.testing.assert_allclose(np.asarray(want.boxes),
                               np.asarray(got.boxes), atol=1e-6)


def test_nms_use_pallas_gate(monkeypatch):
    """NMSConfig.use_pallas "auto" semantics mirror the matcher's gate."""
    from ssd_tpu.models import detector as det_mod

    cfg_auto = NMSConfig()
    assert cfg_auto.use_pallas == "auto"
    # off-TPU: never the kernel
    assert det_mod.nms_use_pallas(cfg_auto) is False
    assert det_mod.nms_use_pallas(NMSConfig(use_pallas=True)) is False
    # pretend-TPU: auto requires one device or a mesh
    monkeypatch.setattr(det_mod, "_on_tpu", lambda: True)
    multi = jax.device_count() > 1
    assert det_mod.nms_use_pallas(cfg_auto) is (not multi)
    assert det_mod.nms_use_pallas(cfg_auto, mesh=object()) is True
    assert det_mod.nms_use_pallas(NMSConfig(use_pallas=True)) is True
    assert det_mod.nms_use_pallas(NMSConfig(use_pallas=False)) is False
