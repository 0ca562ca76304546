"""Spatial (height-axis) sharding for beyond-HBM resolutions.

SURVEY.md §5 long-context row / VERDICT r2 #7: resolution is this
framework's context axis. When one chip's HBM cannot hold a resolution's
activations, the image H axis shards over the mesh's ``model`` axis and
GSPMD splits every conv spatially, inserting halo exchanges over ICI.
These tests verify on the virtual 8-device CPU mesh that spatially-sharded
inference produces the SAME detections as replicated execution.
"""

import numpy as np
import pytest

import jax

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.parallel import create_mesh
from ssd_tpu.predictor import Predictor

CFG = Config(
    num_classes=3, image_size=128,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    nms=NMSConfig(max_boxes=8, num_candidates=64, pre_nms_top_k=32),
)


def _variables():
    return Detector(CFG).init(jax.random.PRNGKey(3))


def test_spatial_sharded_predict_matches_replicated(rng):
    """(data=2, model=4) mesh: batch on data, image H split 4-ways over
    model — detections equal the plain single-device predictor."""
    variables = _variables()
    imgs = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)

    plain = Predictor(CFG, variables)
    mesh = create_mesh(model_parallelism=4)
    spatial = Predictor(CFG, variables, mesh=mesh, spatial_shard=True)

    a = plain.predict(imgs)
    b = spatial.predict(imgs)
    np.testing.assert_array_equal(a["num_boxes"], b["num_boxes"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
    np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-5)


def test_spatial_shard_requires_divisible_height():
    variables = _variables()
    import dataclasses
    bad = dataclasses.replace(CFG, image_size=126)  # 126 % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        Predictor(bad, variables, mesh=create_mesh(model_parallelism=4),
                  spatial_shard=True)
    with pytest.raises(ValueError, match="requires a mesh"):
        Predictor(CFG, variables, spatial_shard=True)


def test_streaming_spatial_shard_matches_plain(rng):
    """Full-model-axis mesh (1, 8): a streamed frame's H is split 8-ways;
    detections equal the unsharded streaming path (the 1024p streaming
    config's beyond-HBM mode, scaled down for the virtual mesh)."""
    from ssd_tpu.streaming import StreamingDetector

    variables = _variables()
    frame = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)

    plain = StreamingDetector(CFG, variables)
    mesh = create_mesh(model_parallelism=8)  # data axis 1: one stream
    sharded = StreamingDetector(CFG, variables, mesh=mesh,
                                spatial_shard=True)

    def run(s):
        list(s.push(frame))
        return list(s.flush())[0]

    a, b = run(plain), run(sharded)
    assert a["num_boxes"] == b["num_boxes"]
    np.testing.assert_array_equal(a["labels"], b["labels"])
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
    np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-5)
