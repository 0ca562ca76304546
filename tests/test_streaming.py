import numpy as np

import jax

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.streaming import StreamingDetector


def test_streaming_order_and_contract():
    cfg = Config(
        num_classes=3, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
        nms=NMSConfig(max_boxes=5, num_candidates=64, pre_nms_top_k=32),
    )
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    s = StreamingDetector(cfg, variables, depth=2)
    s.warmup()

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
              for _ in range(7)]
    results = []
    for f in frames:
        results.extend(s.push(f))
    results.extend(s.flush())

    assert len(results) == 7
    for r in results:
        assert r["boxes"].shape == (5, 4)
        assert isinstance(r["num_boxes"], int)
    stats = s.stats()
    assert stats["p50_latency_s"] > 0
