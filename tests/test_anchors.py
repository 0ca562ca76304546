import numpy as np

from ssd_tpu.config import AnchorConfig, Config
from ssd_tpu.ops.anchors import anchor_counts_per_level, generate_anchors


def test_anchor_count_matches_config():
    cfg = Config(image_size=640)
    anchors = generate_anchors(cfg.image_size, cfg.anchors)
    assert anchors.shape == (cfg.num_anchors(), 4)
    # P3..P7 at 640: 80^2 + 40^2 + 20^2 + 10^2 + 5^2 cells, 9 anchors each
    expected = (80**2 + 40**2 + 20**2 + 10**2 + 5**2) * 9
    assert anchors.shape[0] == expected


def test_counts_per_level_sum():
    cfg = Config(image_size=512)
    counts = anchor_counts_per_level(cfg.image_size, cfg.anchors)
    assert sum(counts) == cfg.num_anchors()
    assert len(counts) == 5


def test_anchor_centers_and_sizes():
    acfg = AnchorConfig(min_level=3, max_level=3, anchor_scale=4.0,
                        scales_per_octave=1, aspect_ratios=(1.0,))
    anchors = generate_anchors(64, acfg)  # one level, stride 8 -> 8x8 cells
    assert anchors.shape == (64, 4)
    # first anchor: center at (4, 4) px, size 32 px, normalized by 64
    first = anchors[0] * 64
    np.testing.assert_allclose(first, [4 - 16, 4 - 16, 4 + 16, 4 + 16], atol=1e-4)


def test_aspect_ratios_preserve_area():
    acfg = AnchorConfig(min_level=3, max_level=3, scales_per_octave=1,
                        aspect_ratios=(1.0, 2.0, 0.5))
    anchors = generate_anchors(64, acfg)
    a = anchors.reshape(8, 8, 3, 4)[0, 0]  # 3 anchors of one cell
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(areas, areas[0], rtol=1e-5)
    # ar=2 -> wider than tall
    h = a[1, 2] - a[1, 0]
    w = a[1, 3] - a[1, 1]
    np.testing.assert_allclose(w / h, 2.0, rtol=1e-4)


def test_octave_scales():
    acfg = AnchorConfig(min_level=3, max_level=3, scales_per_octave=3,
                        aspect_ratios=(1.0,))
    anchors = generate_anchors(64, acfg).reshape(8, 8, 3, 4)[0, 0]
    sizes = anchors[:, 2] - anchors[:, 0]
    np.testing.assert_allclose(sizes[1] / sizes[0], 2 ** (1 / 3), rtol=1e-5)
    np.testing.assert_allclose(sizes[2] / sizes[0], 2 ** (2 / 3), rtol=1e-5)


def test_anchors_are_deterministic():
    cfg = Config(image_size=640)
    a1 = generate_anchors(cfg.image_size, cfg.anchors)
    a2 = generate_anchors(cfg.image_size, cfg.anchors)
    np.testing.assert_array_equal(a1, a2)
