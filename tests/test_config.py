import dataclasses
import json

import pytest

from ssd_tpu.config import Config, ModelConfig


def test_json_roundtrip(tmp_path):
    cfg = Config(num_classes=13, image_size=512,
                 model=ModelConfig(backbone="shufflenet"))
    p = str(tmp_path / "c.json")
    cfg.save(p)
    back = Config.load(p)
    assert back == cfg


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config.from_dict({"num_classes": 3, "bogus_key": 1})


def test_shapes_are_pure_functions_of_config():
    cfg = Config(image_size=640)
    assert cfg.feature_map_sizes() == ((80, 80), (40, 40), (20, 20),
                                       (10, 10), (5, 5))
    assert cfg.num_anchors() == (80**2 + 40**2 + 20**2 + 10**2 + 5**2) * 9
    cfg2 = Config(image_size=512)
    assert cfg2.num_anchors() == (64**2 + 32**2 + 16**2 + 8**2 + 4**2) * 9


def test_shipped_configs_load():
    """Every shipped config loads and instantiates a coherent Detector.

    Globbed (not hardcoded) so a new config — or a stray key edit in an
    existing one — can't ship unvalidated; Detector(cfg) builds the anchor
    grid, so this also checks feature-map/anchor shape coherence.
    """
    import glob
    import os

    from ssd_tpu.models.detector import Detector

    paths = sorted(glob.glob("configs/*.json"))
    assert len(paths) >= 8, paths
    for p in paths:
        cfg = Config.load(p)
        assert cfg.num_classes == 80, p
        det = Detector(cfg)
        expected = cfg.num_anchors()
        assert det.anchors.shape == (expected, 4), (p, det.anchors.shape)
        fms = cfg.feature_map_sizes()
        assert expected == sum(h * w for h, w in fms) * (
            len(cfg.anchors.aspect_ratios) * cfg.anchors.scales_per_octave
        ), p
        # the flagship recipe must keep the measured-winning knobs on
        if os.path.basename(p) == "coco_mobilenet_640_flagship.json":
            assert cfg.model.stem_schedule == "dense4", p
            assert cfg.losses.box_loss == "giou", p


def test_lists_become_tuples():
    cfg = Config.from_dict(json.loads(Config().to_json()))
    assert isinstance(cfg.anchors.aspect_ratios, tuple)
    assert isinstance(cfg.train.lr_boundaries, tuple)


def test_replace_composes():
    cfg = Config()
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8)
    )
    assert cfg2.train.batch_size == 8 and cfg.train.batch_size == 64


def test_lenient_load_ignores_unknown_keys():
    import warnings
    d = json.loads(Config().to_json())
    d["data"]["legacy_field"] = 42
    with pytest.raises(KeyError):
        Config.from_dict(d)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = Config.from_dict(d, strict=False)
    assert cfg.num_classes == 80
    assert any("legacy_field" in str(x.message) for x in w)
