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
    for name in ["coco_mobilenet_640", "coco_shufflenet_512",
                 "coco_retinanet_resnet50_640", "streaming_1024"]:
        cfg = Config.load(f"configs/{name}.json")
        assert cfg.num_classes == 80


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
