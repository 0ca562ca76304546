"""Cost-summary tool: structure and basic physics of the report."""

from test_e2e import make_cfg, write_synth_dataset

from ssd_tpu.tools.summarize import summarize


def _cfg(tmp_path):
    write_synth_dataset(tmp_path / "train.tfrecords", 4, seed=0)
    write_synth_dataset(tmp_path / "val.tfrecords", 4, seed=1)
    return make_cfg(tmp_path)


def test_report_physics(tmp_path):
    cfg = _cfg(tmp_path)
    r = summarize(cfg, batch=4, train=True)
    p = r["params"]
    assert p["total"] > 0
    assert set(p["by_module"]) == {"backbone", "fpn", "head"}
    assert sum(v["params"] for v in p["by_module"].values()) == p["total"]
    assert r["serve"]["flops"] > 0
    # backward + optimizer must cost more than inference
    assert r["train"]["flops"] > 1.5 * r["serve"]["flops"]
    for s in (r["serve"], r["train"]):
        assert s["bound"] in ("compute", "bandwidth")
        assert s["roofline_ms"] > 0


def test_flops_scale_with_batch(tmp_path):
    cfg = _cfg(tmp_path)
    r2 = summarize(cfg, batch=2)
    r4 = summarize(cfg, batch=4)
    ratio = r4["serve"]["flops"] / r2["serve"]["flops"]
    assert 1.7 < ratio < 2.3, ratio
