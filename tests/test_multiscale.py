"""Multi-scale training: schedule determinism, shared params, e2e step.

``train.multiscale`` cycles the TRAIN resolution through a size list; each
size is one compiled step program over the SAME TrainState (SURVEY.md §5
resolution-scaling row — this extends the per-resolution compile cache
from serving into training).
"""

import dataclasses

import numpy as np
import pytest

import jax

from ssd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from ssd_tpu.data.pipeline import Pipeline


def _cfg(tmp_path, **train_kw):
    train_kw.setdefault("batch_size", 4)
    return Config(
        num_classes=2, image_size=64,
        model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                          fpn_channels=32, head_depth=1,
                          compute_dtype="float32"),
        train=TrainConfig(seed=3, **train_kw),
        data=DataConfig(
            train_file_pattern=str(tmp_path / "t.tfrecords"),
            max_gt_boxes=8, crop_probability=0.0,
            color_jitter_probability=0.0),
    )


def _write(tmp_path, rng, n=16):
    import sys
    sys.path.insert(0, "tests")
    from test_data import write_dataset
    return write_dataset(str(tmp_path / "t.tfrecords"), rng, n)


def test_pipeline_cycles_scales_deterministically(tmp_path):
    rng = np.random.default_rng(0)
    _write(tmp_path, rng)
    cfg = _cfg(tmp_path, multiscale=(48, 64, 80), multiscale_every=2)

    def shapes(pipe, n):
        it = iter(pipe)
        return [next(it)["images"].shape[1] for _ in range(n)]

    s1 = shapes(Pipeline(cfg.data.train_file_pattern, cfg, is_training=True,
                         batch_size=4, seed=3), 8)
    # every=2: two batches per size, cycling
    assert s1 == [48, 48, 64, 64, 80, 80, 48, 48]
    s2 = shapes(Pipeline(cfg.data.train_file_pattern, cfg, is_training=True,
                         batch_size=4, seed=3), 8)
    assert s1 == s2

    # resume mid-cycle: scales continue from the consumed position
    pipe = Pipeline(cfg.data.train_file_pattern, cfg, is_training=True,
                    batch_size=4, seed=3)
    it = iter(pipe)
    for _ in range(3):
        next(it)
    state = pipe.state()
    pipe2 = Pipeline(cfg.data.train_file_pattern, cfg, is_training=True,
                     batch_size=4, seed=3)
    pipe2.restore(state)
    assert shapes(pipe2, 5) == s1[3:]


def test_eval_pipeline_ignores_multiscale(tmp_path):
    rng = np.random.default_rng(0)
    _write(tmp_path, rng)
    cfg = _cfg(tmp_path, multiscale=(48, 80), multiscale_every=1)
    pipe = Pipeline(cfg.data.train_file_pattern, cfg, is_training=False,
                    batch_size=4)
    assert next(iter(pipe))["images"].shape[1:3] == (64, 64)


def test_param_tree_is_resolution_invariant():
    """The same variables must be valid at every scale (the shared-state
    premise of multi-scale training)."""
    from ssd_tpu.models.detector import Detector

    base = _cfg.__wrapped__ if hasattr(_cfg, "__wrapped__") else None
    cfg64 = Config(num_classes=2, image_size=64,
                   model=ModelConfig(backbone="mobilenet",
                                     width_multiplier=0.25, fpn_channels=32,
                                     head_depth=1, compute_dtype="float32"))
    cfg96 = dataclasses.replace(cfg64, image_size=96)
    v64 = Detector(cfg64).init(jax.random.PRNGKey(0))
    v96 = Detector(cfg96).init(jax.random.PRNGKey(0))
    shapes64 = jax.tree_util.tree_map(lambda a: a.shape, v64)
    shapes96 = jax.tree_util.tree_map(lambda a: a.shape, v96)
    assert shapes64 == shapes96


@pytest.mark.slow
def test_multiscale_train_runs_and_learns(tmp_path):
    """End-to-end: a short multi-scale run updates one shared state across
    three compiled resolutions and the loss decreases."""
    from ssd_tpu.train import train

    rng = np.random.default_rng(1)
    _write(tmp_path, rng, n=32)
    cfg = _cfg(tmp_path, multiscale=(48, 64, 80), multiscale_every=3,
               num_steps=30, optimizer="adam", learning_rate=2e-3,
               warmup_steps=0, log_every=10, eval_every=0,
               checkpoint_every=30, batch_size=8)
    metrics = train(cfg, str(tmp_path / "run"), max_steps=30)
    assert np.isfinite(metrics["loss"])
