import dataclasses

import numpy as np

from ssd_tpu.config import Config, TrainConfig
from ssd_tpu.parallel import make_lr_schedule, make_optimizer


def _cfg(**kw):
    return Config(train=TrainConfig(**kw))


def test_warmup_then_cosine():
    cfg = _cfg(learning_rate=0.1, warmup_steps=100, num_steps=1000,
               lr_schedule="cosine")
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 0.1, rtol=1e-5)
    # cosine decays to ~0 at the end
    assert float(sched(999)) < 0.001
    # monotone decreasing after warmup
    vals = [float(sched(s)) for s in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_piecewise_schedule():
    cfg = _cfg(learning_rate=0.08, warmup_steps=0, num_steps=90_000,
               lr_schedule="piecewise", lr_boundaries=(60_000, 80_000),
               lr_rates=(1.0, 0.1, 0.01))
    sched = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(1000)), 0.08, rtol=1e-5)
    np.testing.assert_allclose(float(sched(61_000)), 0.008, rtol=1e-4)
    np.testing.assert_allclose(float(sched(81_000)), 0.0008, rtol=1e-4)


def test_unknown_schedule_raises():
    import pytest
    cfg = _cfg(lr_schedule="nope")
    with pytest.raises(ValueError):
        make_lr_schedule(cfg)


def test_optimizer_variants_build():
    for opt in ("momentum", "adam"):
        tx = make_optimizer(_cfg(optimizer=opt))
        assert tx is not None
