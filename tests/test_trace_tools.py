"""Trace capture (--profile seam) + xplane parsing round trip on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_trace_capture_and_parse(tmp_path):
    pytest.importorskip("tensorflow")
    from ssd_tpu.utils import profiling
    from ssd_tpu.utils.trace_tools import find_xplane, load_device_ops

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.asarray(np.ones((64, 64), np.float32))
    jax.block_until_ready(f(x))
    with profiling.trace(str(tmp_path)):
        jax.block_until_ready(f(x))

    pb = find_xplane(str(tmp_path))
    # CPU backend emits no XLA device plane: the TPU lookup must fail
    # loudly (listing the available planes), not return an empty table.
    with pytest.raises(ValueError, match="planes"):
        load_device_ops(pb, device_substr="TPU")
    # the host plane parses and carries events
    ops = load_device_ops(pb, device_substr="CPU")
    assert ops and all(len(t) == 3 for t in ops)


def test_find_xplane_missing(tmp_path):
    from ssd_tpu.utils.trace_tools import find_xplane
    with pytest.raises(FileNotFoundError):
        find_xplane(str(tmp_path))
