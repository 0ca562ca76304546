"""Fused early-block kernel (ops/fused_early.py) vs the flax reference.

Runs the Pallas kernel in interpret mode on CPU and checks it against the
exact ds1+ds2 module stack with folded inference-mode BatchNorm, including
the SAME-padding borders (top/bottom halo rows and the stride-2 right/
bottom edge), which are the easy things to get wrong in a halo'd kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.constants import BATCH_NORM_EPSILON
from ssd_tpu.models.layers import DepthwiseSeparable
from ssd_tpu.models.mobilenet import MobileNetV1
from ssd_tpu.ops import fused_early


def _randomized_backbone_vars(rng, image=64, width=1.0):
    m = MobileNetV1(width, "float32")
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, image, image, 3)), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    # randomize BN stats/affine so folding is actually exercised
    def randomize(tree):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(rng.normal(0.1, 0.5, x.shape), np.float32)
            if x.ndim == 1 else x, tree)

    for ds in ("ds1", "ds2"):
        for part in ("depthwise", "pointwise"):
            params[ds][part]["bn"]["scale"] = np.asarray(
                rng.uniform(0.5, 1.5, params[ds][part]["bn"]["scale"].shape),
                np.float32)
            params[ds][part]["bn"]["bias"] = np.asarray(
                rng.normal(0, 0.3, params[ds][part]["bn"]["bias"].shape),
                np.float32)
            stats[ds][part]["bn"]["mean"] = np.asarray(
                rng.normal(0, 0.3, stats[ds][part]["bn"]["mean"].shape),
                np.float32)
            stats[ds][part]["bn"]["var"] = np.asarray(
                rng.uniform(0.5, 2.0, stats[ds][part]["bn"]["var"].shape),
                np.float32)
    return params, stats


def _reference_ds1_ds2(params, stats, x, width=1.0):
    c2 = max(8, int(64 * width + 0.5) // 8 * 8)
    c3 = max(8, int(128 * width + 0.5) // 8 * 8)
    y = DepthwiseSeparable(c2, compute_dtype="float32").apply(
        {"params": params["ds1"], "batch_stats": stats["ds1"]}, x, False)
    return DepthwiseSeparable(c3, strides=2, compute_dtype="float32").apply(
        {"params": params["ds2"], "batch_stats": stats["ds2"]}, y, False)


@pytest.mark.parametrize("width", [1.0, 0.5])
def test_fused_early_matches_flax(width):
    rng = np.random.default_rng(0)
    params, stats = _randomized_backbone_vars(rng, width=width)
    c1 = max(8, int(32 * width + 0.5) // 8 * 8)

    h = w = 32  # two row blocks; exercises block boundaries + image edges
    x = np.asarray(rng.normal(0, 1.5, (2, h, w, c1)), np.float32)
    x_bf = jnp.asarray(x, jnp.bfloat16)

    want = np.asarray(_reference_ds1_ds2(
        params, stats, x_bf.astype(jnp.float32), width))

    folded = fused_early.fold_early_params(
        {"params": {"backbone": params}, "batch_stats": {"backbone": stats}},
        BATCH_NORM_EPSILON, w_img=w)
    got = np.asarray(fused_ds1_ds2_f32(x_bf, folded)).astype(np.float32)

    assert got.shape == want.shape == (2, h // 2, w // 2,
                                       max(8, int(128 * width + 0.5) // 8 * 8))
    # bf16 inputs + bf16 output storage: tolerance at bf16 resolution
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)
    # borders specifically (halo / SAME-pad rows)
    np.testing.assert_allclose(got[:, 0], want[:, 0], atol=0.08, rtol=0.05)
    np.testing.assert_allclose(got[:, -1], want[:, -1], atol=0.08, rtol=0.05)


def fused_ds1_ds2_f32(x_bf, folded):
    return fused_early.fused_ds1_ds2(x_bf, folded, interpret=True)
