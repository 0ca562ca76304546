"""Shared flax building blocks: conv + norm + activation, TPU-friendly.

Design notes (TPU-first, not a TF translation):
  * NHWC layout — XLA's native conv layout on TPU.
  * Params live in float32; conv compute runs in ``compute_dtype``
    (bfloat16 by default) so the MXU runs at full rate.
  * BatchNorm uses flax's ``use_running_average`` toggle; stats are fp32.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from ssd_tpu.constants import BATCH_NORM_EPSILON, BATCH_NORM_MOMENTUM


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _num_groups(channels: int, target: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= target (GroupNorm)."""
    g = min(target, channels)
    while channels % g:
        g -= 1
    return g


class ConvBN(nn.Module):
    """3x3/1x1 conv + batch-norm + optional activation."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    use_norm: bool = True
    act: Callable | None = nn.relu6
    compute_dtype: str = "bfloat16"
    bn_momentum: float = BATCH_NORM_MOMENTUM
    norm: str = "batch"  # batch | group (group: batch-size independent,
    #                      no running stats — useful for tiny-batch training)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=not self.use_norm,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_norm:
            if self.norm == "group":
                x = nn.GroupNorm(
                    num_groups=_num_groups(x.shape[-1]),
                    epsilon=BATCH_NORM_EPSILON,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    name="gn",
                )(x)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=BATCH_NORM_EPSILON,
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    name="bn",
                )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseSeparable(nn.Module):
    """MobileNet-v1 block: depthwise 3x3 + pointwise 1x1, each with BN+ReLU6."""

    features: int
    strides: int = 1
    compute_dtype: str = "bfloat16"
    bn_momentum: float = BATCH_NORM_MOMENTUM
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBN(
            in_ch, kernel_size=3, strides=self.strides, groups=in_ch,
            compute_dtype=self.compute_dtype, bn_momentum=self.bn_momentum,
            norm=self.norm, name="depthwise",
        )(x, train)
        x = ConvBN(
            self.features, kernel_size=1,
            compute_dtype=self.compute_dtype, bn_momentum=self.bn_momentum,
            norm=self.norm, name="pointwise",
        )(x, train)
        return x


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """ShuffleNet channel shuffle: interleave channels across groups.

    A pure reshape/transpose — XLA lowers it to a layout change, no copy on
    TPU when fused into the surrounding convs.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)
