"""MobileNet-v1 feature extractor.

TPU-native counterpart of the reference's ``src/backbones/mobilenet.py``
(SURVEY.md §2): depthwise-separable conv stack with a width multiplier,
returning stride-8/16/32 feature maps ("C3", "C4", "C5") for the FPN.

Layer schedule is the standard MobileNet-v1 table (Howard et al. 2017),
truncated before the classifier.
"""

from __future__ import annotations

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN, DepthwiseSeparable


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


class MobileNetV1(nn.Module):
    width_multiplier: float = 1.0
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _width(ch, self.width_multiplier)
        dt = self.compute_dtype

        x = ConvBN(w(32), strides=2, compute_dtype=dt, name="stem")(x, train)   # /2
        x = DepthwiseSeparable(w(64), compute_dtype=dt, name="ds1")(x, train)
        x = DepthwiseSeparable(w(128), strides=2, compute_dtype=dt, name="ds2")(x, train)  # /4
        x = DepthwiseSeparable(w(128), compute_dtype=dt, name="ds3")(x, train)
        x = DepthwiseSeparable(w(256), strides=2, compute_dtype=dt, name="ds4")(x, train)  # /8
        x = DepthwiseSeparable(w(256), compute_dtype=dt, name="ds5")(x, train)
        c3 = x
        x = DepthwiseSeparable(w(512), strides=2, compute_dtype=dt, name="ds6")(x, train)  # /16
        for i in range(5):
            x = DepthwiseSeparable(w(512), compute_dtype=dt, name=f"ds{7 + i}")(x, train)
        c4 = x
        x = DepthwiseSeparable(w(1024), strides=2, compute_dtype=dt, name="ds12")(x, train)  # /32
        x = DepthwiseSeparable(w(1024), compute_dtype=dt, name="ds13")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
