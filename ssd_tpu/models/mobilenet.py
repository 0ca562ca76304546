"""MobileNet-v1 feature extractor.

TPU-native counterpart of the reference's ``src/backbones/mobilenet.py``
(SURVEY.md §2): depthwise-separable conv stack with a width multiplier,
returning stride-8/16/32 feature maps ("C3", "C4", "C5") for the FPN.

Layer schedule is the standard MobileNet-v1 table (Howard et al. 2017),
truncated before the classifier.
"""

from __future__ import annotations

import functools

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN, DepthwiseSeparable


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


class MobileNetV1(nn.Module):
    width_multiplier: float = 1.0
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _width(ch, self.width_multiplier)
        DS = functools.partial(DepthwiseSeparable,
                               compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)

        x = ConvBN(w(32), strides=self.stem_stride, compute_dtype=self.compute_dtype,
                   bn_momentum=self.bn_momentum, norm=self.norm,
                   act_range=3.0,  # stem input: normalized images, not ReLU6
                   name="stem")(x, train)  # /2
        x = DS(w(64), name="ds1")(x, train)
        x = DS(w(128), strides=2, name="ds2")(x, train)  # /4
        x = DS(w(128), name="ds3")(x, train)
        x = DS(w(256), strides=2, name="ds4")(x, train)  # /8
        x = DS(w(256), name="ds5")(x, train)
        c3 = x
        x = DS(w(512), strides=2, name="ds6")(x, train)  # /16
        for i in range(5):
            x = DS(w(512), name=f"ds{7 + i}")(x, train)
        c4 = x
        x = DS(w(1024), strides=2, name="ds12")(x, train)  # /32
        x = DS(w(1024), name="ds13")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
