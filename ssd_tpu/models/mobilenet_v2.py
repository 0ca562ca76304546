"""MobileNet-v2 feature extractor (inverted residuals, linear bottlenecks).

Backbone family extension beyond the reference (SURVEY.md §2 lists
MobileNet-v1 and ShuffleNet-v2; the reference's author uses v1): the
standard MobileNet-v2 schedule (Sandler et al. 2018) with ReLU6 and a
width multiplier, returning stride-8/16/32 feature maps for the FPN.

TPU notes: expansion keeps every matmul-heavy 1x1 conv at >=96 channels
for width 1.0 (good MXU occupancy); residual adds fuse into the
projection conv's epilogue under XLA.
"""

from __future__ import annotations

import functools

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


# (expand_ratio, out_channels, num_blocks, first_stride)
_SCHEDULE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),    # /4
    (6, 32, 3, 2),    # /8  -> c3
    (6, 64, 4, 2),    # /16
    (6, 96, 3, 1),    #     -> c4
    (6, 160, 3, 2),   # /32
    (6, 320, 1, 1),   #     -> c5
)


class InvertedResidual(nn.Module):
    """expand 1x1 + relu6, dw 3x3 + relu6, project 1x1 (linear)."""

    features: int
    strides: int = 1
    expand: int = 6
    kernel_size: int = 3  # depthwise kernel (EfficientNet-lite uses 5 too)
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        CB = functools.partial(ConvBN, compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)
        h = x
        if self.expand != 1:
            h = CB(mid, kernel_size=1, name="expand")(h, train)
        h = CB(mid, kernel_size=self.kernel_size, strides=self.strides,
               groups=mid, name="depthwise")(h, train)
        h = CB(self.features, kernel_size=1, act=None, name="project")(h, train)
        if self.strides == 1 and in_ch == self.features:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    width_multiplier: float = 1.0
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _width(ch, self.width_multiplier)
        x = ConvBN(w(32), strides=self.stem_stride,
                   compute_dtype=self.compute_dtype,
                   bn_momentum=self.bn_momentum, norm=self.norm,
                   act_range=3.0, name="stem")(x, train)  # /2
        taps = {}
        for gi, (t, ch, n, s) in enumerate(_SCHEDULE):
            for bi in range(n):
                x = InvertedResidual(
                    w(ch), strides=s if bi == 0 else 1, expand=t,
                    compute_dtype=self.compute_dtype,
                    bn_momentum=self.bn_momentum, norm=self.norm,
                    name=f"block{gi}_{bi}",
                )(x, train)
            if gi == 2:
                taps["c3"] = x   # stride 8
            elif gi == 4:
                taps["c4"] = x   # stride 16
            elif gi == 6:
                taps["c5"] = x   # stride 32
        return taps
