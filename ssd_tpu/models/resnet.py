"""ResNet-50 feature extractor (for the RetinaNet ResNet-50-FPN config).

Not in the reference's backbone set, but required by BASELINE config 3
("RetinaNet ResNet-50-FPN, batch-32 TPU inference at 640x640"). Standard
bottleneck ResNet-v1.5 (stride in the 3x3), NHWC, bfloat16 compute.
"""

from __future__ import annotations

import functools

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: int = 1
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        CB = functools.partial(ConvBN, compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)
        out_ch = self.features * 4
        residual = x
        if x.shape[-1] != out_ch or self.strides != 1:
            residual = CB(out_ch, kernel_size=1, strides=self.strides,
                          act=None, name="proj")(x, train)
        y = CB(self.features, kernel_size=1, act=nn.relu, name="conv1")(x, train)
        y = CB(self.features, kernel_size=3, strides=self.strides,
               act=nn.relu, name="conv2")(y, train)
        y = CB(out_ch, kernel_size=1, act=None, name="conv3")(y, train)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(compute_dtype=self.compute_dtype,
                  bn_momentum=self.bn_momentum, norm=self.norm)
        B = functools.partial(Bottleneck, **kw)
        x = ConvBN(64, kernel_size=7, strides=self.stem_stride, act=nn.relu,
                   name="stem", **kw)(x, train)                         # /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")      # /4

        for i in range(3):
            x = B(64, name=f"s1_b{i}")(x, train)
        x = B(128, strides=2, name="s2_b0")(x, train)  # /8
        for i in range(1, 4):
            x = B(128, name=f"s2_b{i}")(x, train)
        c3 = x
        x = B(256, strides=2, name="s3_b0")(x, train)  # /16
        for i in range(1, 6):
            x = B(256, name=f"s3_b{i}")(x, train)
        c4 = x
        x = B(512, strides=2, name="s4_b0")(x, train)  # /32
        for i in range(1, 3):
            x = B(512, name=f"s4_b{i}")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
