"""ResNet-50 feature extractor (for the RetinaNet ResNet-50-FPN config).

Not in the reference's backbone set, but required by BASELINE config 3
("RetinaNet ResNet-50-FPN, batch-32 TPU inference at 640x640"). Standard
bottleneck ResNet-v1.5 (stride in the 3x3), NHWC, bfloat16 compute.
"""

from __future__ import annotations

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: int = 1
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        out_ch = self.features * 4
        residual = x
        if x.shape[-1] != out_ch or self.strides != 1:
            residual = ConvBN(out_ch, kernel_size=1, strides=self.strides,
                              act=None, compute_dtype=dt, name="proj")(x, train)
        y = ConvBN(self.features, kernel_size=1, act=nn.relu,
                   compute_dtype=dt, name="conv1")(x, train)
        y = ConvBN(self.features, kernel_size=3, strides=self.strides,
                   act=nn.relu, compute_dtype=dt, name="conv2")(y, train)
        y = ConvBN(out_ch, kernel_size=1, act=None,
                   compute_dtype=dt, name="conv3")(y, train)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        x = ConvBN(64, kernel_size=7, strides=2, act=nn.relu,
                   compute_dtype=dt, name="stem")(x, train)            # /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")      # /4

        for i in range(3):
            x = Bottleneck(64, compute_dtype=dt, name=f"s1_b{i}")(x, train)
        x = Bottleneck(128, strides=2, compute_dtype=dt, name="s2_b0")(x, train)  # /8
        for i in range(1, 4):
            x = Bottleneck(128, compute_dtype=dt, name=f"s2_b{i}")(x, train)
        c3 = x
        x = Bottleneck(256, strides=2, compute_dtype=dt, name="s3_b0")(x, train)  # /16
        for i in range(1, 6):
            x = Bottleneck(256, compute_dtype=dt, name=f"s3_b{i}")(x, train)
        c4 = x
        x = Bottleneck(512, strides=2, compute_dtype=dt, name="s4_b0")(x, train)  # /32
        for i in range(1, 3):
            x = Bottleneck(512, compute_dtype=dt, name=f"s4_b{i}")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
