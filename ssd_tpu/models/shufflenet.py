"""ShuffleNet-v2 feature extractor.

TPU-native counterpart of the reference's ``src/backbones/shufflenet.py``
(SURVEY.md §2): channel-split blocks with channel shuffle (Ma et al. 2018),
returning stride-8/16/32 feature maps for the FPN.

Stage widths follow the ShuffleNet-v2 table; ``width_multiplier`` selects
between the 0.5x/1.0x/1.5x/2.0x variants (nearest match).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp

from ssd_tpu.models.layers import ConvBN, channel_shuffle

# out_channels per stage for the canonical multipliers
_STAGE_WIDTHS = {
    0.5: (48, 96, 192),
    1.0: (116, 232, 464),
    1.5: (176, 352, 704),
    2.0: (244, 488, 976),
}


def _stage_widths(multiplier: float):
    key = min(_STAGE_WIDTHS, key=lambda k: abs(k - multiplier))
    return _STAGE_WIDTHS[key]


class ShuffleBlock(nn.Module):
    """Basic unit: split channels, transform one half, concat + shuffle."""

    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        shortcut, branch = x[..., :c], x[..., c:]
        CB = functools.partial(ConvBN, compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)
        branch = CB(c, kernel_size=1, name="pw1")(branch, train)
        branch = CB(c, kernel_size=3, groups=c, act=None, name="dw")(branch, train)
        branch = CB(c, kernel_size=1, name="pw2")(branch, train)
        out = jnp.concatenate([shortcut, branch], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleDownBlock(nn.Module):
    """Stride-2 unit: both branches transformed, spatial /2, channels x2."""

    features: int
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        in_ch = x.shape[-1]
        CB = functools.partial(ConvBN, compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)

        left = CB(in_ch, kernel_size=3, strides=2, groups=in_ch, act=None,
                  name="left_dw")(x, train)
        left = CB(c, kernel_size=1, name="left_pw")(left, train)

        right = CB(c, kernel_size=1, name="right_pw1")(x, train)
        right = CB(c, kernel_size=3, strides=2, groups=c, act=None,
                   name="right_dw")(right, train)
        right = CB(c, kernel_size=1, name="right_pw2")(right, train)

        out = jnp.concatenate([left, right], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    width_multiplier: float = 1.0
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        w2, w3, w4 = _stage_widths(self.width_multiplier)
        kw = dict(compute_dtype=self.compute_dtype,
                  bn_momentum=self.bn_momentum, norm=self.norm)
        Down = functools.partial(ShuffleDownBlock, **kw)
        Block = functools.partial(ShuffleBlock, **kw)

        x = ConvBN(24, strides=self.stem_stride, name="stem", **kw)(x, train)  # /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /4

        x = Down(w2, name="stage2_down")(x, train)  # /8
        for i in range(3):
            x = Block(name=f"stage2_b{i}")(x, train)
        c3 = x

        x = Down(w3, name="stage3_down")(x, train)  # /16
        for i in range(7):
            x = Block(name=f"stage3_b{i}")(x, train)
        c4 = x

        x = Down(w4, name="stage4_down")(x, train)  # /32
        for i in range(3):
            x = Block(name=f"stage4_b{i}")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
