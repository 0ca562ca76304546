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
    # Rematerialization of the early (high-resolution, narrow-channel)
    # stack during training — the <=64-channel activations at strides 2-4
    # are stored lane-PADDED to 128 on TPU (4x HBM inflation), a measured
    # ~34 ms/step tax at b32/640 (BENCHMARKS.md round 2b). Modes:
    #   "none"   — store everything (default);
    #   "blocks" — remat each block stem..ds5: block inputs are stored,
    #              intra-block (depthwise/BN) intermediates recomputed;
    #   "stack"  — one remat over stem..ds5: only the raw image and c3
    #              are stored; the whole early stack recomputes in bwd.
    remat_early: str = "none"
    # "reference" | "dense4" — see config.ModelConfig.stem_schedule. With
    # "dense4" the caller has already space-to-depth(4)-packed the input to
    # (H/4, W/4, 48); the early stack becomes one dense lane-aligned
    # 3x3 conv to w(128) plus ds3, replacing stem/ds1/ds2 (whose /2
    # outputs the FPN never consumed).
    stem_schedule: str = "reference"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _width(ch, self.width_multiplier)
        DSBase = DepthwiseSeparable
        StemBase = ConvBN
        if self.remat_early == "blocks":
            DSBase = nn.remat(DepthwiseSeparable, static_argnums=(2,))
            StemBase = nn.remat(ConvBN, static_argnums=(2,))
        DS = functools.partial(DSBase,
                               compute_dtype=self.compute_dtype,
                               bn_momentum=self.bn_momentum, norm=self.norm)
        DSLate = functools.partial(DepthwiseSeparable,
                                   compute_dtype=self.compute_dtype,
                                   bn_momentum=self.bn_momentum,
                                   norm=self.norm)

        def early(mdl, x, train):
            if mdl.stem_schedule == "dense4":
                # x is the space-to-depth(4)-packed image: 48 ch @ /4.
                # One dense 3x3 covers a 12x12-pixel patch — more context
                # than the reference stem's 3x3 @ /2 — and feeds the MXU a
                # 48->128 contraction instead of a 3-channel conv.
                x = StemBase(w(128), strides=1,
                             compute_dtype=mdl.compute_dtype,
                             bn_momentum=mdl.bn_momentum, norm=mdl.norm,
                             act_range=3.0,  # normalized image values
                             name="stem")(x, train)  # /4
            else:
                x = StemBase(w(32), strides=mdl.stem_stride,
                             compute_dtype=mdl.compute_dtype,
                             bn_momentum=mdl.bn_momentum, norm=mdl.norm,
                             act_range=3.0,  # stem input: normalized images
                             name="stem")(x, train)  # /2
                x = DS(w(64), name="ds1")(x, train)
                x = DS(w(128), strides=2, name="ds2")(x, train)  # /4
            x = DS(w(128), name="ds3")(x, train)
            x = DS(w(256), strides=2, name="ds4")(x, train)  # /8
            x = DS(w(256), name="ds5")(x, train)
            return x

        if self.remat_early == "stack":
            x = nn.remat(early, static_argnums=(2,))(self, x, train)
        else:
            x = early(self, x, train)
        c3 = x
        x = DSLate(w(512), strides=2, name="ds6")(x, train)  # /16
        for i in range(5):
            x = DSLate(w(512), name=f"ds{7 + i}")(x, train)
        c4 = x
        x = DSLate(w(1024), strides=2, name="ds12")(x, train)  # /32
        x = DSLate(w(1024), name="ds13")(x, train)
        c5 = x
        return {"c3": c3, "c4": c4, "c5": c5}
