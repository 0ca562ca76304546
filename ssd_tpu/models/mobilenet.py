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
import jax
import jax.numpy as jnp

from ssd_tpu.constants import BATCH_NORM_EPSILON
from ssd_tpu.models.layers import (ConvBN, DepthwiseSeparable, QuantConv,
                                   _dtype, _num_groups, space_to_depth)


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


class _FoldedS2DConv(nn.Module):
    """The dense4 stem conv, lowered WITHOUT materializing space-to-depth.

    Parameterized exactly like the packed formulation — one
    ``(3, 3, 48, features)`` kernel over the space-to-depth(4) image — but
    applied as the mathematically identical 12x12/stride-4 conv on the raw
    input: ``w12[4ky+dy, 4kx+dx, c] = w48[ky, kx, (4dy+dx)*3+c]``, padding
    4 on each side (= the packed conv's SAME padding of one 48-channel
    ring). XLA materializes the explicit s2d reshape/transpose chain as two
    full-image layout copies (~1.7 ms of the b32/640 serve batch, round-3
    trace); the fold removes them while keeping the checkpoint tree
    interchangeable with the packed form.
    """

    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 48, self.features), jnp.float32)
        k = kernel.astype(self.dtype).reshape(3, 3, 4, 4, 3, self.features)
        w12 = k.transpose(0, 2, 1, 3, 4, 5).reshape(12, 12, 3, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w12, (4, 4), [(4, 4), (4, 4)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Dense4Stem(nn.Module):
    """dense4 early schedule: raw normalized image -> (H/4, W/4, features).

    Folded-conv lowering in bf16/f32 (``_FoldedS2DConv``); the int8
    inference path keeps the explicit packing so the quantized conv sees
    the lane-aligned 48-channel input (same param tree either way).
    Norm + ReLU6 mirror ``ConvBN``.
    """

    features: int
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    act_range: float = 3.0  # stem input: normalized images

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        if self.compute_dtype == "int8" and not train:
            x = space_to_depth(x, 4)
            x = QuantConv(self.features, 3, 1, use_bias=False,
                          act_range=self.act_range, name="conv")(x)
        else:
            x = _FoldedS2DConv(self.features, dtype, name="conv")(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=_num_groups(x.shape[-1]),
                             epsilon=BATCH_NORM_EPSILON, dtype=dtype,
                             param_dtype=jnp.float32, name="gn")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=BATCH_NORM_EPSILON, dtype=dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        return nn.relu6(x)


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
                # x is the RAW normalized image. One dense 3x3 over the
                # (folded) space-to-depth(4) packing covers a 12x12-pixel
                # patch — more context than the reference stem's 3x3 @ /2 —
                # and feeds the MXU a 48->128 contraction instead of a
                # 3-channel conv. See Dense4Stem for the fold.
                Stem4 = Dense4Stem
                if mdl.remat_early == "blocks":
                    Stem4 = nn.remat(Dense4Stem, static_argnums=(2,))
                x = Stem4(w(128), compute_dtype=mdl.compute_dtype,
                          bn_momentum=mdl.bn_momentum, norm=mdl.norm,
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
