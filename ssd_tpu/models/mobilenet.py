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
import numpy as np

from ssd_tpu.constants import BATCH_NORM_EPSILON, MEAN_RGB, STD_RGB
from ssd_tpu.models.layers import (ConvBN, DepthwiseSeparable, QuantConv,
                                   _dtype, _num_groups, space_to_depth)


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


def _s2d_pack_kernel() -> np.ndarray:
    """Constant one-hot (4, 4, 3, 48) kernel: conv(x, k, stride 4, VALID)
    IS space-to-depth(4) — channel ``(4*dy + dx)*3 + c`` picks pixel
    ``(dy, dx)`` channel ``c`` of each 4x4 block."""
    k = np.zeros((4, 4, 3, 48), np.float32)
    for dy in range(4):
        for dx in range(4):
            for c in range(3):
                k[dy, dx, c, (4 * dy + dx) * 3 + c] = 1.0
    return k


class _FoldedS2DConv(nn.Module):
    """The dense4 stem conv, lowered WITHOUT materializing space-to-depth
    through XLA reshape/transpose (two full-image layout copies, ~1.7 ms
    of the b32/640 serve batch, round-3 trace).

    Parameterized as one ``(3, 3, 48, features)`` kernel over the
    space-to-depth(4) image. Lowering (round-4 trace-driven): the packing
    itself runs as a conv with a constant one-hot ``(4, 4, 3, 48)``
    stride-4 kernel (:func:`_s2d_pack_kernel`) — the conv emitter handles
    the strided window with no transpose copies — followed by the real
    3x3 SAME conv on the clean 48-channel input (C_in=48 tiles the MXU's
    16-wide input-channel window exactly; the direct 12x12/s4 C_in=3 form
    padded 3->8 sublanes and measured 2.07 ms vs 1.64 ms for this form).
    Zero-padding the packed grid is tap-for-tap identical to the 12x12
    form's 4-pixel zero padding.
    """

    features: int
    dtype: jnp.dtype
    # Fold the ImageNet normalize affine into this conv's lowering: the
    # input is then the RAW uint8 image and the bf16 full-resolution
    # normalized image (plus its ~0.6 ms layout copy, round-4 trace)
    # never materializes. Exact: weights are pre-divided by STD_RGB and
    # the mean term is subtracted as a border-aware correction map, so
    # zero-padding the raw input reproduces the normalized path's
    # mean-padding semantics tap for tap (see _border_correction).
    fold_normalize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 48, self.features), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        packed_in = x.dtype == jnp.int8
        if packed_in:
            # PACKED INGEST (ops/ingest.py): the pipeline delivered the
            # space-to-depth(4) packing as -128-shifted s8. Integers
            # |v| <= 128 are exact in bf16, and
            #   conv((p - mean)/std, w) = conv(p - 128, w/std)
            #                             + border((128 - mean) * w/std)
            # so the fold below just swaps the correction constant — the
            # pack conv and the raw image's relayout copy (~1.5 ms of the
            # bf16 b32/640 serve batch, round-4 wall table) never run.
            if not self.fold_normalize:
                raise ValueError("packed ingest requires fold_normalize")
            xs = x.astype(self.dtype)
        else:
            pack = jnp.asarray(_s2d_pack_kernel(), self.dtype)
            xs = jax.lax.conv_general_dilated(
                x.astype(self.dtype), pack, (4, 4), "VALID",
                dimension_numbers=dn)  # (N, H/4, W/4, 48)
        if not self.fold_normalize:
            return jax.lax.conv_general_dilated(
                xs, kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=dn)
        std48 = jnp.asarray(np.tile(STD_RGB, 16), jnp.float32)
        wp = (kernel / std48[None, None, :, None]).astype(self.dtype)
        # Eval/serve: f32 accumulate/output — the mean-correction
        # subtraction cancels a term of comparable magnitude, so the conv
        # result must not round to bf16 before it (the convert fuses into
        # the conv root). Train: jax 0.9's conv transpose rule rejects
        # mixed (bf16 operands, f32 cotangent) convs, so the
        # differentiated path takes the plain same-dtype conv; its extra
        # output rounding is ordinary bf16 conv noise pre-BN.
        if train and self.dtype != jnp.float32:
            y = jax.lax.conv_general_dilated(
                xs, wp, (1, 1), "SAME", dimension_numbers=dn
            ).astype(jnp.float32)
        else:
            y = jax.lax.conv_general_dilated(
                xs, wp, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        if packed_in:
            # input was p - 128: ADD the (128 - mean)/std correction map
            shift48 = 128.0 - jnp.asarray(np.tile(MEAN_RGB, 16), jnp.float32)
            corr = self._border_correction(
                wp.astype(jnp.float32), xs.shape[1], xs.shape[2],
                const48=shift48)
            return (y + corr).astype(self.dtype)
        corr = self._border_correction(
            wp.astype(jnp.float32), xs.shape[1], xs.shape[2])
        return (y - corr).astype(self.dtype)

    @staticmethod
    def _border_correction(wp_f32, ph: int, pw: int, const48=None):
        """conv(mean_image, wp) under the same zero-padding, cheaply.

        ``y - corr`` then equals ``conv(x - mean, wp)`` with the padded
        ring contributing zero — identical semantics to convolving the
        normalized image. Interior outputs all share one value, so a 5x5
        packed-grid probe (left edge / 3 interior / right edge positions
        per axis) covers every boundary class; the full map is assembled
        by broadcasting the interior class. Falls back to a full-size
        probe below 5 packed cells where edge windows overlap.
        """
        dn = ("NHWC", "HWIO", "NHWC")
        # default constant: the packed ImageNet mean. The int8 stem passes
        # const48 = 128 - mean and ADDS the map (see _Int8FoldedS2DConv).
        mean48 = (jnp.asarray(np.tile(MEAN_RGB, 16), jnp.float32)
                  if const48 is None else const48)
        if ph < 5 or pw < 5:
            img = jnp.broadcast_to(mean48, (1, ph, pw, 48))
            return jax.lax.conv_general_dilated(
                img, wp_f32, (1, 1), "SAME", dimension_numbers=dn)
        probe = jax.lax.conv_general_dilated(
            jnp.broadcast_to(mean48, (1, 5, 5, 48)), wp_f32, (1, 1),
            "SAME", dimension_numbers=dn)[0]  # (5, 5, F)

        def expand(c, n: int, axis: int):
            first = jax.lax.slice_in_dim(c, 0, 1, axis=axis)
            mid = jax.lax.slice_in_dim(c, 1, 2, axis=axis)
            last = jax.lax.slice_in_dim(c, 4, 5, axis=axis)
            shape = list(c.shape)
            shape[axis] = n - 2
            return jnp.concatenate(
                [first, jnp.broadcast_to(mid, shape), last], axis)

        return expand(expand(probe, ph, 0), pw, 1)[None]


class _Int8FoldedS2DConv(nn.Module):
    """int8 lowering of the folded dense4 stem conv — EXACT-integer input.

    Raw uint8 pixels ARE int8-exact after a -128 shift, so the stem needs
    no activation quantization at all: the packing runs as a u8 x u8
    one-hot conv whose epilogue subtracts 128 (no space-to-depth layout
    copies, no normalized full-resolution image — the round-4 int8 trace
    priced those at ~2.5 ms/batch at b32/640), and the 3x3 main conv runs
    s8 x s8 -> s32 on the MXU at 2x the bf16 rate with the ImageNet
    normalize affine folded into its per-channel weight scales:

        conv((x - mean)/std, w) = conv(x - 128, w/std)
                                  + border_sum((128 - mean) * w/std)

    The correction map uses the DEQUANTIZED weights, so the only error vs
    the bf16 folded path is the weight rounding itself (~0.4% relative).
    Same ``(3, 3, 48, features)`` param tree as _FoldedS2DConv.
    """

    features: int

    @nn.compact
    def __call__(self, x):  # x: raw uint8 (N, H, W, 3) OR packed s8
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 48, self.features), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        if x.dtype == jnp.int8:
            # PACKED INGEST: the input pipeline already delivered the
            # space-to-depth(4) packing as shifted s8 (u8 XOR 0x80 — see
            # ops/ingest.pack_s2d). Bit-identical to the on-device packing
            # below, but the program skips both the pack conv (~0.65 ms at
            # b32/640) and the raw image's relayout copy (~0.58 ms, the
            # layout device_put cannot materialize — utils/layout.py);
            # this is the MLPerf-ResNet space-to-depth-in-the-pipeline
            # move, TPU-native ingest instead of host-faithful ingest.
            xs = x
        else:
            # The -128 shift as a BIT TRICK, not an epilogue subtract:
            # (u8 XOR 0x80) reinterpreted as s8 IS u8 - 128, exactly, for
            # all 256 values. The XOR fuses into the input's (already
            # present) relayout copy for free, and the one-hot pack conv
            # then runs s8 x s8 -> s32 on the MXU's int8 path instead of
            # the slow u8 emitter (round-5 trace: 0.69 ms u8 form at
            # b32/640).
            xor = jax.lax.bitcast_convert_type(x ^ jnp.uint8(0x80), jnp.int8)
            pack = jnp.asarray(_s2d_pack_kernel(), jnp.int8)
            xs = jax.lax.conv_general_dilated(
                xor, pack, (4, 4), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            xs = xs.astype(jnp.int8)  # exact: one tap per output, fits s8

        std48 = jnp.asarray(np.tile(STD_RGB, 16), jnp.float32)
        wp = kernel / std48[None, None, :, None]
        k_absmax = jnp.max(jnp.abs(wp), axis=(0, 1, 2), keepdims=True)
        k_scale = jnp.maximum(k_absmax / 127.0, 1e-8)
        k_q = jnp.clip(jnp.round(wp / k_scale), -127, 127).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            xs, k_q, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * k_scale[0, 0, 0]

        shift48 = 128.0 - jnp.asarray(np.tile(MEAN_RGB, 16), jnp.float32)
        corr = _FoldedS2DConv._border_correction(
            k_q.astype(jnp.float32) * k_scale, xs.shape[1], xs.shape[2],
            const48=shift48)
        return (y + corr).astype(jnp.bfloat16)


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
    # True -> the input is the RAW uint8 image and the normalize affine is
    # folded into the conv weights (see _FoldedS2DConv.fold_normalize).
    fold_normalize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        if (self.compute_dtype == "int8" and not train
                and self.fold_normalize):
            # raw uint8 input: exact-integer int8 lowering, no explicit
            # space-to-depth, normalize folded into the weight scales
            x = _Int8FoldedS2DConv(self.features, name="conv")(x)
        elif self.compute_dtype == "int8" and not train:
            # pre-normalized bf16 input (callers that normalize themselves)
            x = space_to_depth(x, 4)
            x = QuantConv(self.features, 3, 1, use_bias=False,
                          act_range=self.act_range, name="conv")(x)
        else:
            x = _FoldedS2DConv(self.features, dtype,
                               fold_normalize=self.fold_normalize,
                               name="conv")(x, train)
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
    # dense4 only: input is the raw uint8 image; the stem conv folds the
    # ImageNet normalize affine into its weights (Dense4Stem.fold_normalize).
    stem_fold_normalize: bool = False

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
                          fold_normalize=mdl.stem_fold_normalize,
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
