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
import jax
import jax.numpy as jnp

from ssd_tpu.constants import BATCH_NORM_EPSILON, BATCH_NORM_MOMENTUM


def _dtype(name: str):
    # int8 mode computes norms/activations in bf16; the conv itself takes
    # the quantized path inside ConvBN.
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "int8": jnp.bfloat16}[name]


def _num_groups(channels: int, target: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= target (GroupNorm)."""
    g = min(target, channels)
    while channels % g:
        g -= 1
    return g


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """NHWC space-to-depth: (N, H, W, C) -> (N, H/b, W/b, C*b*b)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, c * block * block)


class ConvBN(nn.Module):
    """3x3/1x1 conv + batch-norm + optional activation.

    ``compute_dtype="int8"`` (inference): dense (groups==1) convs run
    int8 x int8 -> int32 on the MXU at 2x the bf16 rate. Activation
    scales come from a calibration pass when present (the ``"quant"``
    collection — see :mod:`ssd_tpu.quant`) and otherwise fall back to the
    STATIC ``act_range`` bound (exact for ReLU6-bounded backbone
    activations, so the backbone needs no calibration). Weights use
    per-output-channel absmax scales computed from the f32 params.
    Depthwise convs (VPU-bound) and norms/activations stay bf16.
    """

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
    act_range: float = 6.0  # |input| bound for int8 quantization
    # int8: refuse the static act_range fallback — the input to this conv
    # is an unbounded sum (FPN merges, head trunks), so serving without a
    # calibrated scale would silently clip. See ssd_tpu/quant.py.
    quant_require_scale: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        if self.compute_dtype == "int8" and self.groups == 1 and not train:
            x = self._quantized_conv(x)
        else:
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

    def _quantized_conv(self, x):
        # param layout matches nn.Conv ("conv": {"kernel", "bias"}) so
        # f32-trained checkpoints load into int8 inference unchanged.
        return QuantConv(
            self.features, self.kernel_size, self.strides,
            use_bias=not self.use_norm, act_range=self.act_range,
            require_scale=self.quant_require_scale,
            name="conv",
        )(x)


# Calibration clipping mode, set by ssd_tpu.quant.calibrate (trace-time
# Python state: each calibration call retraces its jitted apply, so a
# module global is visible exactly where it must be). None = absmax;
# a float (e.g. 99.9) = per-batch percentile of |x|, max-accumulated
# across batches — clips the extreme activation tail for a finer grid.
_CALIBRATION_PERCENTILE: float | None = None


def set_calibration_percentile(p: float | None) -> None:
    global _CALIBRATION_PERCENTILE
    _CALIBRATION_PERCENTILE = p


class QuantConv(nn.Module):
    """int8 x int8 -> int32 conv, per-output-channel weight scales.

    Activation-scale resolution, in priority order:

    1. a calibrated per-input-shape scale from the ``"quant"`` collection,
       keyed ``act_scale_{H}x{W}`` — shape-keying gives SHARED modules
       (the head subnets, applied to every pyramid level) a distinct
       scale per level for free;
    2. the static ``act_range`` bound (exact for ReLU6-bounded backbone
       activations) — unless ``require_scale`` forbids the fallback.

    When the ``"quant"`` collection is mutable (a calibration pass:
    ``apply(..., mutable=["quant"])`` — see :mod:`ssd_tpu.quant` — or
    ``init``), the conv runs the full-precision bf16 path and folds the
    observed ``max|x|`` into the stored scale instead.
    """

    features: int
    kernel_size: int
    strides: int
    use_bias: bool
    act_range: float
    require_scale: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kernel_size, self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dn = ("NHWC", "HWIO", "NHWC")
        key = f"act_scale_{x.shape[1]}x{x.shape[2]}"
        static_scale = self.act_range / 127.0

        if self.is_initializing() or self.is_mutable_collection("quant"):
            # init: plain bf16 conv, and do NOT create scale variables —
            # a default-valued scale would let require_scale convs serve
            # silently wrong; absence forces a real calibration pass.
            # calibration (mutable "quant"): record max|x| into the scale.
            if not self.is_initializing():
                # Seed at 0 and max-accumulate the OBSERVED range only: a
                # static-floor seed (act_range/127) would coarsen the grid
                # for inputs whose true range is well below the bound, and
                # would mask a calibration pass that saw no data for this
                # shape key. The static bound stays serve-time-fallback-only.
                sv = self.variable(
                    "quant", key, lambda: jnp.asarray(0.0, jnp.float32))
                ax = jnp.abs(x.astype(jnp.float32))
                amax = (jnp.max(ax) if _CALIBRATION_PERCENTILE is None
                        else jnp.percentile(ax, _CALIBRATION_PERCENTILE))
                sv.value = jnp.maximum(sv.value, amax / 127.0)
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                (self.strides, self.strides), "SAME", dimension_numbers=dn)
            return y if bias is None else y + bias.astype(y.dtype)

        if self.has_variable("quant", key):
            a_scale = self.variable(
                "quant", key, lambda: jnp.asarray(static_scale, jnp.float32)
            ).value
            # calibration seeds at 0 and widens from data; an (unlikely)
            # all-zero calibration input must not divide by zero at serve
            a_scale = jnp.maximum(a_scale, 1e-8)
        elif self.require_scale:
            raise ValueError(
                f"int8 conv {self.name!r} needs a calibrated activation "
                f"scale for input {x.shape[1]}x{x.shape[2]} (its input is "
                "an unbounded sum; the static ReLU6 bound does not apply). "
                "Calibrate the artifact at this image size: "
                "python -m ssd_tpu.quant (see ssd_tpu/quant.py).")
        else:
            a_scale = jnp.asarray(static_scale, jnp.float32)

        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
        ).astype(jnp.int8)
        # Keep the quantize with its PRODUCER, not inside this conv's
        # fusion: without the barrier XLA nests bf16 producers (the
        # depthwise conv in a DepthwiseSeparable block) inside this conv's
        # fusion as a chained double-conv — measured 0.76 ms for ds3's
        # dw+pw at b32/640 vs ~0.5 ms split (round-5 int8 trace). For
        # s8->s8 conv chains the requant already fuses backward into the
        # producer conv's epilogue, so this barrier is a no-op there.
        x_q = jax.lax.optimization_barrier(x_q)
        # per-out-channel symmetric weight quantization
        k_absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True)
        k_scale = jnp.maximum(k_absmax / 127.0, 1e-8)  # (1,1,1,F)
        k_q = jnp.clip(jnp.round(kernel / k_scale), -127, 127).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            x_q, k_q, (self.strides, self.strides), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        # dequantize in f32 (the int32 accumulator can reach ~2^25; a bf16
        # cast first would round 0.4% — the f32 multiply fuses into the
        # conv epilogue either way), then bias, then down to bf16.
        y = y.astype(jnp.float32) * (a_scale * k_scale[0, 0, 0])
        if bias is not None:
            y = y + bias
        return y.astype(jnp.bfloat16)


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
        # Inference-only barrier: keeps XLA from chaining depthwise ->
        # pointwise into one double-conv fusion, whose tiling measured well
        # below the split emitters' (round-4 trace; same effect as in
        # fpn.Subnet). In TRAINING the fused form wins — splitting costs
        # ~5 ms/step at b32/640 in the bandwidth-bound backward (extra
        # activation round trips) — and in INT8 the pointwise conv's
        # requantize pass is the fusion break already; a barrier between
        # them strands the requant as its own full-map loop fusion
        # (round-4 int8 trace: 0.34 ms at 160x160), so both gate it off.
        if not train and self.compute_dtype != "int8":
            x = jax.lax.optimization_barrier(x)
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
