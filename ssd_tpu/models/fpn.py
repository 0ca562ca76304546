"""Feature Pyramid Network + RetinaNet class/box subnets.

TPU-native counterpart of the reference's ``src/network.py`` (SURVEY.md §2
"FPN + heads" row): P3-P5 from 1x1 laterals + top-down upsample-add + 3x3
smoothing; P6/P7 by stride-2 convs; shared class and box subnets applied per
level; class-head bias initialized to ``-log((1 - pi) / pi)`` (RetinaNet
focal-loss prior, pi = 0.01).

Upsampling is nearest-neighbor at static shapes so XLA lowers it to a cheap
broadcast-reshape rather than a gather.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssd_tpu.constants import CLASS_PRIOR
from ssd_tpu.models.layers import ConvBN, QuantConv, _dtype


def _upsample_nearest(x: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    th, tw = target_hw
    if th == 2 * h and tw == 2 * w:
        # exact 2x: broadcast trick, no gather
        x = x[:, :, None, :, None, :]
        x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
        return x.reshape(n, 2 * h, 2 * w, c)
    return jax.image.resize(x, (n, th, tw, c), method="nearest")


class FPN(nn.Module):
    """Builds P3..P7 from backbone {c3, c4, c5}."""

    channels: int = 128
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, feats: dict, train: bool = False):
        dt = self.compute_dtype
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]

        # int8 neck (see ssd_tpu/quant.py): every FPN conv input is an
        # unbounded sum (laterals read pre-bounded backbone taps, but the
        # smooth/p6/p7 inputs are merges), so a calibrated scale is
        # mandatory — no static ReLU6 fallback.
        lat = lambda name: ConvBN(self.channels, kernel_size=1, use_norm=False,
                                  act=None, compute_dtype=dt,
                                  quant_require_scale=True, name=name)
        smooth = lambda name: ConvBN(self.channels, kernel_size=3, use_norm=False,
                                     act=None, compute_dtype=dt,
                                     quant_require_scale=True, name=name)

        p5 = lat("lateral5")(c5, train)
        p4 = lat("lateral4")(c4, train) + _upsample_nearest(p5, c4.shape[1:3])
        p3 = lat("lateral3")(c3, train) + _upsample_nearest(p4, c3.shape[1:3])

        p3 = smooth("smooth3")(p3, train)
        p4 = smooth("smooth4")(p4, train)
        p5 = smooth("smooth5")(p5, train)

        p6 = ConvBN(self.channels, kernel_size=3, strides=2, use_norm=False,
                    act=None, compute_dtype=dt, quant_require_scale=True,
                    name="p6")(c5, train)
        p7 = ConvBN(self.channels, kernel_size=3, strides=2, use_norm=False,
                    act=None, compute_dtype=dt, quant_require_scale=True,
                    name="p7")(nn.relu(p6), train)
        return [p3, p4, p5, p6, p7]


class Subnet(nn.Module):
    """Shared head: ``depth`` 3x3 convs + final prediction conv.

    The same Subnet instance is applied to every pyramid level, so flax
    shares its parameters across levels (RetinaNet's weight sharing).
    """

    depth: int
    channels: int
    out_channels: int  # K*C for the class head, K*4 for the box head
    final_bias_init: float = 0.0
    compute_dtype: str = "bfloat16"
    final_kernel: int = 3

    @nn.compact
    def __call__(self, x, trunk_only: bool = False, train: bool = False):
        dt = _dtype(self.compute_dtype)
        # int8 inference (see ssd_tpu/quant.py): the head is where the
        # FLOPs are (the P3 class predict conv alone is ~21% of serve
        # device time), so these convs run int8 on the MXU at 2x rate.
        # QuantConv's shape-keyed scales give the SHARED subnet a distinct
        # calibrated scale per pyramid level. Param trees match nn.Conv.
        quant = self.compute_dtype == "int8" and not train
        for i in range(self.depth):
            if quant:
                x = QuantConv(self.channels, 3, 1, use_bias=True,
                              act_range=6.0, require_scale=True,
                              name=f"conv{i}")(x)
            else:
                x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=dt,
                            param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.relu(x)
            # Inference-only barrier: without it XLA chains conv_i ->
            # conv_{i+1} into one double-conv fusion whose tiling runs at
            # ~74% MXU vs ~97% for the single-conv emitters (round-4
            # trace, P3: 0.83 ms fused pair vs 2 x 0.32 ms split). In
            # TRAINING the fused form wins (bandwidth-bound backward); in
            # INT8 the next conv's requantize is the fusion break already
            # (a barrier would strand it as its own loop fusion), so both
            # gate it off.
            if not train and not quant:
                x = jax.lax.optimization_barrier(x)
        if trunk_only:
            return x
        # Prediction conv stays in compute dtype: the (N, A, C) logits are
        # the model's largest tensor (786MB at f32 for b32/640/80-class);
        # bf16 halves that HBM traffic. Loss/postprocess upcast to f32.
        if quant:
            return QuantConv(
                self.out_channels, self.final_kernel, 1, use_bias=True,
                act_range=6.0, require_scale=True,
                bias_init=nn.initializers.constant(self.final_bias_init),
                kernel_init=nn.initializers.normal(0.01),
                name="predict",
            )(x)
        x = nn.Conv(
            self.out_channels, (self.final_kernel, self.final_kernel),
            padding="SAME", dtype=dt,
            param_dtype=jnp.float32,
            bias_init=nn.initializers.constant(self.final_bias_init),
            kernel_init=nn.initializers.normal(0.01),
            name="predict",
        )(x)
        return x


class RetinaHead(nn.Module):
    """Class + box subnets over all levels.

    ``flatten=True`` (default): ``(N, A, C)`` logits + ``(N, A, 4)`` deltas,
    concatenated over levels — the reference-shaped raw outputs.

    ``flatten=False``: the per-level raw maps
    ``[(cls (N, H, W, K*C), box (N, H, W, K*4)), ...]`` — lets the
    inference postprocess select candidates per level WITHOUT the large
    (N, A, C) relayout (see ops/postprocess.py).
    """

    num_classes: int
    anchors_per_cell: int
    depth: int = 4
    channels: int = 128
    compute_dtype: str = "bfloat16"
    final_kernel: int = 3

    @nn.compact
    def __call__(self, pyramid: list, flatten: bool = True,
                 trunk_only: bool = False, train: bool = False):
        k = self.anchors_per_cell
        class_net = Subnet(
            self.depth, self.channels, k * self.num_classes,
            final_bias_init=-math.log((1.0 - CLASS_PRIOR) / CLASS_PRIOR),
            compute_dtype=self.compute_dtype, final_kernel=self.final_kernel,
            name="class_net",
        )
        box_net = Subnet(
            self.depth, self.channels, k * 4,
            compute_dtype=self.compute_dtype, final_kernel=self.final_kernel,
            name="box_net",
        )

        if trunk_only:
            # per-level subnet trunks, flattened over cells and concatenated:
            # (N, total_cells, channels) each — consumed by the fused
            # logits+max Pallas head (ops/fused_head.py)
            cls_t, box_t = [], []
            for p in pyramid:
                n, h, w, _ = p.shape
                cls_t.append(class_net(p, trunk_only=True, train=train)
                             .reshape(n, h * w, self.channels))
                box_t.append(box_net(p, trunk_only=True, train=train)
                             .reshape(n, h * w, self.channels))
            return jnp.concatenate(cls_t, 1), jnp.concatenate(box_t, 1)

        raw = [(class_net(p, train=train),
                box_net(p, train=train)) for p in pyramid]
        if not flatten:
            return raw

        logits, deltas = [], []
        for (cls, box), p in zip(raw, pyramid):
            n, h, w, _ = p.shape
            logits.append(cls.reshape(n, h * w * k, self.num_classes))
            deltas.append(box.reshape(n, h * w * k, 4))
        return (
            jnp.concatenate(logits, axis=1),
            jnp.concatenate(deltas, axis=1),
        )
