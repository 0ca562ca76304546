"""EfficientNet-lite feature extractor (MBConv, no squeeze-excite).

Backbone family extension beyond the reference set (SURVEY.md §2 lists
MobileNet-v1 and ShuffleNet-v2): the EfficientNet-lite0 schedule (Tan &
Le 2019, "lite" variant: squeeze-excite removed, swish -> ReLU6) built
from the same ``InvertedResidual`` block as MobileNet-v2, extended with
the 5x5 depthwise kernels the schedule calls for.

TPU notes: lite's removal of squeeze-excite is exactly the right call
here — SE's global-pool + tiny matmul + broadcast-multiply chain breaks
XLA's conv fusion runs and adds lane-padded (1, 1, C) tensors; without
it the whole backbone lowers to fused conv+BN+ReLU6 blocks. ReLU6 also
keeps every activation bounded, so the backbone composes with the
calibration-free int8 PTQ path's assumptions (not enabled for it by
default; int8 stays mobilenet-v1-only pending measurement).
"""

from __future__ import annotations

import flax.linen as nn

from ssd_tpu.models.layers import ConvBN
from ssd_tpu.models.mobilenet_v2 import InvertedResidual


def _width(ch: int, multiplier: float) -> int:
    return max(8, int(ch * multiplier + 0.5) // 8 * 8)


# (expand, out_ch, num_blocks, first_stride, dw_kernel) — EfficientNet-lite0.
_SCHEDULE = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),    # /4
    (6, 40, 2, 2, 5),    # /8  -> c3
    (6, 80, 3, 2, 3),    # /16
    (6, 112, 3, 1, 5),   #     -> c4
    (6, 192, 4, 2, 5),   # /32
    (6, 320, 1, 1, 3),   #     -> c5
)


class EfficientNetLite(nn.Module):
    """lite0 by default; ``width_multiplier`` scales block widths (the
    lite family pins stem=32 and the final 320 stage across sizes — kept
    here so checkpoints stay compatible with the published schedules)."""

    width_multiplier: float = 1.0
    compute_dtype: str = "bfloat16"
    bn_momentum: float = 0.997
    norm: str = "batch"
    stem_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _width(ch, self.width_multiplier)
        x = ConvBN(32, strides=self.stem_stride,
                   compute_dtype=self.compute_dtype,
                   bn_momentum=self.bn_momentum, norm=self.norm,
                   act_range=3.0, name="stem")(x, train)  # /2
        taps = {}
        for gi, (t, ch, n, s, k) in enumerate(_SCHEDULE):
            out_ch = 320 if gi == len(_SCHEDULE) - 1 else w(ch)
            for bi in range(n):
                x = InvertedResidual(
                    out_ch, strides=s if bi == 0 else 1, expand=t,
                    kernel_size=k, compute_dtype=self.compute_dtype,
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
