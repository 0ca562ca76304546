"""Fused Pallas kernel for the early (narrow-channel) MobileNet blocks.

Motivation (BENCHMARKS.md round-2 serving trace): every activation with
fewer than 128 channels is stored by XLA with its channel (lane) dim
padded to 128, and every VREG/MXU op on it pays the same 2-4x padding.
At 640x640/b32 the ds1+ds2 blocks alone cost 2.8 + 1.6 ms of the 23 ms
inference step.

This kernel computes ds1 (dw3x3 s1 + BN + relu6, pw 1x1 + BN + relu6)
and ds2 (dw3x3 s2 + BN + relu6, pw 1x1 + BN + relu6) in ONE pass over a
CHANNEL-PACKED layout: an image row is one (W*C,) lane vector holding W
pixels x C channels densely (320*32 = 10240 = 80 lane-tiles, no
padding). Everything stays dense:

  * depthwise taps are lane shifts by C*dx (zero-filled concat — Mosaic
    supports arbitrary lane shifts) + row slices for dy;
  * per-channel BN scale/bias and dw kernels broadcast as W-tiled static
    (W*C,) vectors;
  * pointwise convs are BLOCK-DIAGONAL matmuls on a (rows*W/g, 128) view
    (g = 128/C pixels per MXU row): lane->sublane casts are legal when
    the minor dim is a 128-multiple, and the (128, g*C') block-diag
    weight keeps the MXU fully dense — no K-padding junk;
  * the ds2 stride-2 row subsample merges row pairs into lanes (a
    sublane->lane cast at a 128-multiple) and keeps the even row as an
    aligned lane slice; the w subsample falls out of the pw2 view the
    same way (even pixel = first 128-aligned half of each 256-lane
    output group);
  * input rows are DMA'd in 8-row-aligned super-windows (one synchronous
    copy per grid step — a double-buffered prefetch variant measured
    slower).

Intermediates live in VMEM; HBM traffic is one dense read of the input
and one dense write of the (N, H/2, W/2, 128) output. BatchNorm is
inference-mode, pre-folded into the conv kernels and biases.

The caller passes the input as the packed view (N, H, W*C1) — see
:func:`fused_ds1_ds2` for why (XLA's NHWC buffer is lane-padded and
cannot be DMA-sliced).

Counterpart of the reference's plain TF conv stack (SURVEY.md §2
"Backbone: MobileNet" row) — the reference has no analog; this is the
TPU-native answer to its implicit reliance on cuDNN/TF fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # output rows (stride-8 grid rows at the ds2 output) per grid step


# --------------------------------------------------------------------- params

def fold_convbn(params: dict, eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Fold a ConvBN block's BN into (scaled_kernel, bias).

    ``params`` is the flax subtree {"conv": {"kernel"}, "bn": {...}} with
    batch_stats merged in as {"bn": {"mean", "var"}} by the caller.
    """
    k = np.asarray(params["conv"]["kernel"], np.float32)
    bn = params["bn"]
    scale = np.asarray(bn["scale"], np.float32)
    bias = np.asarray(bn["bias"], np.float32)
    mean = np.asarray(bn["mean"], np.float32)
    var = np.asarray(bn["var"], np.float32)
    s = scale / np.sqrt(var + eps)
    return k * s, bias - mean * s


def _block_diag(w: np.ndarray, groups: int) -> np.ndarray:
    """(C, C') -> (g*C, g*C') block-diagonal matrix (g pixel groups)."""
    c, co = w.shape
    out = np.zeros((groups * c, groups * co), np.float32)
    for i in range(groups):
        out[i * c:(i + 1) * c, i * co:(i + 1) * co] = w
    return out


def fold_early_params(variables: dict, eps: float, w_img: int = 320) -> dict:
    """Extract + fold ds1/ds2 params into packed-layout kernel operands."""
    p = variables["params"]["backbone"]
    b = variables.get("batch_stats", {}).get("backbone", {})

    def block(name, part):
        sub = {
            "conv": p[name][part]["conv"],
            "bn": {
                "scale": p[name][part]["bn"]["scale"],
                "bias": p[name][part]["bn"]["bias"],
                "mean": b[name][part]["bn"]["mean"],
                "var": b[name][part]["bn"]["var"],
            },
        }
        return fold_convbn(sub, eps)

    dw1_k, dw1_b = block("ds1", "depthwise")   # (3,3,1,C1), (C1,)
    pw1_k, pw1_b = block("ds1", "pointwise")   # (1,1,C1,C2), (C2,)
    dw2_k, dw2_b = block("ds2", "depthwise")   # (3,3,1,C2), (C2,)
    pw2_k, pw2_b = block("ds2", "pointwise")   # (1,1,C2,C3), (C3,)
    c1 = dw1_k.shape[3]
    c2 = pw1_k.shape[3]
    c3 = pw2_k.shape[3]
    assert 128 % c1 == 0 and 128 % c2 == 0, (c1, c2)
    g1, g2 = 128 // c1, 128 // c2

    # dw taps as W-tiled lane vectors; pw as pixel-grouped block
    # diagonals. f32 everywhere: bf16's (16, 128) tile would make the
    # kernel's 8-row-aligned windows and +-1-row taps tile-MISaligned
    # (measured 30% slower than f32 despite half the traffic)
    return {
        "c1": c1, "c2": c2, "c3": c3,
        "dw1_k": jnp.asarray(
            np.tile(dw1_k.reshape(3, 3, c1), (1, 1, w_img)), jnp.float32),
        "dw1_b": jnp.asarray(np.tile(dw1_b, w_img), jnp.float32),
        "pw1_k": jnp.asarray(
            _block_diag(pw1_k.reshape(c1, c2), g1), jnp.float32),
        "pw1_b": jnp.asarray(np.tile(pw1_b, g1), jnp.float32),
        "dw2_k": jnp.asarray(
            np.tile(dw2_k.reshape(3, 3, c2), (1, 1, w_img)), jnp.float32),
        "dw2_b": jnp.asarray(np.tile(dw2_b, w_img), jnp.float32),
        "pw2_k": jnp.asarray(
            _block_diag(pw2_k.reshape(c2, c3), g2), jnp.float32),
        "pw2_b": jnp.asarray(np.tile(pw2_b, g2), jnp.float32),
    }


# --------------------------------------------------------------------- kernel

def _shift_packed(x, lanes: int):
    """Shift a (R, W*C) packed block left by ``lanes`` with zero fill.

    A left shift by C*dx reads pixel w+dx of every row; the zero fill is
    exactly the SAME-padding column at the image edge (shifts never wrap
    between rows because each (W*C,) vector is one image row).
    """
    if lanes == 0:
        return x
    r, wc = x.shape
    zeros = jnp.zeros((r, abs(lanes)), x.dtype)
    if lanes > 0:
        return jnp.concatenate([x[:, lanes:], zeros], axis=1)
    return jnp.concatenate([zeros, x[:, :lanes]], axis=1)


def _dw3x3_packed(x, k, b, c: int, dy_offset: int, out_rows: int,
                  dxs=(-1, 0, 1), row_stride: int = 1):
    """Packed depthwise 3x3 + bias + relu6 over rows with halo.

    ``k`` is the (3, 3, W*C) tiled tap table, ``b`` the (W*C,) bias. Row
    ``i`` of the output corresponds to input row ``i*row_stride +
    dy_offset``. The dx shifts are applied to the WHOLE block first:
    Mosaic cannot concat a lane-offset slice (the zero-filled shift)
    with fresh operands, so shifting a row slice is illegal — shifting
    the full block then row-slicing is fine (and does each shift once).
    """
    shifted = [_shift_packed(x, c * dx) for dx in dxs]
    if row_stride == 1:
        acc = None
        for dy in range(3):
            lo = dy + dy_offset - 1
            for dx_i in range(3):
                tap = shifted[dx_i][lo:lo + out_rows] * k[dy, dx_i]
                acc = tap if acc is None else acc + tap
        return jnp.minimum(jnp.maximum(acc + b, 0.0), 6.0)
    # stride-2 rows: single-row picks would waste 7/8 of every VREG (a
    # (1, W*C) op occupies one sublane), so compute ALL 2*out_rows rows
    # densely, merge row pairs into lanes — a sublane->lane cast, legal
    # at 128-multiples — and keep the even row as an aligned lane slice.
    assert row_stride == 2
    wc = x.shape[1]
    acc = None
    for dy in range(3):
        lo = dy + dy_offset - 1
        for dx_i in range(3):
            tap = shifted[dx_i][lo:lo + 2 * out_rows] * k[dy, dx_i]
            acc = tap if acc is None else acc + tap
    acc = jnp.minimum(jnp.maximum(acc + b, 0.0), 6.0)  # (2*out_rows, W*C)
    return acc.reshape(out_rows, 2 * wc)[:, :wc]


def _kernel(x_hbm, dw1_k, dw1_b, pw1_k, pw1_b, dw2_k, dw2_b, pw2_k, pw2_b,
            out_ref, x_vmem, sem, *, h: int, w: int, c1: int,
            c2: int, c3: int):
    """One grid step: RB output rows at the stride-8 grid for one image."""
    ni = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    r0 = b * 2 * RB  # first ds2-input row (stride-4 grid) of this block
    wc1 = w * c1

    # ---- DMA of the 8-aligned input row super-window -------------------
    # DMA row slices must be 8-row (sublane-tile) aligned in offset and
    # size, so each block copies the aligned super-window [r0-8, r0+24)
    # (32 rows) into scratch: scratch row t <-> global row r0 - 8 + t,
    # i.e. the first needed row (r0-1) sits at row 7. Out-of-image rows
    # (top 8 of block 0, bottom 8 of the last block) are zeroed — the
    # zero rows double as SAME padding. (A double-buffered variant that
    # prefetches block b+1 during b's compute was measured SLOWER —
    # 11.5 vs 10.5 ms in the micro harness — the extra copies/branches
    # cost more than the latency they hide; see BENCHMARKS.md.)
    def copy_rows(src_lo, dst, nrows):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(ni, 1), pl.ds(pl.multiple_of(src_lo, 8), nrows)],
            x_vmem.at[pl.ds(0, 1), pl.ds(dst, nrows)],
            sem,
        )
        cp.start()
        cp.wait()

    @pl.when(b == 0)
    def _():
        x_vmem[0, 0:8] = jnp.zeros((8, wc1), x_vmem.dtype)
        copy_rows(0, 8, 24)

    @pl.when(jnp.logical_and(b > 0, b < nb - 1))
    def _():
        copy_rows(r0 - 8, 0, 32)

    @pl.when(b == nb - 1)
    def _():
        x_vmem[0, 24:32] = jnp.zeros((8, wc1), x_vmem.dtype)
        copy_rows(r0 - 8, 0, 24)

    # (32, W*C1), row t <-> global row r0 - 8 + t
    x = x_vmem[0].astype(jnp.float32)

    # ---- ds1 over rows [r0, r0+2RB+2): dw + relu6, pw + relu6 ----------
    # (+2 halo: dw2's dense stride-2 form consumes one extra odd row
    # whose result is discarded by the row-pair lane merge)
    n_mid = 2 * RB + 2
    y = _dw3x3_packed(x, dw1_k[:], dw1_b[:], c1, dy_offset=8,
                      out_rows=n_mid)
    g1 = 128 // c1
    y = jnp.dot(y.reshape(n_mid * w // g1, 128), pw1_k[:],
                preferred_element_type=jnp.float32)
    y = jnp.minimum(jnp.maximum(y + pw1_b[:], 0.0), 6.0)
    y = y.reshape(n_mid, w * c2)

    # dw2's bottom halo rows can lie past the image (global row >= h);
    # the biased relu6 made them nonzero, but SAME padding needs zeros.
    # Arithmetic mask (clip(h - row, 0, 1)) instead of compare+select:
    # Mosaic rejects i1/bf16 mixes here ("changeBitwidth when minor
    # tiling is not 128"); rows are integers so the clip is exact.
    rowf = jax.lax.broadcasted_iota(
        jnp.int32, y.shape, 0).astype(jnp.float32)
    mask = jnp.clip(jnp.float32(h) - jnp.float32(r0) - rowf, 0.0, 1.0)
    y = y * mask

    # ---- ds2: dw s2 (SAME pad 0/1) + relu6, pw + relu6, even-w keep ----
    z = _dw3x3_packed(y, dw2_k[:], dw2_b[:], c2, dy_offset=1,
                      out_rows=RB, dxs=(0, 1, 2), row_stride=2)
    # (RB, W*C2): out row i taps y rows 2i+dy, all W pixels computed
    g2 = 128 // c2
    z = jnp.dot(z.reshape(RB * w // g2, 128), pw2_k[:],
                preferred_element_type=jnp.float32)
    z = jnp.minimum(jnp.maximum(z + pw2_b[:], 0.0), 6.0)
    # (RB*W/g2, g2*C3) -> (RB, W/2, 2*C3) -> even pixel = first C3 lanes
    z = z.reshape(RB, w // 2, 2 * c3)[:, :, :c3]
    out_ref[0] = z.astype(out_ref.dtype)


def fused_ds1_ds2(x: jnp.ndarray, folded: dict,
                  interpret: bool = False) -> jnp.ndarray:
    """(N, H, W, C1) bf16 -> (N, H/2, W/2, C3) bf16, ds1+ds2 in one pass.

    The input is reshaped to (N, H, W*C1) before entering the kernel:
    XLA stores a 32-channel NHWC array with its lanes padded to 128 (4x
    HBM bloat) and Mosaic cannot DMA lane-unaligned slices of it; the
    packed view is dense and tile-aligned. (XLA pays one relayout pass
    for the reshape — see BENCHMARKS.md for the honest accounting.)
    """
    n, h, w, c1 = x.shape
    c2, c3 = folded["c2"], folded["c3"]
    assert c1 == folded["c1"], (c1, folded["c1"])
    assert h % (2 * RB) == 0 and w % 2 == 0, (h, w)
    assert folded["dw1_k"].shape[2] == w * c1, "fold with w_img=W"
    nb = h // (2 * RB)
    assert nb >= 2, "kernel needs at least two row blocks"

    xp = x.reshape(n, h, w * c1)
    kernel = functools.partial(_kernel, h=h, w=w, c1=c1, c2=c2, c3=c3)
    return pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(
            (1, RB, w // 2, c3),
            lambda i, b: (i, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c3), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((1, 32, w * c1), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, folded["dw1_k"], folded["dw1_b"], folded["pw1_k"], folded["pw1_b"],
      folded["dw2_k"], folded["dw2_b"], folded["pw2_k"], folded["pw2_b"])
