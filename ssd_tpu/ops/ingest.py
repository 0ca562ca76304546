"""TPU-native ingest: space-to-depth packing in the input pipeline.

The int8 dense4 stem consumes the image as a space-to-depth(4)-packed,
-128-shifted s8 tensor ``(N, H/4, W/4, 48)``. Packing ON DEVICE costs a
one-hot pack conv (~0.65 ms at b32/640) plus a raw-image relayout copy
(~0.58 ms) that ``device_put`` cannot write directly (the runtime refuses
the stem conv's preferred tiling — see :mod:`ssd_tpu.utils.layout`).
Packing in the PIPELINE deletes both from the serve program: the bytes
transferred are identical (48-channel u8/s8 is the same 3 B/pixel), the
math is bit-identical (pure relabeling + the exact u8^0x80 == u8-128
shift), and the host cost rides the loader's thread pool where it
overlaps decode/resize — the MLPerf-ResNet space-to-depth-in-the-
pipeline move, applied to detection serving.

The reference has no analog (its TF graph ingests raw NHWC uint8 and
pays the format conversions in-graph every step; SURVEY.md §2 "Input
pipeline" row): this module exists because TPU ingest should deliver
what the MXU wants, not what the camera produced.

``pack_s2d`` (numpy, host pipeline) and ``pack_s2d_jax`` (tracing twin
for tests/on-device fallbacks) are exact inverses of nothing — the
packing is a bijection; ``unpack_s2d`` restores the raw image for
round-trip tests.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

PACK_BLOCK = 4
PACK_CHANNELS = 48  # 4 * 4 * RGB


def packed_shape(image_hw, batch: int | None = None):
    """Static packed shape for a raw ``(H, W)`` image size."""
    h, w = image_hw
    s = (h // PACK_BLOCK, w // PACK_BLOCK, PACK_CHANNELS)
    return s if batch is None else (batch, *s)


def pack_s2d(images_uint8: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, H/4, W/4, 48) int8, shifted by -128.

    Channel ``(4*dy + dx)*3 + c`` holds pixel ``(dy, dx)`` channel ``c``
    of each 4x4 block — the exact layout of the on-device pack conv
    (models/mobilenet._s2d_pack_kernel), so results are bit-identical.
    The -128 shift is the u8 XOR 0x80 bit trick (exact for all 256
    values), done here so the device program starts from MXU-ready s8.
    """
    x = np.ascontiguousarray(images_uint8)
    n, h, w, c = x.shape
    if c != 3 or h % PACK_BLOCK or w % PACK_BLOCK:
        raise ValueError(f"pack_s2d expects (N, 4k, 4k, 3) uint8, got {x.shape}")
    x = x.reshape(n, h // 4, 4, w // 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, h // 4, w // 4, PACK_CHANNELS)
    return (x ^ np.uint8(0x80)).view(np.int8)


def pack_s2d_jax(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """Tracing twin of :func:`pack_s2d` (same values, jnp)."""
    from ssd_tpu.models.layers import space_to_depth
    x = space_to_depth(images_uint8, PACK_BLOCK)
    return jnp.asarray(x ^ jnp.uint8(0x80)).view(jnp.int8)


def unpack_s2d(packed_int8: np.ndarray) -> np.ndarray:
    """(N, H/4, W/4, 48) int8 -> (N, H, W, 3) uint8 (exact inverse)."""
    x = np.ascontiguousarray(packed_int8).view(np.uint8) ^ np.uint8(0x80)
    n, ph, pw, _ = x.shape
    x = x.reshape(n, ph, pw, 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, ph * 4, pw * 4, 3)
