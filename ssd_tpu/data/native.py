"""ctypes bindings for the native C++ loader (native/loader.cc).

Auto-builds ``libssd_loader.so`` on first use if a toolchain is present;
falls back to PIL for decode and the pure-Python crc32c otherwise, so the
framework stays importable everywhere. ctypes foreign calls release the GIL,
so the batch decoder's C++ thread pool gets real parallelism.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libssd_loader.so"))

_lib = None
_lib_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ssd_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.ssd_decode_jpeg.restype = ctypes.c_int
    lib.ssd_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ssd_jpeg_dims.restype = ctypes.c_int
    lib.ssd_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ssd_decode_batch.restype = ctypes.c_int
    lib.ssd_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.ssd_crc32c.restype = ctypes.c_uint32
    lib.ssd_resize.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.ssd_resize.restype = ctypes.c_int
    if hasattr(lib, "ssd_pack_s2d"):  # stale .so builds lack it
        lib.ssd_pack_s2d.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ssd_pack_s2d.restype = ctypes.c_int
    if hasattr(lib, "ssd_tfrecord_index"):  # stale .so builds lack it
        lib.ssd_tfrecord_index.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.ssd_tfrecord_index.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(data: bytes) -> tuple[int, int]:
    lib = _load()
    if lib is not None:
        h, w = ctypes.c_int(), ctypes.c_int()
        if lib.ssd_jpeg_dims(data, len(data), ctypes.byref(h),
                             ctypes.byref(w)) == 0:
            return h.value, w.value
    from io import BytesIO
    from PIL import Image
    im = Image.open(BytesIO(data))
    return im.height, im.width


def decode_jpeg(data: bytes, out_h: int = 0, out_w: int = 0) -> np.ndarray:
    """JPEG bytes -> uint8 RGB (out_h, out_w, 3); native size if 0."""
    lib = _load()
    if lib is not None:
        if out_h <= 0:
            out_h, out_w = jpeg_dims(data)
        out = np.empty((out_h, out_w, 3), np.uint8)
        rc = lib.ssd_decode_jpeg(
            data, len(data), out.ctypes.data_as(ctypes.c_void_p), out_h, out_w
        )
        if rc == 0:
            return out
    return _decode_pil(data, out_h, out_w)


def _decode_pil(data: bytes, out_h: int, out_w: int) -> np.ndarray:
    from io import BytesIO
    from PIL import Image
    im = Image.open(BytesIO(data)).convert("RGB")
    if out_h > 0 and (im.height, im.width) != (out_h, out_w):
        im = im.resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(im, np.uint8)


def decode_jpeg_batch(datas: list[bytes], out_h: int, out_w: int,
                      n_threads: int = 8) -> np.ndarray:
    """Parallel batch decode -> uint8 (N, out_h, out_w, 3)."""
    n = len(datas)
    lib = _load()
    if lib is None:
        return np.stack([_decode_pil(d, out_h, out_w) for d in datas])
    blob = b"".join(datas)
    offsets = np.zeros(n, np.uint64)
    lens = np.asarray([len(d) for d in datas], np.uint64)
    np.cumsum(lens[:-1], out=offsets[1:])
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    failures = lib.ssd_decode_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, out.ctypes.data_as(ctypes.c_void_p), out_h, out_w, n_threads,
    )
    if failures:
        # failed slots were zeroed by the library; retry them via PIL
        for i, d in enumerate(datas):
            if not out[i].any():
                try:
                    out[i] = _decode_pil(d, out_h, out_w)
                except Exception:
                    pass
    return out


def resize(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear uint8 RGB resize via the native library (PIL fallback)."""
    if image.shape[0] == out_h and image.shape[1] == out_w:
        return image
    lib = _load()
    if lib is not None:
        src = np.ascontiguousarray(image, np.uint8)
        out = np.empty((out_h, out_w, 3), np.uint8)
        rc = lib.ssd_resize(
            src.ctypes.data_as(ctypes.c_void_p), src.shape[0], src.shape[1],
            out.ctypes.data_as(ctypes.c_void_p), out_h, out_w,
        )
        if rc == 0:
            return out
    from PIL import Image
    return np.asarray(
        Image.fromarray(image).resize((out_w, out_h), Image.BILINEAR), np.uint8
    )


def pack_s2d(images: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, H/4, W/4, 48) int8 ingest pack (the
    space-to-depth(4) + exact -128 shift the int8 dense4 stem consumes —
    ssd_tpu/ops/ingest.py). C++ threaded kernel; numpy fallback."""
    lib = _load()
    if lib is not None and hasattr(lib, "ssd_pack_s2d"):
        src = np.ascontiguousarray(images, np.uint8)
        n, h, w, c = src.shape
        if c == 3 and h % 4 == 0 and w % 4 == 0:
            out = np.empty((n, h // 4, w // 4, 48), np.int8)
            rc = lib.ssd_pack_s2d(
                src.ctypes.data_as(ctypes.c_void_p), n, h, w,
                out.ctypes.data_as(ctypes.c_void_p), n_threads,
            )
            if rc == 0:
                return out
    from ssd_tpu.ops.ingest import pack_s2d as np_pack
    return np_pack(images)


def crc32c(data: bytes) -> int:
    lib = _load()
    if lib is not None:
        return int(lib.ssd_crc32c(data, len(data)))
    from ssd_tpu.data.tfrecord import crc32c as py_crc
    return py_crc(data)


def tfrecord_index(path: str) -> list[tuple[int, int]] | None:
    """Native TFRecord shard index: (payload offset, length) per record.

    Header CRCs are verified in C++ with the GIL released; a truncated
    tail stops cleanly. Returns None when the native lib is unavailable
    (caller falls back to the Python walker); raises ``IOError`` for a
    non-TFRecord file, with the same message as the Python path.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "ssd_tfrecord_index"):
        return None
    size = os.path.getsize(path)
    # Start from a typical-record-size guess and grow on -3 (cap too
    # small) rather than allocating the worst case up front — size//16
    # entries would cost ~file-size bytes of index for a big shard.
    hard_cap = size // 16 + 1  # a record is >= 16 bytes: always enough
    cap = min(max(size // 4096 + 16, 1024), hard_cap)
    while True:
        offsets = np.empty(cap, np.uint64)
        lengths = np.empty(cap, np.uint64)
        bad = ctypes.c_uint64(0)
        n = lib.ssd_tfrecord_index(
            path.encode(),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cap, ctypes.byref(bad))
        if n != -3:
            break
        cap = min(cap * 4, hard_cap)
    if n == -1:
        raise IOError(
            f"{path}: not a TFRecord file (header CRC mismatch at "
            f"offset {bad.value}). Is the file pattern matching "
            "non-tfrecord files (e.g. the *-label_map.json / "
            "*-category_ids.json sidecars)? Use a pattern like "
            "'<prefix>-*-of-*'."
        )
    if n < 0:
        return None  # IO error — let the Python path produce the message
    return [(int(offsets[i]), int(lengths[i])) for i in range(n)]
