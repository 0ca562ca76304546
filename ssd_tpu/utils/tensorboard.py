"""Pure-Python TensorBoard scalar writer (tfevents wire format).

The reference logs training scalars through ``tf.summary`` for TensorBoard
(SURVEY.md §5 "Metrics / logging" row). This environment's tensorboard
wheel is ABI-broken (see utils/trace_tools.py), so instead of importing it
we write the ``events.out.tfevents.*`` files directly:

  * record framing is IDENTICAL to TFRecord — ``uint64 len | crc(len) |
    payload | crc(payload)`` with masked crc32c — so we reuse
    ``data/tfrecord.RecordWriter`` verbatim;
  * the payload is an ``Event`` protobuf (tensorflow/core/util/event.proto),
    hand-encoded with the same varint helpers ``tfrecord.py`` uses for
    ``tf.train.Example``. Only the scalar subset is implemented:

      Event:  double wall_time = 1; int64 step = 2;
              oneof what { string file_version = 3; Summary summary = 5; }
      Summary: repeated Value value = 1
      Summary.Value: string tag = 1; float simple_value = 2;

Any stock TensorBoard install reads the output ("brain.Event:2" format,
unchanged since TF 1.x). ``read_scalars`` parses the files back for tests
and offline analysis without TensorBoard.
"""

from __future__ import annotations

import os
import socket
import struct
import time

from ssd_tpu.data.tfrecord import (RecordWriter, _field, _len_delim,
                                   _read_varint, _varint, read_records)


def _encode_event(wall_time: float, step: int | None = None,
                  file_version: str | None = None,
                  scalars: dict[str, float] | None = None) -> bytes:
    out = _field(1, 1) + struct.pack("<d", wall_time)
    if step is not None:
        out += _field(2, 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
    if file_version is not None:
        out += _len_delim(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _len_delim(1, _len_delim(1, tag.encode())
                       + _field(2, 5) + struct.pack("<f", float(val)))
            for tag, val in scalars.items())
        out += _len_delim(5, summary)
    return out


class SummaryWriter:
    """Minimal ``tf.summary``-style scalar writer.

    >>> w = SummaryWriter(logdir)
    >>> w.add_scalar("loss", 0.5, step=100)
    >>> w.add_scalars({"loss": 0.5, "lr": 1e-3}, step=100)  # one Event
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}.{os.getpid()}")
        self.path = os.path.join(logdir, name)
        self._writer = RecordWriter(self.path)
        self._writer.write(_encode_event(time.time(),
                                         file_version="brain.Event:2"))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.add_scalars({tag: value}, step)

    def add_scalars(self, scalars: dict[str, float], step: int) -> None:
        self._writer.write(_encode_event(time.time(), step=step,
                                         scalars=scalars))

    def flush(self) -> None:
        self._writer._f.flush()

    def close(self) -> None:
        self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_scalars(path: str) -> list[tuple[int, str, float]]:
    """Parse a tfevents file back into ``(step, tag, value)`` rows."""
    rows = []
    for payload in read_records(path, verify_crc=True):
        pos, end = 0, len(payload)
        step = 0
        values: list[tuple[str, float]] = []
        while pos < end:
            tag_wire, pos = _read_varint(payload, pos)
            num, wire = tag_wire >> 3, tag_wire & 7
            if wire == 0:
                val, pos = _read_varint(payload, pos)
                if num == 2:
                    step = val
            elif wire == 1:
                pos += 8
            elif wire == 5:
                pos += 4
            elif wire == 2:
                ln, pos = _read_varint(payload, pos)
                chunk = payload[pos:pos + ln]
                pos += ln
                if num == 5:  # Summary
                    values.extend(_parse_summary(chunk))
            else:  # pragma: no cover
                raise ValueError(f"unsupported wire type {wire}")
        rows.extend((step, tag, val) for tag, val in values)
    return rows


def _parse_summary(buf: bytes) -> list[tuple[str, float]]:
    out = []
    pos, end = 0, len(buf)
    while pos < end:
        tag_wire, pos = _read_varint(buf, pos)
        if tag_wire >> 3 == 1 and tag_wire & 7 == 2:  # Value
            ln, pos = _read_varint(buf, pos)
            v, vpos, vend = buf[pos:pos + ln], 0, ln
            pos += ln
            tag, val = "", float("nan")
            while vpos < vend:
                tw, vpos = _read_varint(v, vpos)
                num, wire = tw >> 3, tw & 7
                if num == 1 and wire == 2:
                    ln2, vpos = _read_varint(v, vpos)
                    tag = v[vpos:vpos + ln2].decode()
                    vpos += ln2
                elif num == 2 and wire == 5:
                    (val,) = struct.unpack("<f", v[vpos:vpos + 4])
                    vpos += 4
                elif wire == 0:
                    _, vpos = _read_varint(v, vpos)
                elif wire == 1:
                    vpos += 8
                elif wire == 5:
                    vpos += 4
                elif wire == 2:
                    ln2, vpos = _read_varint(v, vpos)
                    vpos += ln2
            out.append((tag, val))
        else:  # skip unknown field
            wire = tag_wire & 7
            if wire == 0:
                _, pos = _read_varint(buf, pos)
            elif wire == 1:
                pos += 8
            elif wire == 5:
                pos += 4
            elif wire == 2:
                ln, pos = _read_varint(buf, pos)
                pos += ln
    return out
