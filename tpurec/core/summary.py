"""TensorBoard scalar summary writer (hand-rolled Event protobuf).

Replaces the reference's ``tf.summary`` scalar streams
(2.FM/ModelManager.py:197-199, 263-265). Writes standard
``events.out.tfevents.*`` files — TFRecord-framed ``Event`` protos with
``Summary.Value{tag, simple_value}`` — readable by stock TensorBoard, with no
TF dependency (reuses tpurec.data's framing + varint machinery).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

from tpurec.data.example_proto import _write_len_delim, _write_tag, _write_varint
from tpurec.data.recordio import frame_record


def _encode_event(
    wall_time: float,
    step: int = 0,
    file_version: Optional[str] = None,
    tag: Optional[str] = None,
    simple_value: Optional[float] = None,
) -> bytes:
    # Event { double wall_time=1; int64 step=2; string file_version=3; Summary summary=5; }
    out = bytearray()
    _write_tag(out, 1, 1)
    out += struct.pack("<d", wall_time)
    if step:
        _write_tag(out, 2, 0)
        _write_varint(out, step & 0xFFFFFFFFFFFFFFFF)
    if file_version is not None:
        _write_len_delim(out, 3, file_version.encode("utf-8"))
    if tag is not None:
        # Summary { repeated Value value=1; }; Value { string tag=1; float simple_value=2; }
        value = bytearray()
        _write_len_delim(value, 1, tag.encode("utf-8"))
        _write_tag(value, 2, 5)
        value += struct.pack("<f", float(simple_value))
        summary = bytearray()
        _write_len_delim(summary, 1, bytes(value))
        _write_len_delim(out, 5, bytes(summary))
    return bytes(out)


class SummaryWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._f = open(os.path.join(logdir, fname), "wb")
        self._f.write(
            frame_record(_encode_event(time.time(), file_version="brain.Event:2"))
        )

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            frame_record(
                _encode_event(time.time(), step=step, tag=tag, simple_value=value)
            )
        )

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NullSummaryWriter:
    """No-op writer used when no tensorboard_dir is configured."""

    def scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass
