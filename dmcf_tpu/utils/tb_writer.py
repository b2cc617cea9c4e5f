"""Minimal TensorBoard event-file writer — no TensorFlow dependency.

The reference logs scalars via ``tf.summary`` (base_pipeline.py:137-153).
flax's SummaryWriter wraps the same TF machinery, and on this stack every
``scalar()`` call costs ~0.4 s (TF's summary path re-probes the device
platform per op), which dominated the training loop: the compiled train
step is ~4 ms, so 8 scalars every 10 steps held the pipeline to ~2.3
steps/s.  TensorBoard's on-disk format needs none of that: an events file
is a sequence of length-prefixed, CRC32C-masked records of serialized
``Event`` protos.  This module hand-encodes exactly the two messages we
emit (scalar and text summaries) with the protobuf wire format — the same
approach as data/gns_converter.py's TF-free tfrecord parser, in reverse.

Wire schema (tensorboard/compat/proto/event.proto):
  Event:   wall_time = 1 (double), step = 2 (int64), summary = 5 (message)
  Summary: value = 1 (repeated message)
  Summary.Value: tag = 1 (string), simple_value = 2 (float),
                 tensor = 8 (message, used for text)
  TensorProto: dtype = 1 (enum, DT_STRING = 7), string_val = 8 (bytes)
  Record framing (tensorflow record format): u64-LE length, masked-crc32c
  of the length bytes, payload, masked-crc32c of the payload.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven — TB requires the masked variant.

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = np.uint32(0xFFFFFFFF)
    arr = np.frombuffer(data, np.uint8)
    for b in arr:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire encoding helpers

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int) -> bytes:
    return _varint(num << 3 | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _int64(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _event(step: int, summary: bytes) -> bytes:
    return (_double(1, time.time()) + _int64(2, int(step)) +
            _len_delim(5, summary))


class TBEventWriter:
    """Append-only scalar/text writer producing TensorBoard events files."""

    def __init__(self, directory):
        os.makedirs(directory, exist_ok=True)
        fname = "events.out.tfevents.%d.%s.%d.v2" % (
            int(time.time()), socket.gethostname(), os.getpid())
        self._f = open(os.path.join(directory, fname), "ab")
        self._lock = threading.Lock()
        # file-version header event, as TF writes it
        self._write(_double(1, time.time()) +
                    _len_delim(3, b"brain.Event:2"))

    def _write(self, event: bytes):
        header = struct.pack("<Q", len(event))
        rec = (header + struct.pack("<I", _masked_crc(header)) + event +
               struct.pack("<I", _masked_crc(event)))
        with self._lock:
            self._f.write(rec)

    def scalar(self, tag, value, step):
        val = _len_delim(1, tag.encode()) + _float(2, float(value))
        self._write(_event(step, _len_delim(1, val)))

    def text(self, tag, text, step=0):
        tensor = _varint(1 << 3) + _varint(7) + \
            _len_delim(8, str(text).encode())
        # tensorboard's text plugin finds text via the plugin_data name
        plugin = _len_delim(1, _len_delim(1, b"text"))
        val = (_len_delim(1, tag.encode()) + _len_delim(8, tensor) +
               _len_delim(9, plugin))
        self._write(_event(step, _len_delim(1, val)))

    def flush(self):
        with self._lock:
            self._f.flush()

    def close(self):
        with self._lock:
            self._f.close()
