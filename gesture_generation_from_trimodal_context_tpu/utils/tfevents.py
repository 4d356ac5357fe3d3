"""Native TensorBoard event-file writer, dependency-free.

The reference logs scalars with torch's SummaryWriter (reference
scripts/train.py:73-74,120,209-211).  Importing torch.utils.tensorboard
pulls in the tensorboard package, which imports TensorFlow when present
— and TF then tries to claim the TPU and deadlocks against JAX (this
box, see CLAUDE.md).  This module writes the tfevents format directly:

- TFRecord framing: little-endian uint64 length, masked crc32c of the
  length bytes, payload, masked crc32c of the payload
  (tensorflow/core/lib/io/record_writer.cc).
- Payload: an Event protobuf (tensorflow/core/util/event.proto) with
  wall_time (field 1, double), step (field 2, varint),
  file_version (field 3, string — "brain.Event:2" in the first record)
  or summary (field 5).  Summary (summary.proto) holds repeated Value
  (field 1); Value holds tag (field 1, string) and simple_value
  (field 2, float32).

Only the scalar subset is implemented — exactly what the epoch driver
logs.  Files land as events.out.tfevents.<ts>.<host> and load in stock
TensorBoard.
"""

import os
import socket
import struct
import time

# CRC32C (Castagnoli), table-driven; validated against the standard
# test vector crc32c(b"123456789") == 0x_E3069283 in the tests
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 * (_c & 1))
    _CRC_TABLE.append(_c)


def crc32c(data):
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


def _varint(n):
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _key(field, wire_type):
    return _varint((field << 3) | wire_type)


def _len_delim(field, payload):
    return _key(field, 2) + _varint(len(payload)) + payload


def _scalar_summary(tag, value):
    tag_b = tag.encode("utf-8")
    val = (_len_delim(1, tag_b)                       # Value.tag
           + _key(2, 5) + struct.pack("<f", value))   # Value.simple_value
    return _len_delim(1, val)                         # Summary.value


def _event(wall_time, step=None, file_version=None, summary=None):
    ev = _key(1, 1) + struct.pack("<d", wall_time)    # Event.wall_time
    if step is not None:
        ev += _key(2, 0) + _varint(step)              # Event.step
    if file_version is not None:
        ev += _len_delim(3, file_version.encode())    # Event.file_version
    if summary is not None:
        ev += _len_delim(5, summary)                  # Event.summary
    return ev


def _record(payload):
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


class TFEventsWriter:
    """Append-only scalar event file (one per instance)."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        name = "events.out.tfevents.%010d.%s" % (
            time.time(), socket.gethostname())
        self._f = open(os.path.join(log_dir, name), "ab")
        self._f.write(_record(_event(time.time(),
                                     file_version="brain.Event:2")))

    def add_scalar(self, tag, value, step):
        self._f.write(_record(_event(
            time.time(), step=int(step),
            summary=_scalar_summary(tag, float(value)))))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.flush()
        self._f.close()
