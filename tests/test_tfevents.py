"""utils/tfevents.py: the dependency-free TensorBoard event-file writer.

Validated WITHOUT importing tensorboard (which imports TensorFlow when
present — a TPU-claiming hazard on this box): the CRC32C core is pinned
to the standard test vector, and the emitted file is decoded by an
independent minimal TFRecord/protobuf reader written from the format
spec (tensorflow/core/lib/io/record_writer.cc, event.proto,
summary.proto)."""

import struct

import pytest

from gesture_generation_from_trimodal_context_tpu.utils import tfevents
from gesture_generation_from_trimodal_context_tpu.utils.tb import (
    MetricWriter)


def test_crc32c_standard_vector():
    # RFC 3720 / the universal CRC32C check value
    assert tfevents.crc32c(b"123456789") == 0xE3069283
    assert tfevents.crc32c(b"") == 0


def _read_records(path):
    """Independent TFRecord reader: verifies both masked CRCs."""
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert tfevents._masked_crc(data[off:off + 8]) == len_crc
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert tfevents._masked_crc(payload) == crc
        records.append(payload)
        off += 12 + length + 4
    return records


def _read_varint(buf, off):
    val = shift = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _parse_fields(buf):
    """Minimal proto wire-format parse -> {field: [values]}."""
    out = {}
    off = 0
    while off < len(buf):
        key, off = _read_varint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, off = _read_varint(buf, off)
        elif wire == 1:
            (val,) = struct.unpack_from("<d", buf, off)
            off += 8
        elif wire == 5:
            (val,) = struct.unpack_from("<f", buf, off)
            off += 4
        elif wire == 2:
            n, off = _read_varint(buf, off)
            val = buf[off:off + n]
            off += n
        else:
            raise AssertionError("wire type %d" % wire)
        out.setdefault(field, []).append(val)
    return out


def test_event_file_round_trip(tmp_path):
    w = tfevents.TFEventsWriter(str(tmp_path))
    w.add_scalar("loss/train", 0.125, 7)
    w.add_scalar("frechet/validation", 3.5, 8)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(str(files[0]))
    assert len(records) == 3

    head = _parse_fields(records[0])
    assert head[3] == [b"brain.Event:2"]          # Event.file_version
    assert head[1][0] > 1.5e9                     # Event.wall_time sane

    ev = _parse_fields(records[1])
    assert ev[2] == [7]                           # Event.step
    summary = _parse_fields(ev[5][0])             # Event.summary
    value = _parse_fields(summary[1][0])          # Summary.value[0]
    assert value[1] == [b"loss/train"]            # Value.tag
    assert value[2][0] == pytest.approx(0.125)    # Value.simple_value

    ev2 = _parse_fields(records[2])
    v2 = _parse_fields(_parse_fields(ev2[5][0])[1][0])
    assert v2[1] == [b"frechet/validation"]
    assert v2[2][0] == pytest.approx(3.5)


def test_metric_writer_emits_both(tmp_path, monkeypatch):
    monkeypatch.delenv("GG_TENSORBOARD", raising=False)
    w = MetricWriter(str(tmp_path))
    w.add_scalar("loss", 1.0, 0)
    w.close()
    assert list(tmp_path.glob("events.out.tfevents.*"))
    assert (tmp_path / "metrics.jsonl").exists()


def test_metric_writer_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("GG_TENSORBOARD", "0")
    w = MetricWriter(str(tmp_path))
    w.add_scalar("loss", 1.0, 0)
    w.close()
    assert not list(tmp_path.glob("events.out.tfevents.*"))
    assert (tmp_path / "metrics.jsonl").exists()
