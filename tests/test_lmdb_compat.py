"""LMDB reader + legacy pyarrow decode tests against hand-built fixtures.

The LMDB fixture is a byte-level construction of a minimal valid
environment (meta pages, one leaf page, one overflow chain).  The legacy
pyarrow fixture replicates the 0.14 ``serialize`` layout (header + IPC
stream of list<dense_union> + aligned tensors) with modern pyarrow."""

import struct

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.data.lmdb_compat import (
    LMDBReader, legacy_arrow_deserialize)

PSIZE = 4096
PAGEHDRSZ = 16


def _page_header(pgno, flags, lower, upper):
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _meta_page(pgno, txnid, main_root, main_entries):
    hdr = _page_header(pgno, 0x08, 0, 0)  # P_META
    meta = struct.pack("<II", 0xBEEFC0DE, 1)          # magic, version
    meta += struct.pack("<QQ", 0, 10 * PSIZE)          # address, mapsize
    # FREE db: pad holds psize
    meta += struct.pack("<IHH", PSIZE, 0, 0) + struct.pack(
        "<QQQQQ", 0, 0, 0, 0, 0xFFFFFFFFFFFFFFFF)
    # MAIN db
    meta += struct.pack("<IHH", 0, 0, 1) + struct.pack(
        "<QQQQQ", 0, 1, 0, main_entries, main_root)
    meta += struct.pack("<QQ", 5, txnid)               # last_pg, txnid
    return (hdr + meta).ljust(PSIZE, b"\0")


def _leaf_node(key, value=None, bigdata_pgno=None, bigdata_size=None):
    if bigdata_pgno is not None:
        datasize = bigdata_size
        payload = key + struct.pack("<Q", bigdata_pgno)
        flags = 0x01  # F_BIGDATA
    else:
        datasize = len(value)
        payload = key + value
        flags = 0
    lo = datasize & 0xFFFF
    hi = (datasize >> 16) & 0xFFFF
    return struct.pack("<HHHH", lo, hi, flags, len(key)) + payload


def _leaf_page(pgno, nodes):
    # place nodes from the top of the page downward
    offsets = []
    blob = b""
    upper = PSIZE
    for node in nodes:
        upper -= len(node)
        upper &= ~1  # keep 2-byte alignment
        offsets.append(upper)
    lower = PAGEHDRSZ + 2 * len(nodes)
    page = bytearray(PSIZE)
    page[:PAGEHDRSZ] = _page_header(pgno, 0x02, lower, min(offsets))
    struct.pack_into("<%dH" % len(nodes), page, PAGEHDRSZ, *offsets)
    for off, node in zip(offsets, nodes):
        page[off:off + len(node)] = node
    return bytes(page)


def _overflow_pages(pgno, data):
    n_pages = -(-(len(data) + PAGEHDRSZ) // PSIZE)
    hdr = struct.pack("<QHHI", pgno, 0, 0x04, n_pages)  # P_OVERFLOW
    return (hdr + data).ljust(n_pages * PSIZE, b"\0")


@pytest.fixture
def lmdb_file(tmp_path):
    big_value = bytes(range(256)) * 40  # 10240 bytes -> 3 overflow pages
    nodes = [
        _leaf_node(b"akey", b"small-value"),
        _leaf_node(b"bigkey", bigdata_pgno=3, bigdata_size=len(big_value)),
    ]
    content = (_meta_page(0, txnid=1, main_root=2, main_entries=2)
               + _meta_page(1, txnid=2, main_root=2, main_entries=2)
               + _leaf_page(2, nodes)
               + _overflow_pages(3, big_value))
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(content)
    return str(d), big_value


def test_lmdb_reader(lmdb_file):
    path, big_value = lmdb_file
    r = LMDBReader(path)
    assert r.psize == PSIZE
    assert r.n_entries == 2
    items = dict(r.items())
    assert items[b"akey"] == b"small-value"
    assert items[b"bigkey"] == big_value
    r.close()


# ---------------------------------------------------------------------------

def _build_union(values, tensors):
    """Recursively encode python values as a dense union array with
    0.14-style child names (each nesting level gets its own union type,
    which the decoder handles because it dispatches on field names)."""
    import pyarrow as pa

    def kind_of(v):
        if isinstance(v, bool):
            return "bools"
        if isinstance(v, (int, np.integer)):
            return "ints"
        if isinstance(v, str):
            return "strings"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, (float, np.floating)):
            return "doubles"
        if isinstance(v, np.ndarray):
            return "ndarrays"
        if isinstance(v, list):
            return "lists"
        if isinstance(v, tuple):
            return "tuples"
        if isinstance(v, dict):
            return "dicts"
        raise TypeError(type(v))

    per, kinds, offsets = {}, [], []
    for v in values:
        k = kind_of(v)
        per.setdefault(k, []).append(v)
        offsets.append(len(per[k]) - 1)
        kinds.append(k)
    names = list(per.keys())

    def list_of_union(list_of_lists):
        flat = [x for sub in list_of_lists for x in sub]
        offs = [0]
        for sub in list_of_lists:
            offs.append(offs[-1] + len(sub))
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                        _build_union(flat, tensors))

    children = []
    for name in names:
        vals = per[name]
        if name == "bools":
            children.append(pa.array(vals, pa.bool_()))
        elif name == "ints":
            children.append(pa.array([int(v) for v in vals], pa.int64()))
        elif name == "strings":
            children.append(pa.array(vals, pa.string()))
        elif name == "bytes":
            children.append(pa.array(vals, pa.binary()))
        elif name == "doubles":
            children.append(pa.array([float(v) for v in vals],
                                     pa.float64()))
        elif name == "ndarrays":
            idxs = []
            for v in vals:
                tensors.append(v)
                idxs.append(len(tensors) - 1)
            children.append(pa.array(idxs, pa.int32()))
        elif name in ("lists", "tuples"):
            children.append(list_of_union([list(v) for v in vals]))
        elif name == "dicts":
            keys = list_of_union([list(d.keys()) for d in vals])
            vvals = list_of_union([list(d.values()) for d in vals])
            children.append(pa.StructArray.from_arrays(
                [keys, vvals], ["keys", "vals"]))
    type_codes = pa.array([names.index(k) for k in kinds], pa.int8())
    value_offsets = pa.array(offsets, pa.int32())
    return pa.UnionArray.from_dense(type_codes, value_offsets, children,
                                    names)


def _py_to_union_batch(obj):
    """Encode a python object the way pyarrow 0.14 did: one record batch
    whose single column is list<dense_union<...>> with one row."""
    import pyarrow as pa

    tensors = []
    union = _build_union([obj], tensors)
    col = pa.ListArray.from_arrays(pa.array([0, 1], pa.int32()), union)
    batch = pa.RecordBatch.from_arrays([col], ["list"])
    return batch, tensors


def _write_legacy_blob(obj):
    import io
    import pyarrow as pa

    batch, tensors = _py_to_union_batch(obj)
    out = io.BytesIO()
    out.write(struct.pack("<iii", len(tensors), 0, 0))
    while out.tell() % 8:
        out.write(b"\0")
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    out.write(sink.getvalue().to_pybytes())
    for t in tensors:
        while out.tell() % 64:
            out.write(b"\0")
        tsink = pa.BufferOutputStream()
        pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ascontiguousarray(t)),
                            tsink)
        out.write(tsink.getvalue().to_pybytes())
    return out.getvalue()


def test_legacy_arrow_roundtrip():
    skeleton = np.random.RandomState(0).randn(12, 10, 3).astype(np.float32)
    audio = np.random.RandomState(1).randn(4000).astype(np.float32)
    obj = {
        "vid": "video_001",
        "clips": [
            {"skeletons_3d": skeleton, "audio_raw": audio,
             "words": [["hello", 0.1, 0.4], ["world", 0.5, 0.9]],
             "start_frame_no": 0, "end_frame_no": 120,
             "start_time": 0.0, "end_time": 4.0},
        ],
    }
    blob = _write_legacy_blob(obj)
    back = legacy_arrow_deserialize(blob)
    assert back["vid"] == "video_001"
    clip = back["clips"][0]
    np.testing.assert_array_equal(clip["skeletons_3d"], skeleton)
    np.testing.assert_array_equal(clip["audio_raw"], audio)
    assert clip["words"] == [["hello", 0.1, 0.4], ["world", 0.5, 0.9]]
    assert clip["start_frame_no"] == 0 and clip["end_time"] == 4.0
