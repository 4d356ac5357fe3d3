"""Clip-level storage: the raw TED database abstraction.

The reference keeps raw clips in LMDB with legacy pyarrow-0.14
serialization (reference data_preprocessor.py:26-46,
lmdb_data_loader.py:89-112).  Neither lmdb nor the removed
pyarrow.deserialize API exists in this environment, so this framework
defines a storage interface with two backends:

- ``GGRawStore``: our native format — one msgpack record per video in a
  single append-only file with a JSON index.  Numpy arrays are encoded as
  {b'__nd__': (dtype, shape, bytes)}.  Used for new datasets and the
  synthetic test fixtures.
- ``LMDBRawStore`` (data/lmdb_compat.py): a read-only pure-python reader
  for the published 16 GB TED LMDB + a decoder for the handful of legacy
  pyarrow value types it contains, so users of the reference can point
  this framework at their existing data directory unchanged.

``open_raw_store`` sniffs the directory layout and picks the backend.
"""

import json
import os
import struct

import msgpack
import numpy as np

_MAGIC = b"GGRAW001"


def _pack_default(obj):
    if isinstance(obj, np.ndarray):
        return {b"__nd__": (obj.dtype.str, obj.shape,
                            obj.tobytes(order="C"))}
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    raise TypeError("cannot pack %r" % type(obj))


def _unpack_hook(obj):
    if b"__nd__" in obj:
        dtype, shape, raw = obj[b"__nd__"]
        if isinstance(dtype, bytes):
            dtype = dtype.decode()
        return np.frombuffer(raw, dtype=dtype).reshape(shape)
    return obj


def pack_record(record):
    return msgpack.packb(record, default=_pack_default, use_bin_type=True)


def unpack_record(buf):
    return msgpack.unpackb(buf, object_hook=_unpack_hook, raw=False,
                           strict_map_key=False)


class GGRawStoreWriter:
    """Append-only writer: records.bin + index.json."""

    def __init__(self, path):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.data_path = os.path.join(path, "records.bin")
        self.index = []
        self._f = open(self.data_path, "wb")
        self._f.write(_MAGIC)
        self._offset = len(_MAGIC)

    def add(self, key, record):
        buf = pack_record(record)
        self._f.write(struct.pack("<Q", len(buf)))
        self._f.write(buf)
        self.index.append([key, self._offset, len(buf)])
        self._offset += 8 + len(buf)

    def close(self):
        self._f.close()
        with open(os.path.join(self.path, "index.json"), "w") as f:
            json.dump(self.index, f)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class GGRawStore:
    """Read side of the native raw-clip store."""

    def __init__(self, path):
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            self.index = json.load(f)
        self._f = open(os.path.join(path, "records.bin"), "rb")

    def __len__(self):
        return len(self.index)

    def keys(self):
        return [e[0] for e in self.index]

    def get(self, key):
        for k, off, ln in self.index:
            if k == key:
                return self._read(off, ln)
        raise KeyError(key)

    def _read(self, offset, length):
        self._f.seek(offset + 8)
        return unpack_record(self._f.read(length))

    def iter_videos(self):
        """Yield every video record {vid, clips: [...]}, in key order."""
        for _, off, ln in self.index:
            yield self._read(off, ln)

    def close(self):
        self._f.close()


def is_ggraw(path):
    return os.path.exists(os.path.join(path, "index.json")) and \
        os.path.exists(os.path.join(path, "records.bin"))


def is_lmdb(path):
    return os.path.exists(os.path.join(path, "data.mdb"))


def open_raw_store(path):
    """Open a raw clip database, choosing the backend by layout."""
    if is_ggraw(path):
        return GGRawStore(path)
    if is_lmdb(path):
        from .lmdb_compat import LMDBRawStore
        return LMDBRawStore(path)
    raise FileNotFoundError(
        "no raw clip store at %r (expected GGRaw index.json/records.bin "
        "or an LMDB data.mdb)" % path)
