"""Read-only LMDB + legacy-pyarrow compatibility layer.

Lets this framework consume the published TED dataset directory
unchanged (reference README data layout: lmdb_train/lmdb_val/lmdb_test
LMDB environments whose values are pyarrow-0.14 ``serialize`` blobs,
reference data_preprocessor.py:46, lmdb_data_loader.py:112).  Neither the
``lmdb`` package nor the removed ``pyarrow.deserialize`` API exists in
this environment, so both layers are implemented here:

- ``LMDBReader``: a pure-python mmap walker of the LMDB file format
  (meta pages -> main DB B-tree -> leaf nodes, with overflow-page
  values, dupsort sub-pages/sub-databases, and DUPFIXED LEAF2 pages).
  Read-only, zero-copy for overflow values.
- ``legacy_arrow_deserialize``: a decoder for the pyarrow 0.14 python
  serialization format: a small header, an Arrow IPC stream holding the
  object tree as list<dense_union<...>> (decoded with the *modern*
  pyarrow that is installed — the IPC stream schema is self-describing),
  followed by aligned Tensor messages for numpy arrays.

Validated against hand-built fixtures (tests/test_lmdb_compat.py); see
tools/convert_ted_lmdb.py for the offline conversion path on machines
that still have pyarrow 0.14.
"""

import mmap
import os
import struct

import numpy as np

# page flags (lmdb mdb.c)
P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20
P_SUBP = 0x40
# node flags
F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04

PAGEHDRSZ = 16
MDB_MAGIC = 0xBEEFC0DE


class LMDBReader:
    """Iterate (key, value) of an LMDB environment's main database."""

    def __init__(self, path):
        data_path = os.path.join(path, "data.mdb") \
            if os.path.isdir(path) else path
        self._f = open(data_path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self.pages_read = 0  # instrumentation (complexity tests)
        meta = self._read_meta()
        self.psize = meta["psize"]
        self.main_root = meta["main_root"]
        self.n_entries = meta["main_entries"]

    def _read_meta_at(self, off):
        m = self._mm
        magic, version = struct.unpack_from("<II", m, off)
        if magic != MDB_MAGIC:
            raise ValueError("bad LMDB meta magic at %d" % off)
        # mm_address (8), mm_mapsize (8)
        dbs_off = off + 8 + 16
        metas = []
        for i in range(2):
            o = dbs_off + i * 48
            pad, flags, depth = struct.unpack_from("<IHH", m, o)
            branch, leaf, overflow, entries, root = struct.unpack_from(
                "<QQQQQ", m, o + 8)
            metas.append({"pad": pad, "flags": flags, "depth": depth,
                          "entries": entries, "root": root})
        last_pg, txnid = struct.unpack_from("<QQ", m, dbs_off + 96)
        return {"txnid": txnid, "psize": metas[0]["pad"],
                "main_root": metas[1]["root"],
                "main_entries": metas[1]["entries"]}

    def _read_meta(self):
        # meta pages live in pages 0 and 1 (page header then MDB_meta);
        # the live one has the larger txnid
        m0 = self._read_meta_at(PAGEHDRSZ)
        psize = m0["psize"] or 4096
        m1 = self._read_meta_at(psize + PAGEHDRSZ)
        return m0 if m0["txnid"] >= m1["txnid"] else m1

    def _page(self, pgno):
        self.pages_read += 1
        off = pgno * self.psize
        flags, = struct.unpack_from("<H", self._mm, off + 10)
        lower, upper = struct.unpack_from("<HH", self._mm, off + 12)
        return off, flags, lower, upper

    def _node_key(self, node):
        ksize, = struct.unpack_from("<H", self._mm, node + 6)
        return bytes(self._mm[node + 8:node + 8 + ksize])

    def _branch_child(self, node):
        """Child pgno of a branch node: 48-bit pgno packed into the
        lo/hi/flags fields (lmdb mdb.c NODEPGNO)."""
        lo, hi, nflags = struct.unpack_from("<HHH", self._mm, node)
        return lo | (hi << 16) | (nflags << 32)

    def _leaf_locator(self, node):
        """(value_start, value_size) of a leaf node, resolving overflow
        (F_BIGDATA) values to their overflow-page chain."""
        lo, hi, nflags, ksize = struct.unpack_from("<HHHH", self._mm, node)
        datasize = lo | (hi << 16)
        if nflags & F_BIGDATA:
            ovf_pgno, = struct.unpack_from("<Q", self._mm, node + 8 + ksize)
            start = ovf_pgno * self.psize + PAGEHDRSZ
        else:
            start = node + 8 + ksize
        return start, datasize

    # -- dupsort support (mdb.c mdb_xcursor_init1) ----------------------
    #
    # A key with duplicate values stores them as the KEYS of a nested
    # structure hanging off its leaf node: an embedded sub-page
    # (F_DUPDATA) for small dup sets, or a full sub-database B-tree
    # (F_DUPDATA|F_SUBDATA, node data = MDB_db struct) for large ones.
    # With MDB_DUPFIXED the nested pages are LEAF2: fixed-size keys
    # packed back-to-back with no node headers (key size in mp_pad;
    # mp_lower still advances 2 bytes per key, so NUMKEYS is unchanged).

    def _leaf2_locators(self, base, lower, ksize):
        """Value locators of a LEAF2 page/sub-page (mdb.c LEAF2KEY)."""
        nkeys = (lower - PAGEHDRSZ) >> 1
        for i in range(nkeys):
            yield base + PAGEHDRSZ + i * ksize, ksize

    def _iter_subpage(self, base):
        """Value locators of a sub-page embedded in a leaf node's data
        (P_SUBP); node/ptr offsets are relative to the sub-page start."""
        pad, flags = struct.unpack_from("<HH", self._mm, base + 8)
        lower, = struct.unpack_from("<H", self._mm, base + 12)
        if flags & P_LEAF2:
            yield from self._leaf2_locators(base, lower, pad)
            return
        nkeys = (lower - PAGEHDRSZ) >> 1
        ptrs = struct.unpack_from("<%dH" % nkeys, self._mm, base + PAGEHDRSZ)
        for p in ptrs:
            node = base + p
            ksz, = struct.unpack_from("<H", self._mm, node + 6)
            yield node + 8, ksz

    def _iter_dup_tree(self, pgno):
        """Value locators of a dupsort sub-database tree: dup values are
        the keys of its LEAF/LEAF2 pages (data sizes are zero)."""
        off, flags, lower, upper = self._page(pgno)
        if flags & P_LEAF2:
            ksize, = struct.unpack_from("<H", self._mm, off + 8)
            yield from self._leaf2_locators(off, lower, ksize)
            return
        nkeys = (lower - PAGEHDRSZ) >> 1
        ptrs = struct.unpack_from("<%dH" % nkeys, self._mm, off + PAGEHDRSZ)
        if flags & P_BRANCH:
            for p in ptrs:
                yield from self._iter_dup_tree(self._branch_child(off + p))
        elif flags & P_LEAF:
            for p in ptrs:
                node = off + p
                ksz, = struct.unpack_from("<H", self._mm, node + 6)
                yield node + 8, ksz
        else:
            raise ValueError("unexpected page flags 0x%x" % flags)

    def _dup_locators(self, node):
        """Value locators of a dupsort leaf node, first dup first (the
        generator descends leftmost-first, so ``next()`` costs O(depth))."""
        lo, hi, nflags, ksize = struct.unpack_from("<HHHH", self._mm, node)
        data = node + 8 + ksize
        if nflags & F_SUBDATA:
            root, = struct.unpack_from("<Q", self._mm, data + 40)  # md_root
            yield from self._iter_dup_tree(root)
        else:
            yield from self._iter_subpage(data)

    def _node_flags(self, node):
        nflags, = struct.unpack_from("<H", self._mm, node + 4)
        return nflags

    def _iter_nodes(self, pgno):
        """Yield (key, value_locator) without copying value bytes;
        dupsort keys repeat once per duplicate value."""
        off, flags, lower, upper = self._page(pgno)
        if flags & P_LEAF2:
            # main tree entirely DUPFIXED: entries are key-only
            ksize, = struct.unpack_from("<H", self._mm, off + 8)
            for start, ksz in self._leaf2_locators(off, lower, ksize):
                yield bytes(self._mm[start:start + ksz]), (start + ksz, 0)
            return
        nkeys = (lower - PAGEHDRSZ) >> 1
        ptrs = struct.unpack_from("<%dH" % nkeys, self._mm, off + PAGEHDRSZ)
        if flags & P_BRANCH:
            for p in ptrs:
                yield from self._iter_nodes(self._branch_child(off + p))
        elif flags & P_LEAF:
            for p in ptrs:
                node = off + p
                key = self._node_key(node)
                if self._node_flags(node) & F_DUPDATA:
                    for locator in self._dup_locators(node):
                        yield key, locator
                else:
                    yield key, self._leaf_locator(node)
        else:
            raise ValueError("unexpected page flags 0x%x" % flags)

    def _descend(self, key):
        """Root-to-leaf B-tree descent with in-page binary search (lmdb
        mdb.c mdb_page_search/mdb_node_search): O(log n) pages touched.
        Returns ('leaf2', locator) | ('node', node_offset) | None."""
        if self.main_root == 0xFFFFFFFFFFFFFFFF:
            return None
        pgno = self.main_root
        while True:
            off, flags, lower, upper = self._page(pgno)
            if flags & P_LEAF2:
                # DUPFIXED page: binary search the packed fixed-size keys
                ksize, = struct.unpack_from("<H", self._mm, off + 8)
                nkeys = (lower - PAGEHDRSZ) >> 1
                lo_i, hi_i = 0, nkeys - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    start = off + PAGEHDRSZ + mid * ksize
                    k = bytes(self._mm[start:start + ksize])
                    if k == key:
                        return ("leaf2", (start + ksize, 0))
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            nkeys = (lower - PAGEHDRSZ) >> 1
            if nkeys == 0:
                return None
            ptrs = struct.unpack_from("<%dH" % nkeys, self._mm,
                                      off + PAGEHDRSZ)
            if flags & P_BRANCH:
                # node 0 of a branch page has an empty key (implicit -inf);
                # descend into the child of the greatest node with
                # node.key <= key
                lo_i, hi_i, ans = 1, nkeys - 1, 0
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    if self._node_key(off + ptrs[mid]) <= key:
                        ans = mid
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                pgno = self._branch_child(off + ptrs[ans])
            elif flags & P_LEAF:
                lo_i, hi_i = 0, nkeys - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    node = off + ptrs[mid]
                    k = self._node_key(node)
                    if k == key:
                        return ("node", node)
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            else:
                raise ValueError("unexpected page flags 0x%x" % flags)

    def search(self, key):
        """Value locator for key (first duplicate for dupsort keys, the
        lmdb cursor set_key position), or None."""
        hit = self._descend(key)
        if hit is None:
            return None
        kind, payload = hit
        if kind == "leaf2":
            return payload
        if self._node_flags(payload) & F_DUPDATA:
            return next(self._dup_locators(payload))
        return self._leaf_locator(payload)

    def get(self, key):
        """Value bytes for key, or None."""
        locator = self.search(key)
        return None if locator is None else self._read_value(locator)

    def get_all(self, key):
        """All duplicate values for key in dup-sort order (single-element
        list for plain keys) — lmdb cursor first_dup..next_dup — or None
        if the key is absent."""
        hit = self._descend(key)
        if hit is None:
            return None
        kind, payload = hit
        if kind == "leaf2":
            return [b""]
        if self._node_flags(payload) & F_DUPDATA:
            return [self._read_value(loc)
                    for loc in self._dup_locators(payload)]
        return [self._read_value(self._leaf_locator(payload))]

    def _read_value(self, locator):
        start, size = locator
        return bytes(self._mm[start:start + size])

    def iter_locators(self):
        if self.main_root == 0xFFFFFFFFFFFFFFFF:
            return
        yield from self._iter_nodes(self.main_root)

    def items(self):
        for key, locator in self.iter_locators():
            yield key, self._read_value(locator)

    def close(self):
        self._mm.close()
        self._f.close()


# ---------------------------------------------------------------------------
# legacy pyarrow 0.14 python-serialization decoding
# ---------------------------------------------------------------------------

def _align(n, k):
    return (n + k - 1) & ~(k - 1)


def legacy_arrow_deserialize(buf):
    """Decode a pyarrow-0.14 ``serialize`` blob into Python objects.

    Layout (arrow cpp python/serialize.cc SerializedPyObject::WriteTo):
    three little-endian int32 counts (tensors, ndarrays, buffers), stream
    alignment to 8, an Arrow IPC stream with one record batch (single
    list<union> column, one row = the root object), then 64-aligned
    Tensor messages for each tensor/ndarray and raw (int64 size, bytes)
    pairs for each buffer."""
    import pyarrow as pa

    num_tensors, num_ndarrays, num_buffers = struct.unpack_from(
        "<iii", buf, 0)
    pos = _align(12, 8)

    # one Buffer over the whole blob; per-section access is zero-copy
    # Buffer.slice views (a bytes-slice here would copy the remainder of
    # the record per tensor -> O(record^2) byte traffic on real TED
    # records, which hold every clip's skeleton/audio/spectrogram arrays)
    whole = pa.py_buffer(buf)

    stream = pa.input_stream(whole.slice(pos))
    reader = pa.ipc.open_stream(stream)
    batch = reader.read_next_batch()
    try:
        reader.read_next_batch()
    except StopIteration:
        pass
    consumed = stream.tell()
    pos += consumed

    ndarrays = []
    for _ in range(num_tensors + num_ndarrays):
        pos = _align(pos, 64)
        tstream = pa.input_stream(whole.slice(pos))
        tensor = pa.ipc.read_tensor(tstream)
        ndarrays.append(tensor.to_numpy())
        pos += tstream.tell()

    buffers = []
    for _ in range(num_buffers):
        size, = struct.unpack_from("<q", buf, pos)
        pos += 8
        buffers.append(bytes(buf[pos:pos + size]))
        pos += size

    col = batch.column(0)
    # the batch's single row is a 1-element sequence holding the root
    # object (python_to_arrow wraps the object before serializing)
    return _decode_union_list(col, ndarrays, buffers)[0][0]


def _decode_union_list(list_array, ndarrays, buffers):
    """Decode a list<union> array into a list of python objects."""
    import pyarrow as pa

    values = _decode_union(list_array.values, ndarrays, buffers)
    out = []
    offsets = list_array.offsets.to_pylist()
    for i in range(len(list_array)):
        out.append(values[offsets[i]:offsets[i + 1]])
    return out


def _decode_union(union_array, ndarrays, buffers):
    """Decode a dense union array (the 0.14 python-object encoding) into a
    flat list of python values, ordered by position."""
    import pyarrow as pa

    ua = union_array
    utype = ua.type
    type_codes = np.asarray(ua.type_codes)
    offsets = np.asarray(ua.offsets)
    n = len(ua)
    out = [None] * n

    for code_idx in range(utype.num_fields):
        field = utype.field(code_idx)
        type_code = utype.type_codes[code_idx] \
            if hasattr(utype, "type_codes") else code_idx
        mask = type_codes == type_code
        if not mask.any():
            continue
        child = ua.field(code_idx)
        decoded = _decode_child(field.name, child, ndarrays, buffers)
        for i in np.nonzero(mask)[0]:
            out[i] = decoded[offsets[i]]
    return out


def _decode_child(name, child, ndarrays, buffers):
    """Decode one union child array by its 0.14 field name."""
    import pyarrow as pa

    if name in ("bools", "ints", "doubles", "floats", "py2_ints",
                "date64s", "uints"):
        return child.to_pylist()
    if name in ("strings",):
        return child.to_pylist()
    if name in ("bytes",):
        return [None if v is None else
                (v if isinstance(v, bytes) else bytes(v))
                for v in child.to_pylist()]
    if name in ("half_floats",):
        return [None if v is None else float(v) for v in child.to_pylist()]
    if name in ("tensors", "ndarrays"):
        return [ndarrays[i] for i in child.to_pylist()]
    if name in ("buffers",):
        return [buffers[i] for i in child.to_pylist()]
    if name in ("lists",):
        return _decode_union_list(child, ndarrays, buffers)
    if name in ("tuples",):
        return [tuple(v) for v in _decode_union_list(child, ndarrays,
                                                     buffers)]
    if name in ("sets",):
        return [set(v) for v in _decode_union_list(child, ndarrays,
                                                   buffers)]
    if name in ("dicts",):
        # struct<keys: list<union>, vals: list<union>>
        keys_lists = _decode_union_list(child.field("keys"), ndarrays,
                                        buffers)
        vals_lists = _decode_union_list(child.field("vals"), ndarrays,
                                        buffers)
        return [dict(zip(k, v)) for k, v in zip(keys_lists, vals_lists)]
    if name in ("nones", "none"):
        return [None] * len(child)
    raise NotImplementedError(
        "legacy pyarrow union child %r not supported" % name)


class LMDBRawStore:
    """Raw TED clip store backed by the original LMDB database."""

    def __init__(self, path):
        self.path = path
        self.reader = LMDBReader(path)

    def __len__(self):
        return self.reader.n_entries

    def keys(self):
        return [k for k, _ in self.reader.iter_locators()]

    def get(self, key):
        """Decode only the requested record; O(log n) B-tree descent."""
        if isinstance(key, str):
            key = key.encode("ascii")
        locator = self.reader.search(key)
        if locator is None:
            raise KeyError(key)
        return legacy_arrow_deserialize(self.reader._read_value(locator))

    def iter_videos(self):
        for _, v in self.reader.items():
            yield legacy_arrow_deserialize(v)

    def close(self):
        self.reader.close()
