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
# multi-level B-tree fixtures (branch pages, high pgnos, mixed overflow)
# ---------------------------------------------------------------------------

def _branch_node(key, child_pgno):
    """Branch node: 48-bit child pgno packed into lo/hi/flags
    (mdb.c NODEPGNO); node 0 of a page carries an empty key."""
    lo = child_pgno & 0xFFFF
    hi = (child_pgno >> 16) & 0xFFFF
    fl = (child_pgno >> 32) & 0xFFFF
    return struct.pack("<HHHH", lo, hi, fl, len(key)) + key


def _pack_page(pgno, flags, nodes, psize):
    offsets = []
    upper = psize
    for node in nodes:
        upper -= len(node)
        upper &= ~1
        offsets.append(upper)
    lower = PAGEHDRSZ + 2 * len(nodes)
    assert lower <= min(offsets), "page overflow"
    page = bytearray(psize)
    page[:PAGEHDRSZ] = _page_header(pgno, flags, lower, min(offsets))
    struct.pack_into("<%dH" % len(nodes), page, PAGEHDRSZ, *offsets)
    for off, node in zip(offsets, nodes):
        page[off:off + len(node)] = node
    return bytes(page)


class _EnvBuilder:
    """Byte-level builder of a multi-level read-only LMDB environment."""

    def __init__(self, psize=4096, first_pgno=2):
        self.psize = psize
        self.pages = {}          # pgno -> bytes (may span several pages)
        self.next_pg = first_pgno

    def _alloc(self, n=1):
        pg = self.next_pg
        self.next_pg += n
        return pg

    def add_overflow(self, data):
        n_pages = -(-(len(data) + PAGEHDRSZ) // self.psize)
        pg = self._alloc(n_pages)
        hdr = struct.pack("<QHHI", pg, 0, 0x04, n_pages)
        self.pages[pg] = (hdr + data).ljust(n_pages * self.psize, b"\0")
        return pg

    def build_tree(self, items):
        """items: sorted (key, value) pairs; values larger than 1/4 page
        go to overflow pages.  Returns the root pgno."""
        leaf_limit = self.psize // 4
        # leaf level
        level = []  # (first_key, pgno)
        nodes, first_key, used = [], None, PAGEHDRSZ
        def flush(nodes_list, fkey):
            pg = self._alloc()
            self.pages[pg] = _pack_page(pg, 0x02, nodes_list, self.psize)
            level.append((fkey, pg))
        for k, v in items:
            if len(v) > leaf_limit:
                ovf = self.add_overflow(v)
                node = _leaf_node(k, bigdata_pgno=ovf, bigdata_size=len(v))
            else:
                node = _leaf_node(k, v)
            sz = 2 + ((len(node) + 1) & ~1)
            if nodes and used + sz > self.psize:
                flush(nodes, first_key)
                nodes, first_key, used = [], None, PAGEHDRSZ
            if not nodes:
                first_key = k
            nodes.append(node)
            used += sz
        if nodes:
            flush(nodes, first_key)
        # branch levels
        while len(level) > 1:
            children, level = level, []
            nodes, first_key, used = [], None, PAGEHDRSZ
            def flush_branch(nodes_list, fkey):
                pg = self._alloc()
                self.pages[pg] = _pack_page(pg, 0x01, nodes_list, self.psize)
                level.append((fkey, pg))
            for i, (fkey, child_pg) in enumerate(children):
                key = b"" if not nodes else fkey
                node = _branch_node(key, child_pg)
                sz = 2 + ((len(node) + 1) & ~1)
                if nodes and used + sz > self.psize:
                    flush_branch(nodes, first_key)
                    nodes, first_key, used = [], None, PAGEHDRSZ
                    node = _branch_node(b"", child_pg)
                    sz = 2 + ((len(node) + 1) & ~1)
                if not nodes:
                    first_key = fkey
                nodes.append(node)
                used += sz
            if nodes:
                flush_branch(nodes, first_key)
        return level[0][1]

    def write(self, path, root, n_entries):
        ps = self.psize
        meta0 = _meta_page_ps(0, 1, root, n_entries, ps, self.next_pg)
        meta1 = _meta_page_ps(1, 2, root, n_entries, ps, self.next_pg)
        with open(path, "wb") as f:
            f.write(meta0 + meta1)
            for pg in sorted(self.pages):
                f.seek(pg * ps)
                f.write(self.pages[pg])
            end = self.next_pg * ps
            if f.tell() < end:
                f.seek(end - 1)
                f.write(b"\0")


def _meta_page_ps(pgno, txnid, main_root, main_entries, psize, last_pg):
    hdr = _page_header(pgno, 0x08, 0, 0)
    meta = struct.pack("<II", 0xBEEFC0DE, 1)
    meta += struct.pack("<QQ", 0, (last_pg + 1) * psize)
    meta += struct.pack("<IHH", psize, 0, 0) + struct.pack(
        "<QQQQQ", 0, 0, 0, 0, 0xFFFFFFFFFFFFFFFF)
    meta += struct.pack("<IHH", 0, 0, 3) + struct.pack(
        "<QQQQQ", 0, 1, 0, main_entries, main_root)
    meta += struct.pack("<QQ", last_pg, txnid)
    return (hdr + meta).ljust(psize, b"\0")


def _make_items(n, rng, value_len=24, big_every=0):
    items = []
    for i in range(n):
        k = b"key%08d" % i
        if big_every and i % big_every == 0:
            v = bytes(rng.randint(0, 256, 3000, dtype=np.uint8))
        else:
            v = bytes(rng.randint(0, 256, value_len, dtype=np.uint8))
        items.append((k, v))
    return items


def test_multilevel_branch_tree(tmp_path):
    """>=2 branch levels, hundreds of keys, mixed inline/overflow values:
    full iteration order + every key found by B-tree descent."""
    rng = np.random.RandomState(0)
    items = _make_items(900, rng, big_every=50)
    b = _EnvBuilder(psize=512)
    root = b.build_tree(items)
    d = tmp_path / "env"
    d.mkdir()
    b.write(str(d / "data.mdb"), root, len(items))

    r = LMDBReader(str(d))
    assert r.psize == 512 and r.n_entries == 900
    got = list(r.items())
    assert [k for k, _ in got] == [k for k, _ in items]
    assert dict(got) == dict(items)

    expected = dict(items)
    for k in (b"key00000000", b"key00000449", b"key00000899",
              b"key00000050", b"key00000850"):
        assert r.get(k) == expected[k]
    assert r.get(b"missing") is None
    assert r.get(b"key00000899\x00") is None  # past the last key
    assert r.get(b"") is None                 # before the first key
    r.close()


def test_get_is_logarithmic(tmp_path):
    """100k keys: a point lookup touches <= tree-depth pages, not O(n)."""
    rng = np.random.RandomState(1)
    items = _make_items(100_000, rng, value_len=8)
    b = _EnvBuilder(psize=512)
    root = b.build_tree(items)
    d = tmp_path / "env"
    d.mkdir()
    b.write(str(d / "data.mdb"), root, len(items))

    r = LMDBReader(str(d))
    expected = dict(items)
    total_pages = (r._mm.size() // 512)
    lookups = [b"key%08d" % i for i in
               rng.randint(0, 100_000, 50)]
    r.pages_read = 0
    for k in lookups:
        assert r.get(k) == expected[k]
    per_get = r.pages_read / len(lookups)
    # depth of a 100k-entry tree at psize 512 is ~4-5; a linear scan
    # would touch thousands of pages per lookup
    assert per_get <= 6, per_get
    assert total_pages > 2000  # the env is actually big
    r.close()


def test_high_pgno_bit_packing(tmp_path):
    """Branch-node child pgnos above 2^16 exercise the hi<<16 packing
    (a sparse file keeps the fixture small on disk)."""
    rng = np.random.RandomState(2)
    items = _make_items(300, rng)
    b = _EnvBuilder(psize=512, first_pgno=70_000)  # > 2^16
    root = b.build_tree(items)
    d = tmp_path / "env"
    d.mkdir()
    b.write(str(d / "data.mdb"), root, len(items))

    r = LMDBReader(str(d))
    assert dict(r.items()) == dict(items)
    assert r.get(b"key%08d" % 123) == dict(items)[b"key%08d" % 123]
    r.close()


# ---------------------------------------------------------------------------
# dupsort fixtures: embedded sub-pages, sub-database trees, LEAF2 pages
# ---------------------------------------------------------------------------

def _subpage(values, dupfixed=False):
    """Embedded dup sub-page (P_SUBP): dup values stored as the keys of
    a mini LEAF/LEAF2 page, node offsets relative to the sub-page start."""
    if dupfixed:
        ksize = len(values[0])
        assert all(len(v) == ksize for v in values)
        body = b"".join(values)
        lower = PAGEHDRSZ + 2 * len(values)
        return struct.pack("<QHHHH", 0, ksize, 0x20 | 0x40, lower,
                           PAGEHDRSZ + len(body)) + body
    nodes = [struct.pack("<HHHH", 0, 0, 0, len(v)) + v for v in values]
    sizes = [(len(nd) + 1) & ~1 for nd in nodes]
    total = PAGEHDRSZ + 2 * len(nodes) + sum(sizes)
    buf = bytearray(total)
    upper = total
    offsets = []
    for nd, sz in zip(nodes, sizes):
        upper -= sz
        offsets.append(upper)
        buf[upper:upper + len(nd)] = nd
    buf[:PAGEHDRSZ] = struct.pack("<QHHHH", 0, 0, 0x02 | 0x40,
                                  PAGEHDRSZ + 2 * len(nodes), min(offsets))
    struct.pack_into("<%dH" % len(offsets), buf, PAGEHDRSZ, *offsets)
    return bytes(buf)


def _dup_node_subpage(key, values, dupfixed=False):
    """Leaf node with F_DUPDATA: data is the embedded sub-page."""
    sub = _subpage(values, dupfixed)
    lo, hi = len(sub) & 0xFFFF, (len(sub) >> 16) & 0xFFFF
    return struct.pack("<HHHH", lo, hi, 0x04, len(key)) + key + sub


def _dup_node_subdb(key, root_pgno, n_entries, depth, leaf2_ksize=0):
    """Leaf node with F_DUPDATA|F_SUBDATA: data is an MDB_db struct
    (md_root at offset 40) describing the dup sub-database."""
    db = struct.pack("<IHHQQQQQ", leaf2_ksize, 0, depth, 0, 1, 0,
                     n_entries, root_pgno)
    return struct.pack("<HHHH", len(db), 0, 0x04 | 0x02, len(key)) \
        + key + db


def _leaf2_page(pgno, keys, psize):
    """Full LEAF2 page: fixed-size keys packed from PAGEHDRSZ, key size
    in mp_pad, mp_lower advancing 2 bytes per key (mdb.c NUMKEYS)."""
    ksize = len(keys[0])
    body = b"".join(keys)
    lower = PAGEHDRSZ + 2 * len(keys)
    page = bytearray(psize)
    page[:PAGEHDRSZ] = struct.pack("<QHHHH", pgno, ksize, 0x20, lower,
                                   PAGEHDRSZ + len(body))
    page[PAGEHDRSZ:PAGEHDRSZ + len(body)] = body
    return bytes(page)


def test_dupsort_subpage(tmp_path):
    """F_DUPDATA leaf nodes with embedded LEAF sub-pages: items() fans
    out one pair per duplicate, search()/get() return the FIRST dup
    (lmdb set_key position), get_all() the whole sorted dup set."""
    dups = [b"val-a", b"val-bb", b"val-ccc"]
    nodes = [
        _leaf_node(b"akey", b"plain"),
        _dup_node_subpage(b"dkey", dups),
        _leaf_node(b"zkey", b"tail"),
    ]
    content = (_meta_page(0, txnid=1, main_root=2, main_entries=5)
               + _meta_page(1, txnid=2, main_root=2, main_entries=5)
               + _leaf_page(2, nodes))
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(content)

    r = LMDBReader(str(d))
    assert list(r.items()) == [
        (b"akey", b"plain"), (b"dkey", b"val-a"), (b"dkey", b"val-bb"),
        (b"dkey", b"val-ccc"), (b"zkey", b"tail")]
    assert r.get(b"dkey") == b"val-a"
    assert r.get_all(b"dkey") == dups
    assert r.get_all(b"akey") == [b"plain"]
    assert r.get_all(b"nope") is None
    r.close()


def test_dupsort_subpage_dupfixed(tmp_path):
    """MDB_DUPFIXED dup sets small enough to inline use LEAF2 sub-pages
    (no per-value node headers)."""
    dups = [b"%04d" % i for i in range(10)]
    nodes = [_dup_node_subpage(b"fkey", dups, dupfixed=True)]
    content = (_meta_page(0, txnid=1, main_root=2, main_entries=10)
               + _meta_page(1, txnid=2, main_root=2, main_entries=10)
               + _leaf_page(2, nodes))
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(content)

    r = LMDBReader(str(d))
    assert list(r.items()) == [(b"fkey", v) for v in dups]
    assert r.get(b"fkey") == b"0000"
    assert r.get_all(b"fkey") == dups
    r.close()


def test_dupsort_subdb_leaf2_tree(tmp_path):
    """F_DUPDATA|F_SUBDATA: a dup set large enough for its own
    sub-database — branch root over two LEAF2 pages. First-dup lookup
    descends leftmost only (O(depth) pages, not O(dups))."""
    psize = 512
    dups = [b"%06d" % i for i in range(100)]
    main = _pack_page(2, 0x02, [_dup_node_subdb(
        b"bigdup", root_pgno=5, n_entries=len(dups), depth=2,
        leaf2_ksize=6)], psize)
    leaf_a = _leaf2_page(3, dups[:50], psize)
    leaf_b = _leaf2_page(4, dups[50:], psize)
    branch = _pack_page(5, 0x01, [_branch_node(b"", 3),
                                  _branch_node(dups[50], 4)], psize)
    content = (_meta_page_ps(0, 1, 2, len(dups), psize, 6)
               + _meta_page_ps(1, 2, 2, len(dups), psize, 6)
               + main + leaf_a + leaf_b + branch)
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(content)

    r = LMDBReader(str(d))
    assert list(r.items()) == [(b"bigdup", v) for v in dups]
    assert r.get(b"bigdup") == b"000000"
    assert r.get_all(b"bigdup") == dups
    r.pages_read = 0
    r.get(b"bigdup")
    assert r.pages_read <= 3  # main leaf + sub-branch + leftmost LEAF2
    r.close()


def test_main_leaf2_root(tmp_path):
    """A wholly DUPFIXED main tree (LEAF2 root page): entries are
    key-only; reads yield empty values instead of raising."""
    keys = [b"%03d" % i for i in range(20)]
    content = (_meta_page(0, txnid=1, main_root=2, main_entries=20)
               + _meta_page(1, txnid=2, main_root=2, main_entries=20)
               + _leaf2_page(2, keys, PSIZE))
    d = tmp_path / "env"
    d.mkdir()
    (d / "data.mdb").write_bytes(content)

    r = LMDBReader(str(d))
    got = list(r.items())
    assert [k for k, _ in got] == keys
    assert all(v == b"" for _, v in got)
    assert r.get(b"007") == b""
    assert r.get(b"abc") is None
    r.close()


def test_store_get_decodes_only_requested_record(tmp_path):
    """LMDBRawStore.get over a branch tree with legacy-arrow values."""
    from gesture_generation_from_trimodal_context_tpu.data.lmdb_compat import (
        LMDBRawStore)

    rng = np.random.RandomState(3)
    items = []
    for i in range(40):
        obj = {"vid": "video_%03d" % i,
               "clips": [{"skeletons_3d":
                          rng.randn(6, 10, 3).astype(np.float32),
                          "start_time": float(i)}]}
        items.append((b"%010d" % i, _write_legacy_blob(obj)))
    b = _EnvBuilder(psize=512)
    root = b.build_tree(items)
    d = tmp_path / "env"
    d.mkdir()
    b.write(str(d / "data.mdb"), root, len(items))

    store = LMDBRawStore(str(d))
    rec = store.get(b"%010d" % 17)
    assert rec["vid"] == "video_017"
    assert rec["clips"][0]["start_time"] == 17.0
    with pytest.raises(KeyError):
        store.get(b"nope")
    store.close()


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


def test_convert_tool_on_multilevel_env(tmp_path):
    """tools/convert_ted_lmdb.py end-to-end on a branch-tree LMDB with
    TED-shaped legacy-arrow records."""
    import subprocess
    import sys as _sys
    from gesture_generation_from_trimodal_context_tpu.data.storage import (
        open_raw_store)

    rng = np.random.RandomState(4)
    items = []
    for i in range(30):
        obj = {"vid": "video_%03d" % i,
               "clips": [{"skeletons_3d":
                          rng.randn(8, 10, 3).astype(np.float32),
                          "audio_raw": rng.randn(64).astype(np.float32),
                          "words": [["hi", 0.0, 0.5]],
                          "start_frame_no": 0, "end_frame_no": 8,
                          "start_time": 0.0, "end_time": 0.53}]}
        items.append((("video_%03d" % i).encode(), _write_legacy_blob(obj)))
    b = _EnvBuilder(psize=512)
    root = b.build_tree(items)
    src = tmp_path / "lmdb_env"
    src.mkdir()
    b.write(str(src / "data.mdb"), root, len(items))
    dst = tmp_path / "ggraw"

    proc = subprocess.run(
        [_sys.executable, "tools/convert_ted_lmdb.py", str(src), str(dst)],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr

    store = open_raw_store(str(dst))
    rec = store.get("video_011")
    assert rec["vid"] == "video_011"
    np.testing.assert_allclose(rec["clips"][0]["end_time"], 0.53)
    assert len(list(store.iter_videos())) == 30
    store.close()
