"""One-time converter: published TED LMDB -> native GGRaw store.

Two paths:
- Preferred (no extra deps): uses this framework's built-in LMDB reader +
  legacy pyarrow decoder (data/lmdb_compat.py), i.e. the same code path
  the framework uses to read LMDB directly.  Conversion is only useful to
  shed the legacy format / speed up cold starts.
- Fallback (legacy env): if run in an environment that still has
  ``lmdb`` + ``pyarrow<0.15``, uses those packages verbatim.

Usage: python tools/convert_ted_lmdb.py <src_lmdb_dir> <dst_ggraw_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gesture_generation_from_trimodal_context_tpu.data.storage import (
    GGRawStoreWriter)


def convert_with_builtin(src, dst):
    from gesture_generation_from_trimodal_context_tpu.data.lmdb_compat import (
        LMDBReader, legacy_arrow_deserialize)
    reader = LMDBReader(src)
    with GGRawStoreWriter(dst) as w:
        for i, (key, value) in enumerate(reader.items()):
            record = legacy_arrow_deserialize(value)
            w.add(key.decode("ascii", "replace"), record)
            if (i + 1) % 50 == 0:
                print("  %d videos..." % (i + 1))
    reader.close()


def convert_with_legacy_packages(src, dst):
    import lmdb
    import pyarrow
    env = lmdb.open(src, readonly=True, lock=False)
    with env.begin() as txn, GGRawStoreWriter(dst) as w:
        for i, (key, value) in enumerate(txn.cursor()):
            record = pyarrow.deserialize(value)
            w.add(key.decode("ascii", "replace"), record)
            if (i + 1) % 50 == 0:
                print("  %d videos..." % (i + 1))
    env.close()


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    try:
        import lmdb  # noqa: F401
        import pyarrow
        if tuple(int(x) for x in pyarrow.__version__.split(".")[:2]) < (0, 15):
            print("using legacy lmdb+pyarrow packages")
            convert_with_legacy_packages(src, dst)
            return
    except ImportError:
        pass
    print("using built-in LMDB reader + legacy arrow decoder")
    convert_with_builtin(src, dst)
    print("done ->", dst)


if __name__ == "__main__":
    main()
