"""ctypes binding + on-demand build of the C++ batch assembler.

The shared library is compiled once per machine from ggloader.cc with the
system g++ and cached beside the source; every entry point has a numpy
fallback so the framework runs without a toolchain.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ggloader.cc")
_SO = os.path.join(_HERE, "libggloader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", _SO]
    logging.info("building native loader: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f64p = ctypes.POINTER(ctypes.c_double)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.gg_gather.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int]
            lib.gg_gather_f16_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
                f32p, ctypes.c_int]
            lib.gg_word_scatter.argtypes = [
                i32p, f32p, i64p, i64p, ctypes.c_int64, f64p, f64p, f64p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, i32p, i32p, i32p, ctypes.c_int]
            _lib = lib
        except Exception as e:
            logging.warning("native loader unavailable (%s); "
                            "using numpy fallback", e)
            _lib = None
        return _lib


def native_available():
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


N_THREADS = min(8, os.cpu_count() or 1)


def gather(memmap, indices, copy_count=None):
    """Gather memmap[indices, :copy_count] into a contiguous array.

    memmap: (S, ...) numpy memmap; copy_count clips the second axis."""
    lib = get_lib()
    if copy_count is None:
        copy_count = memmap.shape[1] if memmap.ndim > 1 else 1
    if lib is None:
        return np.ascontiguousarray(memmap[indices, :copy_count]
                                    if memmap.ndim > 1 else memmap[indices])

    indices = np.ascontiguousarray(indices, np.int64)
    per_item = int(np.prod(memmap.shape[1:], dtype=np.int64))
    inner = per_item // memmap.shape[1] if memmap.ndim > 1 else 1
    itemsize = memmap.dtype.itemsize
    record_bytes = per_item * itemsize
    copy_bytes = copy_count * inner * itemsize
    out_shape = (len(indices), copy_count) + tuple(memmap.shape[2:]) \
        if memmap.ndim > 1 else (len(indices),)
    out = np.empty(out_shape, memmap.dtype)
    lib.gg_gather(
        memmap.ctypes.data_as(ctypes.c_char_p),
        record_bytes, 0, copy_bytes,
        _ptr(indices, ctypes.c_int64), len(indices),
        out.ctypes.data_as(ctypes.c_char_p), N_THREADS)
    return out


def gather_f16_as_f32(memmap, indices, copy_count=None):
    """Gather a float16 field widening to float32 in one pass."""
    lib = get_lib()
    if copy_count is None:
        copy_count = memmap.shape[1]
    if lib is None:
        return np.ascontiguousarray(
            memmap[indices, :copy_count]).astype(np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    per_item = int(np.prod(memmap.shape[1:], dtype=np.int64))
    inner = per_item // memmap.shape[1]
    copy_elems = copy_count * inner
    out = np.empty((len(indices), copy_count) + tuple(memmap.shape[2:]),
                   np.float32)
    lib.gg_gather_f16_to_f32(
        memmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        per_item, 0, copy_elems,
        _ptr(indices, ctypes.c_int64), len(indices),
        _ptr(out, ctypes.c_float), N_THREADS)
    return out


def word_scatter(ids, starts, offsets, sel, t0s, sample_ends, frame_durs,
                 n_frames, word_cap, sos, eos, remove_word_timing):
    """Native or numpy frame-aligned word scatter.  Returns
    (extended (n, n_frames) i32, word_ids (n, cap) i32, lengths (n,) i32).
    """
    n = len(sel)
    extended = np.zeros((n, n_frames), np.int32)
    word_ids = np.zeros((n, word_cap), np.int32)
    lengths = np.zeros((n,), np.int32)

    lib = get_lib()
    if lib is not None:
        ids_c = np.ascontiguousarray(ids, np.int32)
        starts_c = np.ascontiguousarray(starts, np.float32)
        offs_c = np.ascontiguousarray(offsets, np.int64)
        sel_c = np.ascontiguousarray(sel, np.int64)
        t0_c = np.ascontiguousarray(t0s, np.float64)
        se_c = np.ascontiguousarray(sample_ends, np.float64)
        fd_c = np.ascontiguousarray(frame_durs, np.float64)
        lib.gg_word_scatter(
            _ptr(ids_c, ctypes.c_int32), _ptr(starts_c, ctypes.c_float),
            _ptr(offs_c, ctypes.c_int64), _ptr(sel_c, ctypes.c_int64),
            n, _ptr(t0_c, ctypes.c_double), _ptr(se_c, ctypes.c_double),
            _ptr(fd_c, ctypes.c_double), n_frames, word_cap,
            sos, eos, int(remove_word_timing),
            _ptr(extended, ctypes.c_int32), _ptr(word_ids, ctypes.c_int32),
            _ptr(lengths, ctypes.c_int32), N_THREADS)
        return extended, word_ids, lengths

    # numpy fallback (identical semantics)
    for s in range(n):
        g = sel[s]
        w0, w1 = offsets[g], offsets[g + 1]
        t0, fd, send = t0s[s], frame_durs[s], sample_ends[s]
        sl_ids = ids[w0:w1]
        sl_starts = starts[w0:w1]
        idx = np.floor((sl_starts - t0) / fd).astype(np.int64)
        idx = np.maximum(idx, 0)
        valid = idx < n_frames
        if remove_word_timing:
            n_words = int(valid.sum())
            space = n_frames // (n_words + 1)
            for i in range(n_words):
                pos = (i + 1) * space
                if pos < n_frames:
                    extended[s, pos] = sl_ids[i]
        else:
            extended[s, idx[valid]] = sl_ids[valid]
        count = 0
        word_ids[s, count] = sos
        count += 1
        for w in range(len(sl_ids)):
            if count >= word_cap - 1 or sl_starts[w] > send:
                break
            word_ids[s, count] = sl_ids[w]
            count += 1
        word_ids[s, count] = eos
        lengths[s] = count + 1
    return extended, word_ids, lengths
