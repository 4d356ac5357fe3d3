"""Native C++ batch assembler vs numpy-fallback equivalence tests."""

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.native import loader


requires_native = pytest.mark.skipif(not loader.native_available(),
                                     reason="no C++ toolchain")


@requires_native
def test_gather_matches_numpy(rng):
    data = rng.randn(50, 42, 9, 3).astype(np.float32)
    idx = np.array([3, 17, 0, 49, 17], np.int64)
    out = loader.gather(data, idx, copy_count=34)
    np.testing.assert_array_equal(out, data[idx, :34])
    full = loader.gather(data, idx)
    np.testing.assert_array_equal(full, data[idx])


@requires_native
def test_gather_1d_and_2d(rng):
    data2 = rng.randn(20, 100).astype(np.float32)
    idx = np.array([5, 1, 19], np.int64)
    np.testing.assert_array_equal(loader.gather(data2, idx, 64),
                                  data2[idx, :64])


@requires_native
def test_f16_widening_gather(rng):
    data = rng.randn(10, 128, 86).astype(np.float16)
    idx = np.array([0, 7, 3], np.int64)
    out = loader.gather_f16_as_f32(data, idx)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data[idx].astype(np.float32))
    # special values survive widening
    data[0, 0, 0] = np.float16(0)
    data[0, 0, 1] = np.float16(6e-8)   # subnormal
    data[0, 0, 2] = np.float16(-65504)
    out = loader.gather_f16_as_f32(data, np.array([0], np.int64))
    np.testing.assert_array_equal(out[0, 0, :3],
                                  data[0, 0, :3].astype(np.float32))


def _scatter_both(remove_word_timing, lib_first):
    ids = np.array([10, 11, 12, 13, 14, 15], np.int32)
    starts = np.array([0.1, 0.5, 1.2, 0.2, 1.9, 2.4], np.float32)
    offsets = np.array([0, 3, 6], np.int64)
    sel = np.array([0, 1], np.int64)
    t0s = np.array([0.0, 0.0], np.float64)
    ends = np.array([1.0, 2.0], np.float64)
    fds = np.array([1.0 / 34, 2.0 / 34], np.float64)

    saved = loader._lib
    try:
        if not lib_first:
            loader._lib = None
        return loader.word_scatter(ids, starts, offsets, sel, t0s, ends,
                                   fds, 34, 16, 1, 2, remove_word_timing)
    finally:
        loader._lib = saved


@requires_native
@pytest.mark.parametrize("rwt", [False, True])
def test_word_scatter_native_matches_numpy(rwt):
    e1, w1, l1 = _scatter_both(rwt, lib_first=True)
    e2, w2, l2 = _scatter_both(rwt, lib_first=False)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(l1, l2)


def test_word_scatter_semantics():
    e, w, lens = _scatter_both(False, lib_first=loader.native_available())
    # sample 0: words at 0.1,0.5 in [0,1] end=1.0 -> frames 3, 17;
    # word at 1.2 > end counted in break for word_seq
    assert e[0, 3] == 10 and e[0, 17] == 11
    # word at 1.2: floor(1.2/ (1/34)) = 40 >= 34 -> not placed
    assert (e[0] != 0).sum() == 2
    # word list: SOS, 10, 11 (1.2 > 1.0 breaks), EOS
    assert list(w[0, :4]) == [1, 10, 11, 2]
    assert lens[0] == 4
    # sample 1: starts 0.2,1.9 < 2.0; 2.4 breaks
    assert list(w[1, :4]) == [1, 13, 14, 2]
