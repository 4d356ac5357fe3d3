"""Pure-python fastText .bin reader tests against a hand-built model file
(format: magic/version/args/dictionary/input-matrix, fastText >= 0.9)."""

import struct

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.data.fasttext_bin import (
    FastTextBin, fnv1a)
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

DIM = 8
BUCKET = 100
MINN, MAXN = 3, 6
WORDS = ["hello", "world", "ai"]


def _write_bin(path, rng):
    nwords = len(WORDS)
    rows = nwords + BUCKET
    matrix = rng.randn(rows, DIM).astype(np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", 793712314, 12))          # magic, version
        f.write(struct.pack("<12i", DIM, 5, 5, 1, 5, 1, 1, 1, BUCKET,
                            MINN, MAXN, 100))               # args
        f.write(struct.pack("<d", 1e-4))                    # t
        f.write(struct.pack("<3i", nwords, nwords, 0))      # size,nwords,nlabels
        f.write(struct.pack("<q", 1000))                    # ntokens
        f.write(struct.pack("<q", -1))                      # pruneidx_size
        for w in WORDS:
            f.write(w.encode() + b"\x00")
            f.write(struct.pack("<q", 10))                  # count
            f.write(struct.pack("<b", 0))                   # type word
        f.write(struct.pack("<?", False))                   # quant_input
        f.write(struct.pack("<qq", rows, DIM))
        f.write(matrix.tobytes())
        # output matrix (unused by the reader) omitted
    return matrix


@pytest.fixture
def model(tmp_path):
    rng = np.random.RandomState(0)
    matrix = _write_bin(str(tmp_path / "m.bin"), rng)
    return FastTextBin(str(tmp_path / "m.bin")), matrix


def test_header_and_vocab(model):
    m, _ = model
    assert m.dim == DIM and m.bucket == BUCKET
    assert m.minn == MINN and m.maxn == MAXN
    assert m.nwords == 3
    assert m.word2id["hello"] == 0 and m.word2id["ai"] == 2


def test_fnv1a_reference_values():
    # FNV-1a 32-bit with sign-extended bytes (the fastText Dictionary hash)
    assert fnv1a("") == 2166136261
    assert fnv1a("a") == 3826002220
    assert fnv1a("abc") == 440920331


def test_in_vocab_vector_is_mean_of_word_and_ngrams(model):
    m, matrix = model
    vec = m.get_word_vector("ai")
    # "<ai>" has chars < a i >; n-grams of len 3..4: "<ai","ai>","<ai>"
    expected_ids = [0 + 2]  # word row
    for ng in ("<ai", "ai>", "<ai>"):
        expected_ids.append(3 + fnv1a(ng) % BUCKET)
    expected = matrix[expected_ids].mean(axis=0)
    np.testing.assert_allclose(vec, expected, rtol=1e-6)


def test_oov_vector_uses_ngrams_only(model):
    m, matrix = model
    vec = m.get_word_vector("xy")
    ids = [3 + fnv1a(ng) % BUCKET for ng in ("<xy", "xy>", "<xy>")]
    expected = matrix[ids].mean(axis=0)
    np.testing.assert_allclose(vec, expected, rtol=1e-6)
    assert not np.allclose(vec, 0)


def test_unicode_ngrams(model):
    m, _ = model
    # multi-byte chars count as single characters in n-gram windows
    ids = m.subword_ids("héllo")
    assert len(ids) > 0
    v = m.get_word_vector("héllo")
    assert np.isfinite(v).all()


# ---------------------------------------------------------------------------
# quantized (.ftz) models: product-quantized input matrix + pruned dict
# ---------------------------------------------------------------------------

QDSUB, QLASTDSUB, QNSUBQ = 3, 2, 3  # DIM 8 = 3 + 3 + 2


def _write_quant_bin(path, rng, qnorm=True, pruneidx=None, n_kept=4):
    """Hand-built .ftz: QuantMatrix (codes + ProductQuantizer centroids,
    optional qnorm) and a pruned dictionary (ngram hash -> kept row)."""
    nwords = len(WORDS)
    rows = nwords + n_kept
    cents = rng.randn(DIM * 256).astype(np.float32)
    codes = rng.randint(0, 256, (rows, QNSUBQ)).astype(np.uint8)
    norm_codes = rng.randint(0, 256, rows).astype(np.uint8)
    ncents = rng.randn(256).astype(np.float32)
    pruneidx = pruneidx or {}
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", 793712314, 12))
        f.write(struct.pack("<12i", DIM, 5, 5, 1, 5, 1, 1, 1, BUCKET,
                            MINN, MAXN, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", nwords, nwords, 0))
        f.write(struct.pack("<q", 1000))
        f.write(struct.pack("<q", len(pruneidx)))   # pruneidx_size
        for w in WORDS:
            f.write(w.encode() + b"\x00")
            f.write(struct.pack("<q", 10))
            f.write(struct.pack("<b", 0))
        for k in sorted(pruneidx):
            f.write(struct.pack("<ii", k, pruneidx[k]))
        f.write(struct.pack("<?", True))            # quant_input
        # QuantMatrix: qnorm, m, n, codesize, codes, pq[, norms, npq]
        f.write(struct.pack("<?", qnorm))
        f.write(struct.pack("<qq", rows, DIM))
        f.write(struct.pack("<i", rows * QNSUBQ))
        f.write(codes.tobytes())
        f.write(struct.pack("<4i", DIM, QNSUBQ, QDSUB, QLASTDSUB))
        f.write(cents.tobytes())
        if qnorm:
            f.write(norm_codes.tobytes())
            f.write(struct.pack("<4i", 1, 1, 1, 1))
            f.write(ncents.tobytes())
    norms = ncents[norm_codes] if qnorm else None
    return cents, codes, norms


def _decode_rows(cents, codes, norms, ids):
    """Reference PQ decode (ProductQuantizer::addcode layout)."""
    out = []
    for i in ids:
        parts = []
        for m in range(QNSUBQ):
            d = QLASTDSUB if m == QNSUBQ - 1 else QDSUB
            start = m * 256 * QDSUB
            table = cents[start:start + 256 * d].reshape(256, d)
            parts.append(table[codes[i, m]])
        v = np.concatenate(parts)
        if norms is not None:
            v = v * norms[i]
        out.append(v)
    return np.stack(out)


@pytest.mark.parametrize("qnorm", [True, False])
def test_quantized_model_vectors(tmp_path, qnorm):
    rng = np.random.RandomState(7)
    path = str(tmp_path / "m.ftz")
    ngrams = ["<ai", "ai>", "<ai>"]
    hashes = [fnv1a(ng) % BUCKET for ng in ngrams]
    # keep the first two ngram rows, prune the third
    pruneidx = {hashes[0]: 0, hashes[1]: 1}
    cents, codes, norms = _write_quant_bin(path, rng, qnorm=qnorm,
                                           pruneidx=pruneidx)
    m = FastTextBin(path)
    assert m.quantized
    expected_ids = [2, 3 + 0, 3 + 1]  # word row "ai" + 2 kept ngram rows
    expected = _decode_rows(cents, codes, norms, expected_ids).mean(axis=0)
    np.testing.assert_allclose(m.get_word_vector("ai"), expected,
                               rtol=1e-5, atol=1e-6)


def test_quantized_pruneidx_zero_drops_all_ngrams(tmp_path):
    """pruneidx_size == 0: every ngram row was pruned away; in-vocab
    words decode from the word row alone (Dictionary::pushHash early
    return)."""
    rng = np.random.RandomState(8)
    path = str(tmp_path / "m.ftz")
    cents, codes, norms = _write_quant_bin(path, rng, qnorm=True,
                                           pruneidx={})
    m = FastTextBin(path)
    assert m.subword_ids("ai") == []
    expected = _decode_rows(cents, codes, norms, [2])[0]
    np.testing.assert_allclose(m.get_word_vector("ai"), expected,
                               rtol=1e-5, atol=1e-6)
    # fully OOV: no rows at all -> zero vector
    np.testing.assert_array_equal(m.get_word_vector("qqq"),
                                  np.zeros(DIM, np.float32))


def test_vocab_loads_ftz(tmp_path):
    """Vocab dispatches .ftz paths to the binary reader (quantized)."""
    rng = np.random.RandomState(9)
    path = str(tmp_path / "m.ftz")
    cents, codes, norms = _write_quant_bin(
        path, rng, pruneidx={h: h % 4 for h in range(0, BUCKET, 7)})
    v = Vocab("words")
    v.index_word("hello")
    v.load_word_vectors(path, DIM)
    m = FastTextBin(path)
    np.testing.assert_allclose(
        v.word_embedding_weights[v.word2index["hello"]],
        m.get_word_vector("hello"), rtol=1e-6)


def test_vocab_integration(tmp_path):
    rng = np.random.RandomState(1)
    path = str(tmp_path / "m.bin")
    matrix = _write_bin(path, rng)
    v = Vocab("words")
    v.index_word("hello")
    v.index_word("zzz_oov")
    v.load_word_vectors(path, DIM)
    assert v.word_embedding_weights.shape == (v.n_words, DIM)
    m = FastTextBin(path)
    np.testing.assert_allclose(
        v.word_embedding_weights[v.word2index["hello"]],
        m.get_word_vector("hello"), rtol=1e-6)
