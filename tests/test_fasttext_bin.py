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
