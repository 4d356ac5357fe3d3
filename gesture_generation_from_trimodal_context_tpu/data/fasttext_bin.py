"""Pure-python reader for fastText ``.bin`` subword models.

The TED recipe's word embeddings come from
``crawl-300d-2M-subword.bin`` (reference config/multimodal_context.yml:8,
loaded via the fasttext package in reference model/vocab.py:70-84).  The
fasttext package is not available in TPU images, so this module parses
the binary format directly (fastText FILEFORMAT_MAGIC 793712314,
version 12 — fastText >= 0.9) and reproduces ``get_word_vector``:

- in-vocab word: mean of the word's input row and all its character
  n-gram rows,
- OOV word: mean of the character n-gram rows alone,
- n-grams: substrings of "<word>" with length minn..maxn, mapped to
  rows nwords + fnv1a(ngram) % bucket (FNV-1a 32-bit, the fastText hash).

Quantized models (.ftz) are not supported (raise with a clear message).
Memory: the input matrix is np.memmap'd, so the 7 GB crawl model loads
lazily.
"""

import struct

import numpy as np

MAGIC = 793712314
SUPPORTED_VERSIONS = (11, 12)
EOS = "</s>"
BOW, EOW = "<", ">"


def _read_str(f):
    out = bytearray()
    while True:
        c = f.read(1)
        if not c or c == b"\x00":
            break
        out += c
    return out.decode("utf-8", errors="replace")


def fnv1a(data):
    """fastText's 32-bit FNV-1a over the ngram bytes (Dictionary::hash).

    fastText casts each byte through int8_t (sign extension) before the
    xor; reproduce that."""
    h = 2166136261
    for b in data.encode("utf-8"):
        signed = b - 256 if b > 127 else b
        h = (h ^ (signed & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


class FastTextBin:
    def __init__(self, path):
        self.path = path
        with open(path, "rb") as f:
            magic, version = struct.unpack("<ii", f.read(8))
            if magic != MAGIC:
                raise ValueError("not a fastText .bin model (magic %d)"
                                 % magic)
            if version not in SUPPORTED_VERSIONS:
                raise ValueError("unsupported fastText version %d" % version)
            self.version = version

            # Args: 12 int32 + 1 double, in declaration order
            (self.dim, self.ws, self.epoch, self.min_count, self.neg,
             self.word_ngrams, self.loss, self.model, self.bucket,
             self.minn, self.maxn, self.lr_update_rate) = struct.unpack(
                "<12i", f.read(48))
            (self.t,) = struct.unpack("<d", f.read(8))

            # Dictionary
            size, self.nwords, self.nlabels = struct.unpack(
                "<3i", f.read(12))
            self.ntokens, = struct.unpack("<q", f.read(8))
            self.pruneidx_size, = struct.unpack("<q", f.read(8))
            self.word2id = {}
            for i in range(size):
                word = _read_str(f)
                f.read(8)         # count (int64)
                f.read(1)         # entry type (int8)
                self.word2id[word] = i
            for _ in range(max(0, self.pruneidx_size)):
                f.read(8)         # (int32, int32) pruning pairs

            if version >= 12:
                quant, = struct.unpack("<?", f.read(1))
                if quant:
                    raise NotImplementedError(
                        "quantized fastText models (.ftz) not supported")
            rows, cols = struct.unpack("<qq", f.read(16))
            if cols != self.dim:
                raise ValueError("dim mismatch: %d vs %d" % (cols, self.dim))
            self._matrix_offset = f.tell()
            self._rows = rows

        self.input_matrix = np.memmap(
            path, dtype="<f4", mode="r", offset=self._matrix_offset,
            shape=(self._rows, self.dim))

    def subword_ids(self, word):
        """Character n-gram rows for "<word>" (Dictionary::computeSubwords).

        fastText iterates utf-8 characters; n-grams of length minn..maxn
        are hashed, except lone boundary 1-grams ('<' at start, '>' at
        end).  The full "<word>" token IS an n-gram when short enough."""
        ids = []
        token = BOW + word + EOW
        chars = list(token)
        total = len(chars)
        for start in range(total):
            for n in range(1, self.maxn + 1):
                end = start + n
                if end > total:
                    break
                if n < self.minn:
                    continue
                if n == 1 and (start == 0 or end == total):
                    continue
                ngram = "".join(chars[start:end])
                ids.append(self.nwords + fnv1a(ngram) % self.bucket)
        return ids

    def get_word_vector(self, word):
        """Mean of the word row (if in vocab) and its n-gram rows."""
        rows = []
        wid = self.word2id.get(word)
        if wid is not None and wid < self.nwords:
            rows.append(wid)
        if self.maxn > 0:
            rows.extend(self.subword_ids(word))
        if not rows:
            return np.zeros(self.dim, np.float32)
        vec = self.input_matrix[np.asarray(rows, np.int64)].sum(axis=0)
        return (vec / len(rows)).astype(np.float32)


def load_model(path):
    return FastTextBin(path)
