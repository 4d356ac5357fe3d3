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

Quantized models (.ftz) are supported: the product-quantized input
matrix (QuantMatrix/ProductQuantizer serialization) decodes rows
lazily through per-subquantizer centroid tables, with optional qnorm
rescaling and pruned-dictionary ngram remapping (Dictionary::pushHash).
Memory: dense matrices are np.memmap'd (the 7 GB crawl model loads
lazily); quantized codes are memmap'd likewise.
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


class _QuantInputMatrix:
    """Product-quantized input matrix of a fastText .ftz model
    (QuantMatrix::load + ProductQuantizer::load).

    Stream layout: qnorm bool, m/n int64s, codesize int32, codes bytes,
    then the PQ (dim/nsubq/dsub/lastdsub int32s + dim*256 float32
    centroids); with qnorm, m norm codes + a 1-d norm PQ follow.  Row i
    decodes as the concatenation of each subquantizer's centroid row
    ``codes[i, m]`` (last block is ``lastdsub`` wide), scaled by the
    dequantized norm when qnorm is set (QuantMatrix::addRowToVector).
    Codes stay memmap'd; only requested rows materialize."""

    KSUB = 256  # ProductQuantizer ksub_ (8-bit codes)

    def __init__(self, path, offset):
        with open(path, "rb") as f:
            f.seek(offset)
            qnorm, = struct.unpack("<?", f.read(1))
            m, n = struct.unpack("<qq", f.read(16))
            codesize, = struct.unpack("<i", f.read(4))
            codes_offset = f.tell()
            f.seek(codesize, 1)
            dim, nsubq, dsub, lastdsub = struct.unpack("<4i", f.read(16))
            if codesize != m * nsubq:
                raise ValueError("quantized codesize %d != m*nsubq %d"
                                 % (codesize, m * nsubq))
            cents = np.frombuffer(f.read(4 * dim * self.KSUB), dtype="<f4")
            self.norms = None
            if qnorm:
                norm_codes = np.frombuffer(f.read(m), dtype=np.uint8)
                ndim, _, _, _ = struct.unpack("<4i", f.read(16))
                ncents = np.frombuffer(f.read(4 * ndim * self.KSUB),
                                       dtype="<f4")
                self.norms = ncents[norm_codes]  # norm PQ is 1-d
            self.end_offset = f.tell()
        self.rows, self.dim = m, n
        self.nsubq = nsubq
        self.codes = np.memmap(path, dtype=np.uint8, mode="r",
                               offset=codes_offset, shape=(m, nsubq))
        # per-subquantizer centroid tables (ProductQuantizer::get_centroids:
        # block m starts at m*ksub*dsub; the last block is lastdsub wide)
        self.subs = []
        for mi in range(nsubq):
            d = lastdsub if mi == nsubq - 1 else dsub
            start = mi * self.KSUB * dsub
            self.subs.append(
                cents[start:start + self.KSUB * d].reshape(self.KSUB, d))

    def __getitem__(self, rows):
        rows = np.asarray(rows)
        code = np.asarray(self.codes[rows])
        out = np.concatenate(
            [self.subs[mi][code[:, mi]] for mi in range(self.nsubq)],
            axis=1)
        if self.norms is not None:
            out = out * self.norms[rows][:, None]
        return out


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
            # pruned-dictionary map (quantize --cutoff): ngram hash id ->
            # compacted input row (Dictionary::load pruneidx_ pairs);
            # -1 = unpruned, 0 = all ngram rows pruned
            self.pruneidx = {}
            for _ in range(max(0, self.pruneidx_size)):
                first, second = struct.unpack("<ii", f.read(8))
                self.pruneidx[first] = second

            self.quantized = False
            if version >= 12:
                quant, = struct.unpack("<?", f.read(1))
                self.quantized = bool(quant)
            if self.quantized:
                qm = _QuantInputMatrix(path, f.tell())
                if qm.dim != self.dim:
                    raise ValueError("dim mismatch: %d vs %d"
                                     % (qm.dim, self.dim))
                self.input_matrix = qm
                self._rows = qm.rows
                return
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
                h = fnv1a(ngram) % self.bucket
                # pruned dictionaries remap (or drop) ngram rows
                # (Dictionary::pushHash)
                if self.pruneidx_size == 0:
                    continue
                if self.pruneidx_size > 0:
                    if h not in self.pruneidx:
                        continue
                    h = self.pruneidx[h]
                ids.append(self.nwords + h)
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
