"""Word / speaker-ID vocabularies and pretrained word-vector loading.

Behavioral contract: reference scripts/model/vocab.py:8-130 and
scripts/utils/vocab_utils.py:11-57.

- ``Vocab``: word<->index maps with PAD=0/SOS=1/EOS=2/UNK=3 (or UNK-only
  when ``insert_default_tokens=False`` — the speaker-ID vocabulary mode).
- Embedding matrices: special/OOV words get N(0, 1/sqrt(dim)) vectors;
  known words come from a pretrained source.  Sources supported here:
  fastText ``.bin`` subword models if the optional ``fasttext`` package is
  importable (it is not baked into this environment), the ``.vec`` text
  format (pure-python parser), and ``.npz`` caches written by this module.
- ``build_vocab``: index every transcript word across datasets, load
  vectors, pickle the result (the checkpoint format embeds these vocabs
  so synthesis is self-contained, like the reference).
"""

import logging
import os
import pickle

import numpy as np


class Vocab:
    PAD_token = 0
    SOS_token = 1
    EOS_token = 2
    UNK_token = 3

    def __init__(self, name, insert_default_tokens=True):
        self.name = name
        self.trimmed = False
        self.word_embedding_weights = None
        self.reset_dictionary(insert_default_tokens)

    def reset_dictionary(self, insert_default_tokens=True):
        self.word2index = {}
        self.word2count = {}
        if insert_default_tokens:
            self.index2word = {self.PAD_token: "<PAD>", self.SOS_token: "<SOS>",
                               self.EOS_token: "<EOS>", self.UNK_token: "<UNK>"}
        else:
            self.index2word = {self.UNK_token: "<UNK>"}
        self.n_words = len(self.index2word)

    def index_word(self, word):
        if word not in self.word2index:
            self.word2index[word] = self.n_words
            self.word2count[word] = 1
            self.index2word[self.n_words] = word
            self.n_words += 1
        else:
            self.word2count[word] += 1

    def add_vocab(self, other_vocab):
        for word in other_vocab.word2count:
            self.index_word(word)

    def trim(self, min_count):
        """Drop words rarer than min_count and re-index."""
        if self.trimmed:
            return
        self.trimmed = True
        keep_words = [w for w, c in self.word2count.items() if c >= min_count]
        logging.info("    word trimming, kept %s / %s = %.4f",
                     len(keep_words), len(self.word2index),
                     len(keep_words) / max(1, len(self.word2index)))
        self.reset_dictionary()
        for word in keep_words:
            self.index_word(word)

    def get_word_index(self, word):
        return self.word2index.get(word, self.UNK_token)

    def load_word_vectors(self, pretrained_path, embedding_dim=300):
        """Build the (n_words, dim) embedding matrix."""
        logging.info("  loading word vectors from '%s'...", pretrained_path)
        init_sd = 1 / np.sqrt(embedding_dim)
        weights = np.random.normal(
            0, scale=init_sd, size=[self.n_words, embedding_dim]).astype(
                np.float32)

        if pretrained_path and os.path.exists(pretrained_path):
            if pretrained_path.endswith((".bin", ".ftz")):
                weights = self._load_fasttext_bin(
                    pretrained_path, weights, embedding_dim)
            elif pretrained_path.endswith(".npz"):
                cached = np.load(pretrained_path)
                words, vecs = cached["words"], cached["vectors"]
                lookup = {w: i for i, w in enumerate(words.tolist())}
                for word, idx in self.word2index.items():
                    j = lookup.get(word)
                    if j is not None:
                        weights[idx] = vecs[j]
            else:
                weights = self._load_vec_text(
                    pretrained_path, weights, embedding_dim)
        elif pretrained_path:
            logging.warning(
                "  word-vector file '%s' not found; using random init "
                "(training still runs; embeddings are learned)",
                pretrained_path)

        self.word_embedding_weights = weights

    def _load_fasttext_bin(self, path, weights, dim):
        try:
            import fasttext  # optional dependency
            word_model = fasttext.load_model(path)
        except ImportError:
            # built-in pure-python reader (subword-aware, fastText>=0.9
            # format) — no fasttext package needed (data/fasttext_bin.py)
            from .fasttext_bin import load_model
            logging.info("  using the built-in fastText .bin reader")
            word_model = load_model(path)
        for word, idx in self.word2index.items():
            weights[idx] = word_model.get_word_vector(word)
        return weights

    def _load_vec_text(self, path, weights, dim):
        """Parse the .vec text format (word v1 v2 ... vN per line)."""
        num_found = 0
        with open(path, encoding="utf-8") as f:
            for line_raw in f:
                parts = line_raw.split()
                if len(parts) != dim + 1:
                    continue
                word = parts[0]
                idx = self.word2index.get(word)
                if idx is not None:
                    try:
                        weights[idx] = np.array(parts[1:], dtype=np.float32)
                        num_found += 1
                    except ValueError:
                        continue
        logging.info("  %d / %d word vectors found", num_found,
                     len(self.word2index))
        return weights


def export_vectors_npz(vocab, out_path):
    """Save this vocab's embedding matrix as a portable .npz cache."""
    words = np.array(list(vocab.word2index.keys()))
    vecs = np.stack([vocab.word_embedding_weights[vocab.word2index[w]]
                     for w in words])
    np.savez_compressed(out_path, words=words, vectors=vecs)


def index_words_from_store(lang_model, store):
    """Index every transcript word in a raw clip store
    (reference vocab_utils.py:38-52)."""
    for video in store.iter_videos():
        for clip in video["clips"]:
            for word_info in clip["words"]:
                lang_model.index_word(word_info[0])
    logging.info("    indexed %d words", lang_model.n_words)


def build_vocab(name, dataset_list, cache_path, word_vec_path=None,
                feat_dim=None):
    """Build (or load from cache) the word vocabulary over all splits
    (reference vocab_utils.py:11-35)."""
    logging.info("  building a language model...")
    if not os.path.exists(cache_path):
        lang_model = Vocab(name)
        for dataset in dataset_list:
            logging.info("    indexing words from %s", dataset.data_dir)
            index_words_from_store(lang_model, dataset.raw_store())
        if word_vec_path is not None:
            lang_model.load_word_vectors(word_vec_path, feat_dim)
        with open(cache_path, "wb") as f:
            pickle.dump(lang_model, f)
    else:
        logging.info("    loaded from %s", cache_path)
        with open(cache_path, "rb") as f:
            lang_model = pickle.load(f)
        if word_vec_path is None:
            lang_model.word_embedding_weights = None
        elif (lang_model.word_embedding_weights is not None and
              lang_model.word_embedding_weights.shape[0] != lang_model.n_words):
            raise RuntimeError("cached vocab does not match embeddings")
    return lang_model
