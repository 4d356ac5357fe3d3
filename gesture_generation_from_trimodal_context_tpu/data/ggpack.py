"""GGPack: the fixed-shape training-sample cache.

TPU-first replacement for the reference's second-level LMDB cache
(reference lmdb_data_loader.py:75-113).  Every sample has identical
shapes, so instead of per-item deserialization we store one contiguous
binary file per field and read with zero-copy numpy memmaps; a training
batch is a single fancy-index gather per field (optionally done by the
C++ gather kernel in native/).  Ragged per-sample word lists live in a
sidecar msgpack file loaded once at open.

Layout of <dir>/:
  meta.json                 shapes, dtypes, counts, window params
  pose_seq.bin              (S, T_ext, J, 3)   float32
  vec_seq.bin               (S, T_ext, B, 3)   float32
  audio.bin                 (S, A)             float32
  spectrogram.bin           (S, M, L)          float16
  aux_num.bin               (S, 4)             float64
                            [start_frame, end_frame, start_time, end_time]
  words.msgpack             [[ [word, start, end], ... ], ...]
  vids.msgpack              [vid, ...]
"""

import json
import os

import msgpack
import numpy as np

_FIELDS = ("pose_seq", "vec_seq", "audio", "spectrogram", "aux_num")
_DTYPES = {"pose_seq": np.float32, "vec_seq": np.float32,
           "audio": np.float32, "spectrogram": np.float16,
           "aux_num": np.float64}


class GGPackWriter:
    """Streaming writer: constant memory regardless of dataset size."""

    def __init__(self, path, meta=None):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.meta = dict(meta or {})
        self._files = {f: open(os.path.join(path, f + ".bin"), "wb")
                       for f in _FIELDS}
        self._shapes = {}
        self._words = []
        self._vids = []
        self.n_samples = 0
        self.max_words = 0

    def add_sample(self, words, poses, vec, audio, spectrogram, aux):
        arrays = {
            "pose_seq": np.ascontiguousarray(poses, _DTYPES["pose_seq"]),
            "vec_seq": np.ascontiguousarray(vec, _DTYPES["vec_seq"]),
            "audio": np.ascontiguousarray(audio, _DTYPES["audio"]),
            "spectrogram": np.ascontiguousarray(spectrogram,
                                                _DTYPES["spectrogram"]),
            "aux_num": np.array([aux["start_frame_no"], aux["end_frame_no"],
                                 aux["start_time"], aux["end_time"]],
                                np.float64),
        }
        for name, arr in arrays.items():
            if name not in self._shapes:
                self._shapes[name] = arr.shape
            elif self._shapes[name] != arr.shape:
                raise ValueError("inconsistent %s shape %r vs %r" % (
                    name, arr.shape, self._shapes[name]))
            self._files[name].write(arr.tobytes())
        self._words.append([[str(w[0]), float(w[1]), float(w[2])]
                            for w in words])
        self.max_words = max(self.max_words, len(words))
        self._vids.append(str(aux["vid"]))
        self.n_samples += 1

    def close(self):
        for f in self._files.values():
            f.close()
        with open(os.path.join(self.path, "words.msgpack"), "wb") as f:
            f.write(msgpack.packb(self._words, use_bin_type=True))
        with open(os.path.join(self.path, "vids.msgpack"), "wb") as f:
            f.write(msgpack.packb(self._vids, use_bin_type=True))
        meta = dict(self.meta)
        meta.update({
            "n_samples": self.n_samples,
            "max_words": self.max_words,
            "shapes": {k: list(v) for k, v in self._shapes.items()},
            "dtypes": {k: np.dtype(v).str for k, v in _DTYPES.items()},
        })
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(meta, f)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class GGPackStore:
    """Zero-copy reader over the memmapped cache."""

    def __init__(self, path):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.n_samples = self.meta["n_samples"]
        self.arrays = {}
        for name in _FIELDS:
            shape = tuple(self.meta["shapes"].get(name, ()))
            if not shape:
                continue
            full_shape = (self.n_samples,) + shape
            self.arrays[name] = np.memmap(
                os.path.join(path, name + ".bin"), mode="r",
                dtype=np.dtype(self.meta["dtypes"][name]), shape=full_shape)
        with open(os.path.join(path, "words.msgpack"), "rb") as f:
            self.words = msgpack.unpackb(f.read(), raw=False)
        with open(os.path.join(path, "vids.msgpack"), "rb") as f:
            self.vids = msgpack.unpackb(f.read(), raw=False)

    def __len__(self):
        return self.n_samples

    def gather(self, name, indices):
        """Batched fixed-shape read: one gather per field."""
        return np.asarray(self.arrays[name][indices])


def exists(path):
    return os.path.exists(os.path.join(path, "meta.json"))
