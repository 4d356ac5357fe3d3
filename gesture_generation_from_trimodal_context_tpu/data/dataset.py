"""Speech-motion dataset: cache-backed, fixed-shape batch assembly.

Behavioral contract: reference scripts/data_loader/lmdb_data_loader.py:57-194.
Per sample: clip the extended cached window to n_poses, fix the audio
length (symmetric pad), slice the spectrogram, build the frame-aligned
word-index sequence (``extend_word_seq``) and the SOS/EOS word list
(``words_to_tensor``), with the evenly-spaced placement variant when
training text-only (``remove_word_timing``).

TPU-first design: instead of a per-item Dataset + collate, batches are
assembled directly from memmap gathers into statically-shaped numpy
arrays (word lists padded to a dataset-wide constant so jitted consumers
compile exactly once).  ``BatchIterator`` shuffles, drops the remainder
(reference DataLoader drop_last=True) and prefetches on a background
thread.
"""

import logging
import os
import pickle
import queue
import threading

import numpy as np

from ..ops import audio as audio_ops
from .ggpack import GGPackStore, exists as ggpack_exists
from .preprocessor import DataPreprocessor
from .storage import open_raw_store
from .vocab import Vocab

CACHE_SUFFIX = "_ggpack_cache"


class SpeechMotionDataset:
    def __init__(self, data_dir, n_poses, subdivision_stride,
                 pose_resampling_fps, mean_pose, mean_dir_vec,
                 speaker_model=None, remove_word_timing=False):
        self.data_dir = data_dir
        self.n_poses = n_poses
        self.subdivision_stride = subdivision_stride
        self.skeleton_resampling_fps = pose_resampling_fps
        self.mean_dir_vec = np.asarray(mean_dir_vec)
        self.remove_word_timing = remove_word_timing

        self.expected_audio_length = \
            audio_ops.calc_audio_length_from_motion_length(
                n_poses, pose_resampling_fps)
        self.expected_spectrogram_length = \
            audio_ops.calc_spectrogram_length_from_motion_length(
                n_poses, pose_resampling_fps)
        self.lang_model = None

        logging.info("Reading data '%s'...", data_dir)
        cache_dir = data_dir + CACHE_SUFFIX
        if not ggpack_exists(cache_dir):
            logging.info("Creating the dataset cache...")
            mdv = self.mean_dir_vec
            if mdv.shape[-1] != 3:
                mdv = mdv.reshape(mdv.shape[:-1] + (-1, 3))
            n_poses_extended = int(round(n_poses * 1.25))  # margin
            DataPreprocessor(data_dir, cache_dir, n_poses_extended,
                             subdivision_stride, pose_resampling_fps,
                             mean_pose, mdv).run()
        else:
            logging.info("Found the cache %s", cache_dir)

        self.store = GGPackStore(cache_dir)
        self.n_samples = len(self.store)
        # fixed word capacity: dataset max + SOS/EOS, rounded up to 8
        cap = self.store.meta.get("max_words", 30) + 2
        self.word_cap = int(-(-cap // 8) * 8)

        if speaker_model is None or speaker_model == 0:
            precomputed = os.path.join(data_dir + "_speaker_model.pkl")
            if not os.path.exists(precomputed):
                self._make_speaker_model(data_dir, precomputed)
            else:
                with open(precomputed, "rb") as f:
                    self.speaker_model = pickle.load(f)
        else:
            self.speaker_model = speaker_model

    def __len__(self):
        return self.n_samples

    def raw_store(self):
        return open_raw_store(self.data_dir)

    def set_lang_model(self, lang_model):
        self.lang_model = lang_model

    def _make_speaker_model(self, data_dir, cache_path):
        logging.info("  building a speaker model...")
        speaker_model = Vocab("vid", insert_default_tokens=False)
        store = open_raw_store(data_dir)
        for video in store.iter_videos():
            speaker_model.index_word(video["vid"])
        store.close()
        logging.info("    indexed %d videos", speaker_model.n_words)
        self.speaker_model = speaker_model
        with open(cache_path, "wb") as f:
            pickle.dump(speaker_model, f)

    # ---- batch assembly -------------------------------------------------

    def _word_tensors(self, idx, start_time, sample_end_time):
        """(extended_word_indices (n_poses,), word_ids (cap,), n_words).

        Both tensors use the clipped window end (reference
        lmdb_data_loader.py:164-165 passes sample_end_time to both)."""
        lang = self.lang_model
        words = self.store.words[idx]
        n_frames = self.n_poses
        frame_duration = (sample_end_time - start_time) / n_frames

        extended = np.zeros(n_frames, np.int32)
        if self.remove_word_timing:
            n_words = 0
            for word in words:
                w_idx = max(0, int(np.floor(
                    (word[1] - start_time) / frame_duration)))
                if w_idx < n_frames:
                    n_words += 1
            space = int(n_frames / (n_words + 1))
            for i in range(n_words):
                extended[(i + 1) * space] = lang.get_word_index(words[i][0])
        else:
            for word in words:
                w_idx = max(0, int(np.floor(
                    (word[1] - start_time) / frame_duration)))
                if w_idx < n_frames:
                    extended[w_idx] = lang.get_word_index(word[0])

        ids = [lang.SOS_token]
        for word in words:
            if sample_end_time is not None and word[1] > sample_end_time:
                break
            ids.append(lang.get_word_index(word[0]))
        ids.append(lang.EOS_token)
        ids = ids[:self.word_cap]
        padded = np.zeros(self.word_cap, np.int32)
        padded[:len(ids)] = ids
        return extended, padded, len(ids)

    def make_batch(self, indices):
        """Assemble a statically-shaped batch dict from sample indices."""
        idx = np.asarray(indices)
        n = self.n_poses
        vec = self.store.gather("vec_seq", idx)[:, :n]
        pose = self.store.gather("pose_seq", idx)[:, :n]
        audio_raw = self.store.gather("audio", idx)
        spec = self.store.gather("spectrogram", idx)
        aux = self.store.gather("aux_num", idx)  # start_f, end_f, start_t, end_t

        b = len(idx)
        # fix audio length (cached window is the extended one)
        if audio_raw.shape[1] >= self.expected_audio_length:
            audio_fixed = audio_raw[:, :self.expected_audio_length]
        else:
            pad = self.expected_audio_length - audio_raw.shape[1]
            audio_fixed = np.pad(audio_raw, ((0, 0), (0, pad)),
                                 mode="symmetric")
        spec_fixed = spec[:, :, :self.expected_spectrogram_length]

        ext_words = np.zeros((b, n), np.int32)
        word_ids = np.zeros((b, self.word_cap), np.int32)
        word_lengths = np.zeros((b,), np.int32)
        vids = []
        for j, i in enumerate(idx):
            start_t, end_t = aux[j, 2], aux[j, 3]
            duration = end_t - start_t
            n_cached = self.store.arrays["vec_seq"].shape[1]
            sample_end_time = start_t + duration * n / n_cached
            ew, wi, wl = self._word_tensors(int(i), start_t, sample_end_time)
            ext_words[j], word_ids[j], word_lengths[j] = ew, wi, wl
            vids.append(self.store.vids[int(i)])

        return {
            "word_seq": word_ids,
            "word_lengths": word_lengths,
            "in_text": ext_words,
            "pose_seq": pose.reshape(b, n, -1).astype(np.float32),
            "target_vec": vec.reshape(b, n, -1).astype(np.float32),
            "in_audio": audio_fixed.astype(np.float32),
            "in_spec": spec_fixed.astype(np.float32),
            "aux_vids": vids,
            "aux_times": aux[:, 2:4],
        }


class BatchIterator:
    """Shuffling, remainder-dropping, prefetching batch source."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 prefetch=2, make_batch=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch
        self.make_batch = make_batch or dataset.make_batch

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        n_batches = len(self)
        if self.prefetch <= 0:
            for bi in range(n_batches):
                yield self.make_batch(
                    order[bi * self.batch_size:(bi + 1) * self.batch_size])
            return

        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bi in range(n_batches):
                    q.put(self.make_batch(
                        order[bi * self.batch_size:
                              (bi + 1) * self.batch_size]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
