"""Cache builder: raw clip store -> fixed-window GGPack sample cache.

Behavioral contract: reference scripts/data_loader/data_preprocessor.py:16-188.
Per clip: resample skeletons to the target fps, slide a window of
n_poses(_extended) with the subdivision stride
(num_subdivision = floor((K - N)/S) + 1, reference :89-91), slice the
spectrogram/raw audio proportionally with symmetric end padding
(:106-128), keep windows with >= 2 words that pass the motion filter,
convert to mean-centered unit direction vectors, and store.
"""

import logging
import math
from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from ..ops import audio as audio_ops
from ..ops import skeleton
from .ggpack import GGPackWriter
from .motion_filter import MotionFilter
from .storage import open_raw_store


def get_words_in_time_range(word_list, start_time, end_time):
    """Words overlapping [start_time, end_time)
    (reference data_preprocessor.py:173-188)."""
    words = []
    for word in word_list:
        word_s, word_e = word[1], word[2]
        if word_s >= end_time:
            break
        if word_e <= start_time:
            continue
        words.append(word)
    return words


def normalize_dir_vec(dir_vec, mean_dir_vec):
    return dir_vec - mean_dir_vec


class DataPreprocessor:
    def __init__(self, clip_store_dir, out_dir, n_poses, subdivision_stride,
                 pose_resampling_fps, mean_pose, mean_dir_vec,
                 disable_filtering=False):
        self.n_poses = n_poses
        self.subdivision_stride = subdivision_stride
        self.skeleton_resampling_fps = pose_resampling_fps
        self.mean_pose = np.asarray(mean_pose)
        self.mean_dir_vec = np.asarray(mean_dir_vec)
        self.disable_filtering = disable_filtering

        self.src = open_raw_store(clip_store_dir)
        self.out_dir = out_dir
        self.spectrogram_sample_length = \
            audio_ops.calc_spectrogram_length_from_motion_length(
                self.n_poses, self.skeleton_resampling_fps)
        # reference uses int(...) (truncation) here, not round
        # (data_preprocessor.py:31)
        self.audio_sample_length = int(
            self.n_poses / self.skeleton_resampling_fps * audio_ops.SR)
        self.n_out_samples = 0

    def run(self, n_workers=0):
        """Build the cache.  n_workers > 1 fans the per-clip CPU work
        (resampling, filtering, dir-vec conversion) out to worker
        processes while this process streams records in and writes the
        cache out (the reference does this single-threaded; our
        loader_workers config drives it here instead)."""
        n_filtered_out = defaultdict(int)
        with GGPackWriter(self.out_dir, meta={
                "n_poses": self.n_poses,
                "subdivision_stride": self.subdivision_stride,
                "fps": self.skeleton_resampling_fps}) as writer:
            self.writer = writer
            if n_workers and n_workers > 1:
                self._run_parallel(writer, n_filtered_out, n_workers)
            else:
                for video in self.src.iter_videos():
                    vid = video["vid"]
                    for clip in video["clips"]:
                        samples, counts = self._samples_from_clip(vid, clip)
                        for s in samples:
                            writer.add_sample(*s)
                        for key, n in counts.items():
                            n_filtered_out[key] += n

            self.n_out_samples = writer.n_samples

        if self.n_out_samples == 0:
            raise RuntimeError(
                "cache build produced 0 samples from %r — every window was "
                "filtered out (%s) or the clips are shorter than %d frames"
                % (self.src.__class__.__name__, dict(n_filtered_out),
                   self.n_poses))

        n_total_filtered = sum(n_filtered_out.values())
        logging.info("no. of samples: %d", self.n_out_samples)
        for key, n in n_filtered_out.items():
            logging.info("%s: %d", key, n)
        if self.n_out_samples + n_total_filtered > 0:
            logging.info("no. of excluded samples: %d (%.1f%%)",
                         n_total_filtered,
                         100 * n_total_filtered /
                         (self.n_out_samples + n_total_filtered))
        self.src.close()
        return self.n_out_samples

    def _config(self):
        return (self.n_poses, self.subdivision_stride,
                self.skeleton_resampling_fps, self.mean_pose,
                self.mean_dir_vec, self.disable_filtering)

    def _run_parallel(self, writer, n_filtered_out, n_workers):
        config = self._config()
        max_inflight = 2 * n_workers
        with ProcessPoolExecutor(max_workers=n_workers) as pool:
            inflight = []

            def drain(block_until=0):
                while len(inflight) > block_until:
                    samples, counts = inflight.pop(0).result()
                    for s in samples:
                        writer.add_sample(*s)
                    for key, n in counts.items():
                        n_filtered_out[key] += n

            for video in self.src.iter_videos():
                inflight.append(pool.submit(_process_video, config, video))
                drain(block_until=max_inflight)
            drain()

    def _samples_from_clip(self, vid, clip):
        return _samples_from_clip(self._config(), vid, clip)


def _process_video(config, video):
    """Worker: all samples + filter counts for one video record."""
    vid = video["vid"]
    samples = []
    counts = defaultdict(int)
    for clip in video["clips"]:
        s, c = _samples_from_clip(config, vid, clip)
        samples.extend(s)
        for key, n in c.items():
            counts[key] += n
    return samples, dict(counts)


def _samples_from_clip(config, vid, clip):
    """Pure per-clip windowing/filtering (reference
    data_preprocessor.py:69-167).  Returns ([(words, poses, vec, audio,
    spectrogram, aux), ...], filter_counts)."""
    (n_poses, subdivision_stride, fps, mean_pose, mean_dir_vec,
     disable_filtering) = config
    spectrogram_sample_length = \
        audio_ops.calc_spectrogram_length_from_motion_length(n_poses, fps)
    audio_sample_length = int(n_poses / fps * audio_ops.SR)

    clip_skeleton = clip["skeletons_3d"]
    clip_audio = clip["audio_feat"]          # mel spectrogram (M, L)
    clip_audio_raw = clip["audio_raw"]
    clip_word_list = clip["words"]
    clip_s_f = clip["start_frame_no"]
    clip_s_t, clip_e_t = clip["start_time"], clip["end_time"]

    n_filtered_out = defaultdict(int)
    samples = []

    clip_skeleton = skeleton.resample_pose_seq(
        np.asarray(clip_skeleton), clip_e_t - clip_s_t, fps)

    num_subdivision = math.floor(
        (len(clip_skeleton) - n_poses) / subdivision_stride) + 1
    expected_audio_length = \
        audio_ops.calc_spectrogram_length_from_motion_length(
            len(clip_skeleton), fps)
    if abs(expected_audio_length - clip_audio.shape[1]) > 5:
        raise ValueError("audio and skeleton lengths are different "
                         "(expected %d, got %d)" % (
                             expected_audio_length, clip_audio.shape[1]))

    for i in range(num_subdivision):
        start_idx = i * subdivision_stride
        fin_idx = start_idx + n_poses

        sample_skeletons = clip_skeleton[start_idx:fin_idx]
        subdivision_start_time = clip_s_t + start_idx / fps
        subdivision_end_time = clip_s_t + fin_idx / fps
        sample_words = get_words_in_time_range(
            clip_word_list, subdivision_start_time, subdivision_end_time)
        if len(sample_words) < 2:
            continue

        # spectrogram slice, proportional start + symmetric end pad
        audio_start = math.floor(
            start_idx / len(clip_skeleton) * clip_audio.shape[1])
        audio_end = audio_start + spectrogram_sample_length
        if audio_end > clip_audio.shape[1]:
            padded = np.pad(
                clip_audio, ((0, 0), (0, audio_end - clip_audio.shape[1])),
                mode="symmetric")
            sample_spectrogram = padded[:, audio_start:audio_end]
        else:
            sample_spectrogram = clip_audio[:, audio_start:audio_end]

        # raw audio slice
        audio_start = math.floor(
            start_idx / len(clip_skeleton) * len(clip_audio_raw))
        audio_end = audio_start + audio_sample_length
        if audio_end > len(clip_audio_raw):
            padded = np.pad(clip_audio_raw,
                            (0, audio_end - len(clip_audio_raw)),
                            mode="symmetric")
            sample_audio = padded[audio_start:audio_end]
        else:
            sample_audio = clip_audio_raw[audio_start:audio_end]

        filtered, message = MotionFilter(sample_skeletons, mean_pose).get()
        is_correct = filtered != []
        if not is_correct and not disable_filtering:
            n_filtered_out[message] += 1
            continue
        if not is_correct:
            filtered = sample_skeletons  # disable_filtering keeps all

        poses = np.asarray(filtered)
        dir_vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
        normalized = normalize_dir_vec(dir_vec, mean_dir_vec)

        samples.append((
            sample_words, poses, normalized, sample_audio,
            sample_spectrogram,
            {"vid": vid,
             "start_frame_no": clip_s_f + start_idx,
             "end_frame_no": clip_s_f + fin_idx,
             "start_time": subdivision_start_time,
             "end_time": subdivision_end_time}))

    return samples, n_filtered_out
