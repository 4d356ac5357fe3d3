"""Synthetic dataset fixtures (SURVEY.md §4 test plan (c)).

Generates a tiny raw clip store with the exact schema of the TED database
(vid, clips[{skeletons_3d, audio_feat, audio_raw, words,
start/end frame/time}], reference data_preprocessor.py:70-75) using
plausible motion: skeletons are forward-kinematics poses from the TED
mean direction vectors with sinusoidal arm swings tuned to pass the
motion filter (wrist variance > 0.0014, spine upright, pose-diff > 0.02).

Also generates a fake data_3d_h36m.npz for the H3.6M FGD-autoencoder
path.
"""

import numpy as np

from ..ops import audio as audio_ops
from ..ops import skeleton
from .storage import GGRawStoreWriter

# TED training-set mean direction vectors (config/*.yml mean_dir_vec)
MEAN_DIR_VEC = np.array([
    0.0154009, -0.9690125, -0.0884354, -0.0022264, -0.8655276, 0.4342174,
    -0.0035145, -0.8755367, -0.4121039, -0.9236511, 0.3061306, -0.0012415,
    -0.5155854, 0.8129665, 0.0871897, 0.2348464, 0.1846561, 0.8091402,
    0.9271948, 0.2960011, -0.013189, 0.5233978, 0.8092403, 0.0725451,
    -0.2037076, 0.1924306, 0.8196916]).reshape(9, 3)

MEAN_POSE = np.array([
    0.0000306, 0.0004946, 0.0008437, 0.0033759, -0.2051629, -0.0143453,
    0.0031566, -0.3054764, 0.0411491, 0.0029072, -0.4254303, -0.001311,
    -0.1458413, -0.1505532, -0.0138192, -0.2835603, 0.0670333, 0.0107002,
    -0.2280813, 0.112117, 0.2087789, 0.1523502, -0.1521499, -0.0161503,
    0.291909, 0.0644232, 0.0040145, 0.2452035, 0.1115339, 0.2051307])

_WORDS = ("the quick brown fox jumps over lazy dog people think about "
          "ideas and talk with hands every day we can help millions").split()


def synthetic_pose_sequence(n_frames, fps, rng, phase=0.0):
    """(n_frames, 10, 3) poses: FK from mean dir-vecs + arm swings."""
    t = np.arange(n_frames) / fps
    vecs = np.tile(MEAN_DIR_VEC[None], (n_frames, 1, 1)).astype(np.float64)
    # swing forearms/hands (bones 4,5 right; 7,8 left) in y/z
    for b, speed, amp in ((4, 1.3, 0.55), (5, 1.7, 0.7),
                          (7, 1.1, 0.5), (8, 1.9, 0.65)):
        vecs[:, b, 1] += amp * np.sin(2 * np.pi * speed * t + phase + b)
        vecs[:, b, 2] += amp * np.cos(2 * np.pi * speed * t + phase + 2 * b)
    vecs += 0.01 * rng.randn(*vecs.shape)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    return skeleton.convert_dir_vec_to_pose_np(vecs)


def synthetic_clip(duration_s, fps, rng, start_time=0.0, start_frame=0,
                   phase=0.0):
    n_frames = int(duration_s * fps)
    poses = synthetic_pose_sequence(n_frames, fps, rng, phase)

    n_audio = int(duration_s * audio_ops.SR)
    tt = np.arange(n_audio) / audio_ops.SR
    freq = 180 + 80 * np.sin(2 * np.pi * 0.7 * tt + phase)
    audio_raw = (0.4 * np.sin(2 * np.pi * freq * tt)
                 + 0.05 * rng.randn(n_audio)).astype(np.float32)
    spec = audio_ops.extract_melspectrogram(audio_raw)

    words = []
    wt = start_time + 0.15
    i = 0
    while wt < start_time + duration_s - 0.3:
        dur = 0.15 + 0.25 * rng.rand()
        words.append([_WORDS[i % len(_WORDS)], float(wt), float(wt + dur)])
        wt += dur + 0.1 + 0.2 * rng.rand()
        i += 1

    return {
        "skeletons_3d": poses.astype(np.float32),
        "audio_feat": spec,
        "audio_raw": audio_raw,
        "words": words,
        "start_frame_no": int(start_frame),
        "end_frame_no": int(start_frame + n_frames),
        "start_time": float(start_time),
        "end_time": float(start_time + duration_s),
    }


def make_synthetic_raw_store(path, n_videos=3, clips_per_video=2,
                             clip_duration_s=8.0, fps=15, seed=0):
    rng = np.random.RandomState(seed)
    with GGRawStoreWriter(path) as w:
        for v in range(n_videos):
            clips = []
            t0 = 0.0
            for c in range(clips_per_video):
                clips.append(synthetic_clip(
                    clip_duration_s, fps, rng, start_time=t0,
                    start_frame=int(t0 * fps),
                    phase=v * 2.1 + c * 0.7))
                t0 += clip_duration_s + 1.0
            w.add("{:010}".format(v), {"vid": "video_%03d" % v,
                                       "clips": clips})
    return path


def make_synthetic_h36m(path, n_frames_per_action=300, seed=0):
    """Fake data_3d_h36m.npz: 32-joint skeletons for the subjects the
    H3.6M loader expects (reference h36m_loader.py:10-42)."""
    rng = np.random.RandomState(seed)
    subjects = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
    positions_3d = {}
    for si, subject in enumerate(subjects):
        actions = {}
        for a in range(2):
            t = np.arange(n_frames_per_action) / 50.0
            base = rng.randn(32, 3) * 0.3
            pos = np.tile(base[None], (n_frames_per_action, 1, 1))
            pos += 0.1 * np.sin(
                2 * np.pi * (0.5 + 0.1 * si) * t[:, None, None]
                + rng.rand(32, 3) * 6.28)
            # hips roughly at origin, spine above
            pos[:, 0] *= 0.05
            actions["act%d" % a] = pos.astype(np.float32)
        positions_3d[subject] = actions
    np.savez_compressed(path, positions_3d=positions_3d)
    return path
