"""Tests for the hard speaker-conditioned synthetic distribution
(data/synthetic.py hard_clip; VERDICT r3 item 3).

The point of the hard fixture is that FGD stays discriminative over a
full training run, which only a TED-scale run can show (RESULTS.md);
what unit tests CAN pin is the machinery: schema, filter pass rate,
per-speaker style persistence + diversity, irreducible stochasticity,
and the audio/text -> motion coupling actually carrying signal.
"""

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.data import synthetic
from gesture_generation_from_trimodal_context_tpu.data.motion_filter import (
    MotionFilter)

FPS = 15


def _clip(speaker, seed, dur=12.0):
    style = synthetic.speaker_style(speaker)
    return synthetic.hard_clip(dur, FPS, np.random.RandomState(seed), style)


def test_schema_matches_easy_fixture():
    easy = synthetic.synthetic_clip(8.0, FPS, np.random.RandomState(0))
    hard = _clip(7, 0, dur=8.0)
    assert set(hard) == set(easy)
    assert hard["skeletons_3d"].shape == easy["skeletons_3d"].shape
    assert hard["audio_raw"].shape == easy["audio_raw"].shape
    assert hard["audio_feat"].shape == easy["audio_feat"].shape
    for w, ws, we in hard["words"]:
        assert isinstance(w, str) and ws < we


def test_mostly_passes_motion_filter():
    n_pass = n_tot = 0
    for sp in range(4):
        poses = _clip(sp, sp + 40)["skeletons_3d"]
        for s in range(0, len(poses) - 34, 10):
            _, msg = MotionFilter(poses[s:s + 34], synthetic.MEAN_POSE).get()
            n_tot += 1
            n_pass += msg == "PASS"
    # realistic minority of drops is fine; most windows must survive
    assert n_pass / n_tot > 0.85, (n_pass, n_tot)


def test_speaker_style_deterministic_and_diverse():
    a1, a2 = synthetic.speaker_style(11), synthetic.speaker_style(11)
    assert a1["tempo"] == a2["tempo"]
    np.testing.assert_array_equal(a1["posture"], a2["posture"])
    others = [synthetic.speaker_style(i) for i in range(30)]
    tempos = [s["tempo"] for s in others]
    amps = [s["amp"] for s in others]
    assert np.std(tempos) > 0.1 and np.std(amps) > 0.1
    # archetype mixtures span the simplex, not one corner
    mixes = np.array([s["mix"] for s in others])
    assert (mixes.argmax(axis=1) != mixes.argmax(axis=1)[0]).any()


def test_same_speaker_styles_cluster_vs_other_speakers():
    """Within-speaker motion stats are closer than across speakers for a
    style-dominant statistic (mean wrist-bone offset from the TED mean):
    the signal a vid-conditioned model can learn."""
    def stat(sp, seed):
        poses = _clip(sp, seed)["skeletons_3d"]
        vec = np.diff(poses, axis=1)  # bone vectors
        return vec.mean(axis=0)[3:].ravel()  # arm carriage

    s_a1, s_a2 = stat(3, 1), stat(3, 2)
    s_b1 = stat(21, 1)
    within = np.linalg.norm(s_a1 - s_a2)
    across = np.linalg.norm(s_a1 - s_b1)
    assert within < across, (within, across)


def test_clips_are_stochastic_given_speaker():
    """Same speaker, different rng -> different motion (irreducible
    stochasticity: the conditional distribution has spread, so a perfect
    model cannot collapse FGD to 0 by memorization)."""
    p1 = _clip(5, 1)["skeletons_3d"]
    p2 = _clip(5, 2)["skeletons_3d"]
    assert np.abs(p1 - p2).mean() > 0.01


def test_audio_envelope_couples_to_motion():
    """Arm swing energy correlates with the audio envelope: frames inside
    loud speech move more than silence-adjacent frames (averaged over
    clips — per-frame it is noisy by design)."""
    corr = []
    for seed in range(4):
        clip = _clip(9, seed, dur=16.0)
        poses = clip["skeletons_3d"]
        n = len(poses)
        audio = np.abs(clip["audio_raw"])
        env = audio[:n * (len(audio) // n)].reshape(n, -1).mean(axis=1)
        k = np.hanning(9)
        env = np.convolve(env, k / k.sum(), mode="same")
        speed = np.linalg.norm(np.diff(poses[:, 6], axis=0), axis=1)
        speed = np.convolve(speed, k / k.sum(), mode="same")
        corr.append(np.corrcoef(env[1:], speed)[0, 1])
    assert np.mean(corr) > 0.1, corr


def test_iconic_word_triggers_pulse():
    """A clip whose words include an iconic trigger shows the pulse on
    the mapped bone axis relative to the same rng without words."""
    style = synthetic.speaker_style(2)
    rng1 = np.random.RandomState(3)
    rng2 = np.random.RandomState(3)
    n = int(6.0 * FPS)
    words = [["hands", 2.0, 2.4]]
    with_w = synthetic.hard_pose_sequence(n, FPS, rng1, style, words=words)
    without = synthetic.hard_pose_sequence(n, FPS, rng2, style, words=None)
    f = int(2.0 * FPS)
    win = slice(f, f + 8)
    bone, axis, _ = synthetic._ICONIC["hands"]
    d_with = np.abs(np.diff(with_w, axis=1)[win, bone, axis]
                    - np.diff(without, axis=1)[win, bone, axis])
    assert d_with.max() > 0.05


def test_store_roundtrips_through_preprocessor(tmp_path):
    """hard clips flow through the real window preprocessor + dataset."""
    from gesture_generation_from_trimodal_context_tpu.data.storage import (
        GGRawStoreWriter)
    path = str(tmp_path / "lmdb_train")
    with GGRawStoreWriter(path) as w:
        for v in range(2):
            style = synthetic.speaker_style(v)
            rng = np.random.RandomState(v)
            clips, t0 = [], 0.0
            for c in range(2):
                clips.append(synthetic.hard_clip(8.0, FPS, rng, style,
                                                 start_time=t0,
                                                 start_frame=int(t0 * FPS)))
                t0 += 9.0
            w.add("{:010}".format(v), {"vid": "video_%03d" % v,
                                       "clips": clips})

    from gesture_generation_from_trimodal_context_tpu.data.preprocessor import (
        DataPreprocessor)
    out = str(tmp_path / "cache")
    n = DataPreprocessor(
        path, out, n_poses=34, subdivision_stride=10,
        pose_resampling_fps=15, mean_pose=synthetic.MEAN_POSE,
        mean_dir_vec=synthetic.MEAN_DIR_VEC).run()
    assert n > 10
