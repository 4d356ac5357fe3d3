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


# ---------------------------------------------------------------------------
# "Hard" speaker-conditioned motion distribution (VERDICT r3 item 3).
#
# The easy generator above produces phase-shifted sinusoids that any of the
# model families learns to FGD 0.000 within one epoch (RESULTS.md round 2),
# so the FGD metric could not distinguish a good run from a mediocre one.
# This distribution is built so the metric behaves like it does on real TED
# (reference embedding_space_evaluator.py:74-101 computes a Frechet distance
# between GENERATED and GROUND-TRUTH feature distributions):
#
# - SPEAKER STYLES: each video draws a persistent style (posture lean,
#   per-bone amplitude/tempo, handedness, audio-beat gain, archetype
#   mixture weights) from a continuous style space.  A model only matches
#   the marginal motion distribution by actually using its speaker
#   conditioning — this takes many epochs, so FGD descends gradually.
# - STRUCTURED TEMPORAL NOISE: per-bone Ornstein-Uhlenbeck processes and a
#   semi-Markov regime switch (rest / gesticulate / emphatic) make motion
#   smooth but NOT a deterministic function of the conditioning inputs;
#   the generated distribution retains an irreducible FGD floor > 0.
# - CROSS-MODAL COUPLING: the audio is built as per-word syllable bursts
#   (speaker-specific pitch), and the motion's arm amplitude tracks the
#   smoothed audio envelope plus word-onset beat pulses — audio and text
#   carry real signal, like beat gestures in the TED data.
#
# All motion is tuned to (mostly) pass the reference motion filter
# (data/motion_filter.py): posture offsets keep mean |pose - mean_pose|
# >= 0.02, the spine lean stays << 20 deg, and the rest-state baseline
# sway keeps wrist variance near the 0.0014 threshold (a realistic
# minority of windows IS dropped, like the real preprocessor).
# ---------------------------------------------------------------------------

# arm bones (dir-vec rows): right upper/fore/hand = 3,4,5;
# left upper/fore/hand = 6,7,8 (ops/skeleton.py DIR_VEC_PAIRS)
_R_ARM = (3, 4, 5)
_L_ARM = (6, 7, 8)
_ARMS = _R_ARM + _L_ARM

# gesture archetypes: per-bone (amplitude weight, frequency multiplier,
# axis weights (y, z)) for the oscillatory component.  Speakers mix these.
_ARCHETYPES = (
    # symmetric forearm "beat" swings
    {4: (0.9, 1.6, (1.0, 0.3)), 5: (1.1, 1.6, (0.6, 1.0)),
     7: (0.9, 1.6, (1.0, 0.3)), 8: (1.1, 1.6, (0.6, 1.0))},
    # right-dominant sweep from the shoulder
    {3: (0.7, 0.7, (0.4, 1.0)), 4: (1.0, 0.9, (1.0, 0.8)),
     5: (1.2, 1.1, (0.8, 1.0))},
    # left-dominant lift
    {6: (0.7, 0.8, (0.5, 1.0)), 7: (1.0, 1.0, (1.0, 0.6)),
     8: (1.2, 1.3, (0.7, 1.0))},
    # alternating hands, head nod
    {1: (0.25, 2.0, (1.0, 0.2)), 5: (1.0, 2.1, (1.0, 0.5)),
     8: (1.0, 2.1, (-1.0, 0.5))},
)

# words that trigger an "iconic" gesture pulse (text carries signal):
# word -> (bone, axis, sign)
_ICONIC = {"hands": (5, 1, 1.0), "millions": (8, 2, 1.0),
           "ideas": (4, 2, -1.0), "help": (7, 1, 1.0)}


def speaker_style(speaker_id):
    """Persistent per-video style drawn from a continuous style space.

    Deterministic in speaker_id, independent of the clip rng, so every
    clip of a video shares the style (what the model's vid embedding can
    learn)."""
    rng = np.random.RandomState(0xC0FFEE ^ (speaker_id * 2654435761 % (2 ** 31)))
    mix = rng.dirichlet(np.ones(len(_ARCHETYPES)) * 0.8)
    posture = np.zeros((9, 3))
    posture[1:3] += 0.06 * rng.randn(2, 3)       # neck/head set
    posture[3:9] += 0.09 * rng.randn(6, 3)       # arm carriage
    posture[0] += 0.015 * rng.randn(3)           # spine: keep < ~2 deg
    return {
        "mix": mix,
        "tempo": float(rng.uniform(0.7, 1.5)),
        "amp": float(np.exp(rng.normal(-0.25, 0.35))),
        "handedness": float(rng.uniform(0.35, 0.65)),  # right share
        "posture": posture,
        "beat_gain": float(rng.uniform(0.4, 1.6)),
        "f0": float(rng.uniform(95.0, 230.0)),
        "ou_sigma": float(rng.uniform(0.035, 0.08)),
        "rest_bias": float(rng.uniform(-0.35, 0.35)),  # rest-state propensity
    }


def _ou_noise(rng, n_frames, shape, tau_frames, sigma):
    """Ornstein-Uhlenbeck (AR(1)) noise: smooth, temporally structured."""
    from scipy.signal import lfilter
    a = np.exp(-1.0 / tau_frames)
    eps = rng.randn(n_frames, *shape) * sigma * np.sqrt(1.0 - a * a)
    return lfilter([1.0], [1.0, -a], eps, axis=0)


def _regime_envelope(rng, n_frames, fps, style):
    """Semi-Markov regime process: rest / gesticulate / emphatic, with
    speaker-dependent dwell times, smoothed into an amplitude envelope."""
    levels = np.array([0.22, 1.0, 1.65])
    # speaker rest propensity shifts the stationary distribution
    p = np.array([0.3 + 0.2 * style["rest_bias"], 0.5,
                  0.2 - 0.2 * style["rest_bias"]])
    p = np.clip(p, 0.05, None)
    p /= p.sum()
    env = np.empty(n_frames)
    t = 0
    state = rng.choice(3, p=p)
    while t < n_frames:
        dwell = int(fps * rng.gamma(2.0, (0.5, 0.9, 0.55)[state]) + fps * 0.4)
        env[t:t + dwell] = levels[state]
        t += dwell
        nxt = rng.choice(3, p=p)
        state = nxt if nxt != state else (state + 1) % 3
    # ~0.35 s cosine smoothing of the regime steps
    k = max(3, int(0.35 * fps) | 1)
    win = np.hanning(k)
    win /= win.sum()
    return np.convolve(env, win, mode="same")


def _word_track(words, n_frames, fps, t_offset):
    """(onset pulse train, iconic pulses) resampled to motion frames."""
    beat = np.zeros(n_frames)
    iconic = []  # (frame, bone, axis, sign)
    for w, ws, we in words:
        f = int(round((ws - t_offset) * fps))
        if 0 <= f < n_frames:
            beat[f] = 1.0
            if w in _ICONIC:
                iconic.append((f,) + _ICONIC[w])
    return beat, iconic


def _decay_kernel(fps, dur_s=0.45):
    k = np.arange(int(dur_s * fps))
    return np.exp(-3.0 * k / max(1, len(k) - 1)) * np.sin(
        np.pi * np.minimum(1.0, k / max(1.0, 0.25 * fps)))


def hard_pose_sequence(n_frames, fps, rng, style, audio_env=None,
                       words=None, t_offset=0.0):
    """(n_frames, 10, 3) poses from the hard speaker-conditioned
    distribution.  audio_env: optional (n_frames,) smoothed audio
    amplitude in [0, 1] the arm amplitude couples to."""
    t = np.arange(n_frames) / fps
    vecs = np.tile((MEAN_DIR_VEC + style["posture"])[None],
                   (n_frames, 1, 1)).astype(np.float64)

    # regime envelope x audio coupling
    env = _regime_envelope(rng, n_frames, fps, style)
    if audio_env is not None:
        env = env * (1.0 + style["beat_gain"] * (audio_env - audio_env.mean()))
    env = np.maximum(env, 0.12)  # baseline sway keeps the filter's
    #                              wrist-variance check mostly satisfied

    # archetype mixture oscillations (speaker tempo/amp/handedness)
    amp_scale = np.where(np.isin(np.arange(9), _R_ARM),
                         2.0 * style["handedness"],
                         np.where(np.isin(np.arange(9), _L_ARM),
                                  2.0 * (1.0 - style["handedness"]), 1.0))
    for w_a, arch in zip(style["mix"], _ARCHETYPES):
        if w_a < 0.03:
            continue
        for bone, (amp, freq, (wy, wz)) in arch.items():
            ph = rng.uniform(0, 2 * np.pi)
            # slow phase drift: nonstationary oscillation
            drift = np.cumsum(rng.randn(n_frames)) * (0.6 / np.sqrt(fps))
            arg = 2 * np.pi * freq * style["tempo"] * t + ph + 0.15 * drift
            a = 0.55 * w_a * amp * style["amp"] * amp_scale[bone] * env
            vecs[:, bone, 1] += a * wy * np.sin(arg)
            vecs[:, bone, 2] += a * wz * np.cos(arg + 0.7)

    # word-onset beat pulses + iconic word gestures
    if words is not None:
        beat, iconic = _word_track(words, n_frames, fps, t_offset)
        ker = _decay_kernel(fps)
        pulse = np.convolve(beat, ker, mode="full")[:n_frames]
        for bone in (5, 8):
            vecs[:, bone, 1] += 0.35 * style["beat_gain"] * pulse
        for f, bone, axis, sign in iconic:
            seg = ker[:n_frames - f]
            vecs[f:f + len(seg), bone, axis] += 0.8 * sign * seg

    # structured temporal noise: OU on the arms, gentler on spine/head
    ou = _ou_noise(rng, n_frames, (9, 3), tau_frames=0.45 * fps,
                   sigma=style["ou_sigma"])
    ou[:, 0] *= 0.18
    ou[:, 1:3] *= 0.5
    vecs += ou
    vecs += 0.004 * rng.randn(*vecs.shape)  # sensor-ish white noise

    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    return skeleton.convert_dir_vec_to_pose_np(vecs)


def _hard_audio(duration_s, words, rng, style, t_offset=0.0):
    """Per-word syllable-burst audio at the speaker's pitch.  Returns
    (audio_raw float32 (n,), frame-rate envelope fn)."""
    n_audio = int(duration_s * audio_ops.SR)
    tt = np.arange(n_audio) / audio_ops.SR
    audio = np.zeros(n_audio, np.float32)
    env = np.zeros(n_audio, np.float32)
    f0 = style["f0"]
    for w, ws, we in words:
        s = int((ws - t_offset) * audio_ops.SR)
        e = min(int((we - t_offset) * audio_ops.SR), n_audio)
        if e <= s or s < 0:
            continue
        seg_t = tt[s:e]
        # 1-3 syllables per word, Hann-enveloped
        n_syl = 1 + min(2, len(w) // 4)
        syl_env = np.abs(np.sin(np.pi * n_syl
                                * np.linspace(0, 1, e - s))) ** 1.5
        jitter = 1.0 + 0.12 * rng.randn()
        carrier = (np.sin(2 * np.pi * f0 * jitter * seg_t)
                   + 0.45 * np.sin(2 * np.pi * 2 * f0 * jitter * seg_t)
                   + 0.2 * np.sin(2 * np.pi * 3.1 * f0 * jitter * seg_t))
        loud = 0.25 + 0.2 * rng.rand()
        audio[s:e] += (loud * syl_env * carrier).astype(np.float32)
        env[s:e] = np.maximum(env[s:e], (loud * syl_env).astype(np.float32))
    audio += (0.01 * rng.randn(n_audio)).astype(np.float32)
    return audio, env


def hard_clip(duration_s, fps, rng, style, start_time=0.0, start_frame=0):
    """One clip of the hard distribution: audio built first (speech
    bursts per word), motion coupled to its envelope + word onsets."""
    n_frames = int(duration_s * fps)

    words = []
    wt = start_time + 0.15
    i = 0
    while wt < start_time + duration_s - 0.3:
        dur = 0.15 + 0.25 * rng.rand()
        words.append([_WORDS[int(rng.randint(len(_WORDS)))
                             if rng.rand() < 0.8 else i % len(_WORDS)],
                      float(wt), float(wt + dur)])
        wt += dur + 0.1 + (0.2 + 0.3 * max(0.0, -style["rest_bias"])) \
            * rng.rand()
        i += 1

    audio_raw, env = _hard_audio(duration_s, words, rng, style,
                                 t_offset=start_time)
    spec = audio_ops.extract_melspectrogram(audio_raw)

    # smooth the audio envelope to motion frame rate (~0.4 s window)
    frame_env = env.reshape(n_frames, -1).mean(axis=1) \
        if env.size % n_frames == 0 else np.interp(
            np.arange(n_frames) / fps, np.arange(env.size) / audio_ops.SR,
            env)
    k = max(3, int(0.4 * fps) | 1)
    win = np.hanning(k)
    win /= win.sum()
    frame_env = np.convolve(frame_env, win, mode="same")
    rng_scale = frame_env.max() - frame_env.min()
    if rng_scale > 1e-6:
        frame_env = (frame_env - frame_env.min()) / rng_scale

    poses = hard_pose_sequence(n_frames, fps, rng, style,
                               audio_env=frame_env, words=words,
                               t_offset=start_time)
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
