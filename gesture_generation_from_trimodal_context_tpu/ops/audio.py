"""Audio feature ops: log-mel spectrograms and window bookkeeping.

Behavioral contract (reference scripts/utils/data_utils.py:34-74):
- ``extract_melspectrogram``: librosa.feature.melspectrogram with
  n_fft=1024, hop=512, power=2 followed by power_to_db(ref=max),
  cast to float16.  librosa is not available in this environment, so the
  full pipeline (centered reflect-padded STFT with a periodic Hann window,
  Slaney mel filterbank with Slaney normalization, top_db=80 clipping) is
  implemented from scratch in numpy with identical semantics.
- ``calc_spectrogram_length_from_motion_length``: the frame-count formula
  round((n/fps*16000 - 1024)/512 + 1) (data_utils.py:41-43).
- ``make_audio_fixed_length``: symmetric-pad or clip raw audio
  (data_utils.py:68-74).
"""

import numpy as np

SR = 16000
N_FFT = 1024
HOP_LENGTH = 512
N_MELS = 128
TOP_DB = 80.0


def hann_window(n):
    """Periodic ('fftbins') Hann window, scipy.signal.get_window('hann', n)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (m - min_log_mel)),
                     freqs)
    return freqs


def mel_filterbank(sr=SR, n_fft=N_FFT, n_mels=N_MELS, fmin=0.0, fmax=None):
    """Slaney-scale, Slaney-normalized triangular mel filterbank
    (librosa.filters.mel defaults: htk=False, norm='slaney')."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float64)


_MEL_FB_CACHE = {}


def _cached_mel_fb(sr, n_fft, n_mels):
    key = (sr, n_fft, n_mels)
    if key not in _MEL_FB_CACHE:
        _MEL_FB_CACHE[key] = mel_filterbank(sr, n_fft, n_mels)
    return _MEL_FB_CACHE[key]


def stft_power(y, n_fft=N_FFT, hop_length=HOP_LENGTH):
    """|STFT|^2 with centered reflect padding + periodic Hann window.

    Returns (1 + n_fft//2, n_frames)."""
    y = np.asarray(y, dtype=np.float64)
    pad = n_fft // 2
    if len(y) < pad + 1:
        # reflect needs at least pad+1 samples; fall back to edge-safe mode
        y = np.pad(y, (pad, pad), mode="constant")
    else:
        y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    window = hann_window(n_fft)
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    spec = np.fft.rfft(frames, axis=1)
    return (spec.real ** 2 + spec.imag ** 2).T


def power_to_db(S, ref=None, amin=1e-10, top_db=TOP_DB):
    """librosa.power_to_db semantics (ref=np.max path used by the
    reference, data_utils.py:36)."""
    S = np.asarray(S, dtype=np.float64)
    if ref is None:
        ref = np.max(S)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def extract_melspectrogram(y, sr=SR):
    """Raw audio -> float16 log-mel spectrogram (n_mels x time).

    Reference: data_utils.py:34-38."""
    power = stft_power(y)
    mel = _cached_mel_fb(sr, N_FFT, N_MELS) @ power
    log_mel = power_to_db(mel, ref=np.max(mel))
    return log_mel.astype("float16")


def calc_spectrogram_length_from_motion_length(n_frames, fps):
    """Motion frame count -> expected spectrogram frame count
    (reference data_utils.py:41-43)."""
    ret = (n_frames / fps * SR - N_FFT) / HOP_LENGTH + 1
    return int(round(ret))


def calc_audio_length_from_motion_length(n_frames, fps):
    """Motion frame count -> expected raw-audio sample count
    (reference lmdb_data_loader.py:68)."""
    return int(round(n_frames / fps * SR))


def make_audio_fixed_length(audio, expected_audio_length):
    """Symmetric-pad or clip raw audio to a fixed sample count
    (reference data_utils.py:68-74)."""
    n_padding = expected_audio_length - len(audio)
    if n_padding > 0:
        audio = np.pad(audio, (0, n_padding), mode="symmetric")
    else:
        audio = audio[0:expected_audio_length]
    return audio
