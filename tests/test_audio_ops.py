"""Tests for the from-scratch mel-spectrogram pipeline (librosa-parity
semantics; formulas from reference scripts/utils/data_utils.py:34-74)."""

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.ops import audio


def test_spectrogram_length_formula():
    # reference data_utils.py:41-43 for the standard window (34 poses @15fps)
    assert audio.calc_spectrogram_length_from_motion_length(34, 15) == 70
    assert audio.calc_audio_length_from_motion_length(34, 15) == 36267


def test_make_audio_fixed_length_pad_and_clip():
    x = np.arange(10, dtype=np.float32)
    padded = audio.make_audio_fixed_length(x, 14)
    assert len(padded) == 14
    # numpy 'symmetric' pad reflects including the edge sample
    np.testing.assert_array_equal(padded[10:], [9, 8, 7, 6])
    clipped = audio.make_audio_fixed_length(x, 6)
    np.testing.assert_array_equal(clipped, x[:6])


def test_hann_window_periodic():
    w = audio.hann_window(8)
    # periodic hann: w[0] == 0, symmetric about n/2
    assert w[0] == 0
    np.testing.assert_allclose(w[4], 1.0)
    np.testing.assert_allclose(w[1], w[7], atol=1e-12)


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank()
    assert fb.shape == (128, 513)
    # every filter has positive weight somewhere; slaney norm makes area ~ 2/width
    assert np.all(fb.sum(axis=1) > 0)
    # filters are band-limited and ordered by peak frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)


def test_stft_frame_count():
    n = 36267
    p = audio.stft_power(np.random.RandomState(0).randn(n))
    # centered stft: 1 + n//hop frames
    assert p.shape == (513, 1 + n // 512)


def test_melspectrogram_output():
    rng = np.random.RandomState(1)
    y = rng.randn(16000).astype(np.float32)
    m = audio.extract_melspectrogram(y)
    assert m.dtype == np.float16
    assert m.shape[0] == 128
    # power_to_db(ref=max): max is 0 dB, min >= -80 dB
    assert np.max(m) <= 1e-3
    assert np.min(m) >= -80.0 - 1e-2


def test_pure_tone_lands_in_right_mel_band():
    # 1 kHz tone should peak near the mel band whose center is 1 kHz
    t = np.arange(16000) / 16000.0
    y = np.sin(2 * np.pi * 1000.0 * t)
    power = audio.stft_power(y)
    fb = audio.mel_filterbank()
    mel = fb @ power
    band = int(np.argmax(mel.mean(axis=1)))
    centers = audio._mel_to_hz_slaney(
        np.linspace(audio._hz_to_mel_slaney(0.0),
                    audio._hz_to_mel_slaney(8000.0), 130))[1:-1]
    assert abs(centers[band] - 1000.0) < 60.0


def test_stft_matches_naive_dft():
    """Validate framing/window/rfft against an explicit DFT."""
    rng = np.random.RandomState(7)
    y = rng.randn(3000)
    power = audio.stft_power(y, n_fft=1024, hop_length=512)
    pad = 512
    ypad = np.pad(y, (pad, pad), mode="reflect")
    w = audio.hann_window(1024)
    k = np.arange(513)
    n = np.arange(1024)
    dft = np.exp(-2j * np.pi * np.outer(k, n) / 1024)
    for frame_idx in (0, 2, power.shape[1] - 1):
        frame = ypad[frame_idx * 512:frame_idx * 512 + 1024] * w
        spec = dft @ frame
        np.testing.assert_allclose(power[:, frame_idx], np.abs(spec) ** 2,
                                   rtol=1e-6, atol=1e-8)


def test_melspectrogram_golden_snapshot():
    """Frozen output snapshot for a deterministic two-tone input — guards
    the whole mel pipeline (stft, filterbank, power_to_db) against
    regressions."""
    t = np.arange(8000) / 16000.0
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.25 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    m = audio.extract_melspectrogram(y)
    assert m.shape == (128, 16)
    np.testing.assert_allclose(
        m[20:24, 5].astype(np.float32),
        [-39.5312, -52.4375, -61.2188, -66.5625], atol=0.01)
    assert float(m.max()) == 0.0
    assert float(m.min()) == -80.0
    np.testing.assert_allclose(float(m.mean()), -70.8125, atol=0.01)
