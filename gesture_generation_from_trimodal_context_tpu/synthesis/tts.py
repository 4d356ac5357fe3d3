"""TTS + forced alignment adapters for the from_text synthesis mode.

Behavioral contract: reference scripts/utils/tts_helper.py:9-104 (Google
Cloud TTS with an md5-keyed wav cache and 30-day eviction) and
scripts/synthesize.py:212-229 (gentle forced alignment).

Both external services are optional imports here (neither is baked into
this environment).  When absent, deterministic offline fallbacks keep the
from_text pipeline runnable end to end:
- ``synthesize``: a formant-ish modulated tone per word (0.25 s/word,
  0.08 s gaps) at 16 kHz,
- ``align_words``: uniform time allocation proportional to word length.
"""

import hashlib
import logging
import os
import time

import numpy as np

from ..ops import audio as audio_ops
from ..ops.text import normalize_string
from ..utils.video import save_wav


class TTSHelper:
    """Text -> wav file with an md5-keyed cache
    (reference tts_helper.py:20-56 cache behavior)."""

    CACHE_EVICT_DAYS = 30

    def __init__(self, cache_path="output/cached_wav", sr=16000):
        self.cache_path = cache_path
        self.sr = sr
        os.makedirs(cache_path, exist_ok=True)
        self._evict_old()
        self._gcloud = None
        try:
            from google.cloud import texttospeech  # optional
            self._gcloud = texttospeech
        except ImportError:
            logging.info("google-cloud-texttospeech unavailable; using the "
                         "offline synthetic voice")

    def _evict_old(self):
        now = time.time()
        for name in os.listdir(self.cache_path):
            p = os.path.join(self.cache_path, name)
            if os.path.isfile(p) and \
                    now - os.path.getmtime(p) > self.CACHE_EVICT_DAYS * 86400:
                os.remove(p)

    def _cache_file(self, text, voice_name):
        key = hashlib.md5((voice_name + text).encode()).hexdigest()
        return os.path.join(self.cache_path, key + ".wav")

    def synthesis(self, ssml_text, voice_name="en-female", verbose=False):
        path = self._cache_file(ssml_text, voice_name)
        if os.path.exists(path):
            if verbose:
                logging.info("using cached tts %s", path)
            return path
        if self._gcloud is not None:
            self._google_tts(ssml_text, voice_name, path)
        else:
            self._offline_tts(ssml_text, path)
        return path

    def _google_tts(self, ssml_text, voice_name, out_path):
        tts = self._gcloud
        client = tts.TextToSpeechClient()
        name = {"en-female": "en-US-Wavenet-F",
                "en-male": "en-US-Wavenet-D"}.get(voice_name, voice_name)
        synthesis_input = tts.SynthesisInput(ssml="<speak>%s</speak>"
                                             % ssml_text)
        voice = tts.VoiceSelectionParams(language_code="en-US", name=name)
        audio_config = tts.AudioConfig(
            audio_encoding=tts.AudioEncoding.LINEAR16,
            sample_rate_hertz=self.sr)
        response = client.synthesize_speech(
            input=synthesis_input, voice=voice, audio_config=audio_config)
        with open(out_path, "wb") as f:
            f.write(response.audio_content)

    def _offline_tts(self, text, out_path):
        words = normalize_string(text).split()
        word_dur, gap = 0.25, 0.08
        total = max(1, len(words)) * (word_dur + gap) + 0.3
        n = int(total * self.sr)
        audio = np.zeros(n, np.float32)
        rng = np.random.RandomState(
            int(hashlib.md5(text.encode()).hexdigest()[:8], 16))
        t0 = 0.15
        for w in words:
            f0 = 120 + (hash(w) % 120)
            n0, n1 = int(t0 * self.sr), int((t0 + word_dur) * self.sr)
            tt = np.arange(n1 - n0) / self.sr
            env = np.sin(np.pi * np.arange(n1 - n0) / (n1 - n0)) ** 0.5
            audio[n0:n1] = env * (
                0.5 * np.sin(2 * np.pi * f0 * tt)
                + 0.25 * np.sin(2 * np.pi * 2 * f0 * tt)
                + 0.05 * rng.randn(n1 - n0))
            t0 += word_dur + gap
        save_wav(out_path, audio, self.sr)

    def get_sound_obj(self, filename):
        from scipy.io import wavfile
        sr, data = wavfile.read(filename)
        duration = len(data) / sr
        return None, duration


def load_wav_16k(path):
    from scipy.io import wavfile
    sr, raw = wavfile.read(path)
    data = np.asarray(raw, np.float64)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if np.issubdtype(raw.dtype, np.integer):
        data = data / 32768.0
    if sr != audio_ops.SR:
        # linear resample to 16 kHz
        x_old = np.arange(len(data)) / sr
        n_new = int(len(data) * audio_ops.SR / sr)
        x_new = np.arange(n_new) / audio_ops.SR
        data = np.interp(x_new, x_old, data)
    return data.astype(np.float32), audio_ops.SR


def align_words(audio, text, sr=16000):
    """Word timestamps for raw audio (reference synthesize.py:212-229).

    Uses gentle forced alignment when importable; otherwise allocates time
    proportionally to word length over the non-silent span."""
    try:
        import gentle
        resources = gentle.Resources()
        import soundfile as sf
        import tempfile
        audio_8k = np.interp(
            np.arange(int(len(audio) / sr * 8000)) / 8000,
            np.arange(len(audio)) / sr, audio)
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            sf.write(f.name, audio_8k, 8000, "PCM_16")
            aligner = gentle.ForcedAligner(resources, text, nthreads=2,
                                           disfluency=False,
                                           conservative=False)
            out = aligner.transcribe(f.name, logging=logging)
        words = []
        for i, w in enumerate(out.words):
            if w.case == "success":
                words.append([w.word, w.start, w.end])
            elif 0 < i < len(out.words) - 1:
                words.append([w.word, out.words[i - 1].end,
                              out.words[i + 1].start])
        return words
    except ImportError:
        pass

    tokens = normalize_string(text).split()
    if not tokens:
        return []
    duration = len(audio) / sr
    weights = np.array([max(2, len(t)) for t in tokens], np.float64)
    weights /= weights.sum()
    words = []
    t0 = 0.1
    usable = max(0.2, duration - 0.2)
    for tok, w in zip(tokens, weights):
        dur = usable * w * 0.8
        words.append([tok, float(t0), float(t0 + dur)])
        t0 += usable * w
    return words
