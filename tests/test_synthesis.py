"""Synthesis engine tests: sliding-window autoregressive generation,
seeding, crossfade, and the offline TTS/alignment fallbacks."""

import os

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.config import (
    parse_args_mod as cfg)
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.synthesis.engine import (
    generate_gestures)
from gesture_generation_from_trimodal_context_tpu.synthesis.tts import (
    TTSHelper, align_words, load_wav_16k)


def _cfg(name):
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg
    return os.path.join(os.path.dirname(cfg_pkg.__file__), name)


def tiny_vocab(n=30):
    v = Vocab("words")
    for i in range(n - 4):
        v.index_word("w%d" % i)
    return v


def tiny_speakers(n=5):
    v = Vocab("vid", insert_default_tokens=False)
    for i in range(n - 1):
        v.index_word("vid%d" % i)
    return v


@pytest.fixture(scope="module")
def mmc_setup(tmp_path_factory):
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", "unused", "--hidden_size", "32",
        "--n_layers", "2", "--wordembed_dim", "16"])
    lang, spk = tiny_vocab(), tiny_speakers()
    bundle = factory.init_model(args, lang, spk, 27)
    gen_vars = factory.generator_init_variables(bundle, args,
                                                jax.random.PRNGKey(0), 1)
    return args, bundle, gen_vars, lang


def _words(duration):
    words, t = [], 0.2
    i = 0
    while t < duration - 0.4:
        words.append(["w%d" % (i % 20), t, t + 0.2])
        t += 0.35
        i += 1
    return words


def test_generate_long_clip(mmc_setup):
    args, bundle, gen_vars, lang = mmc_setup
    duration = 8.0
    audio = np.random.RandomState(0).randn(int(16000 * duration)).astype(
        np.float32)
    out = generate_gestures(args, bundle, gen_vars, lang, audio,
                            _words(duration), vid=1,
                            rng=jax.random.PRNGKey(3))
    # 4 windows of 34 frames with 4-frame crossfaded overlaps
    assert out.shape == (34 + 3 * 30, 27)
    assert np.isfinite(out).all()


def test_generate_short_clip_single_window(mmc_setup):
    args, bundle, gen_vars, lang = mmc_setup
    audio = np.zeros(16000, np.float32)  # 1 s < unit_time
    out = generate_gestures(args, bundle, gen_vars, lang, audio,
                            _words(1.0), vid=0, rng=jax.random.PRNGKey(1))
    assert out.shape == (34, 27)


def test_seed_seq_is_respected(mmc_setup):
    """The first n_pre_poses of window 0 are conditioned on the seed; with
    the same rng, changing the seed changes the output."""
    args, bundle, gen_vars, lang = mmc_setup
    audio = np.zeros(36267, np.float32)
    seed = 0.3 * np.ones((4, 27), np.float32)
    out1 = generate_gestures(args, bundle, gen_vars, lang, audio,
                             _words(2.2), vid=0, seed_seq=seed,
                             rng=jax.random.PRNGKey(2))
    out2 = generate_gestures(args, bundle, gen_vars, lang, audio,
                             _words(2.2), vid=0, seed_seq=None,
                             rng=jax.random.PRNGKey(2))
    assert not np.allclose(out1, out2)


def test_offline_tts_and_alignment(tmp_path):
    tts = TTSHelper(cache_path=str(tmp_path / "wav"))
    path = tts.synthesis("hello world how are you")
    assert os.path.exists(path)
    # cache hit returns the same file
    assert tts.synthesis("hello world how are you") == path
    audio, sr = load_wav_16k(path)
    assert sr == 16000 and len(audio) > 16000
    words = align_words(audio, "hello world how are you")
    assert [w[0] for w in words] == ["hello", "world", "how", "are", "you"]
    assert all(w[1] < w[2] for w in words)
    assert words[-1][2] <= len(audio) / sr
