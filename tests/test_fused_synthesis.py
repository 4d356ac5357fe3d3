"""Fused one-dispatch synthesis (the whole sliding-window chain as one
`lax.scan`) must reproduce the per-window host loop exactly: same rng
stream (fold_in(rng, i)), same seed chaining through the carry, same
crossfade, for every model family and for padded window buckets."""

import os

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.config import (
    parse_args_mod as cfg)
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.synthesis.engine import (
    _bucket, generate_gestures)


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


def _words(duration):
    words, t = [], 0.2
    i = 0
    while t < duration - 0.4:
        words.append(["w%d" % (i % 20), t, t + 0.2])
        t += 0.35
        i += 1
    return words


def _setup(yml):
    args = cfg.parse_args([
        "--config", _cfg(yml),
        "--model_save_path", "unused", "--hidden_size", "32",
        "--n_layers", "2", "--wordembed_dim", "16"])
    lang, spk = tiny_vocab(), tiny_speakers()
    bundle = factory.init_model(args, lang, spk, 27)
    gen_vars = factory.generator_init_variables(bundle, args,
                                                jax.random.PRNGKey(0), 1)
    return args, bundle, gen_vars, lang


def _both_paths(args, bundle, gen_vars, lang, duration, **kw):
    audio = np.random.RandomState(7).randn(
        int(16000 * duration)).astype(np.float32)
    words = _words(duration)
    rng = jax.random.PRNGKey(11)
    out_seq = generate_gestures(args, bundle, gen_vars, lang, audio, words,
                                rng=rng, fused=False, **kw)
    out_fused = generate_gestures(args, bundle, gen_vars, lang, audio,
                                  words, rng=rng, fused=True, **kw)
    return out_seq, out_fused


@pytest.mark.parametrize("yml,kw", [
    ("multimodal_context.yml", {"vid": 1}),
    ("seq2seq.yml", {}),
    ("speech2gesture.yml", {}),
    ("joint_embed.yml", {}),
])
def test_fused_matches_per_window(yml, kw):
    args, bundle, gen_vars, lang = _setup(yml)
    # 8 s -> 4 windows (exact bucket, no padding)
    out_seq, out_fused = _both_paths(args, bundle, gen_vars, lang, 8.0,
                                     **kw)
    assert out_seq.shape == out_fused.shape == (34 + 3 * 30, 27)
    np.testing.assert_allclose(out_fused, out_seq, atol=2e-5, rtol=1e-4)
    assert np.isfinite(out_fused).all()


def test_fused_padded_bucket_and_seed():
    """6 s -> 3 windows -> bucket 4: one padded window runs and is
    discarded; a window-0 seed flows through the scan carry init."""
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    assert _bucket(3) == 4
    seed = 0.3 * np.ones((4, 27), np.float32)
    out_seq, out_fused = _both_paths(args, bundle, gen_vars, lang, 6.0,
                                     vid=1, seed_seq=seed)
    assert out_seq.shape == (34 + 2 * 30, 27)
    np.testing.assert_allclose(out_fused, out_seq, atol=2e-5, rtol=1e-4)

    # and the seed actually conditions window 0
    out_noseed = generate_gestures(
        args, bundle, gen_vars, lang,
        np.random.RandomState(7).randn(16000 * 6).astype(np.float32),
        _words(6.0), rng=jax.random.PRNGKey(11), fused=True, vid=1)
    assert not np.allclose(out_fused, out_noseed)


def test_fused_single_window():
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    out_seq, out_fused = _both_paths(args, bundle, gen_vars, lang, 1.0,
                                     vid=1)
    assert out_fused.shape == (34, 27)
    np.testing.assert_allclose(out_fused, out_seq, atol=2e-5, rtol=1e-4)


def test_bucket():
    assert [_bucket(n) for n in (1, 2, 3, 4, 5, 8, 9, 60)] == \
        [1, 2, 4, 4, 8, 8, 16, 64]


def test_stream_matches_batch():
    """Streamed chunks concatenate to EXACTLY the per-window batch
    output (same jitted fn, same rng stream, same crossfade)."""
    from gesture_generation_from_trimodal_context_tpu.synthesis.engine \
        import generate_gestures_stream
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    audio = np.random.RandomState(7).randn(16000 * 8).astype(np.float32)
    words = _words(8.0)
    rng = jax.random.PRNGKey(11)
    seed = 0.2 * np.ones((4, 27), np.float32)
    batch = generate_gestures(args, bundle, gen_vars, lang, audio, words,
                              vid=1, seed_seq=seed, rng=rng, fused=False)
    chunks = list(generate_gestures_stream(
        args, bundle, gen_vars, lang, audio, words, vid=1, seed_seq=seed,
        rng=rng))
    assert len(chunks) == 4  # 8 s -> 4 windows, one chunk each
    pos = 0
    for start, c in chunks:
        assert start == pos
        pos += len(c)
    assert [len(c) for _, c in chunks] == [30, 30, 30, 34]
    np.testing.assert_array_equal(np.vstack([c for _, c in chunks]), batch)
