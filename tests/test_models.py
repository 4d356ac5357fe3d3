"""Shape/dtype tests for every model family (extends the reference's two
__main__ smoke blocks, embedding_net.py:317-330 and
speech2gesture.py:253-265, to all models)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.models import (
    embedding_net, multimodal_context, seq2seq, speech2gesture)
from gesture_generation_from_trimodal_context_tpu.models.encoders import (
    TextEncoderTCN, WavEncoder)

B = 2
N_POSES = 34
POSE_DIM = 27
AUDIO_LEN = 36267
SPEC_LEN = 70
N_WORDS = 25


def rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "noise": jax.random.fold_in(k, 1),
            "dropout": jax.random.fold_in(k, 2)}


def test_wav_encoder_frames():
    m = WavEncoder()
    x = jnp.zeros((B, AUDIO_LEN))
    v = m.init(rngs(), x)
    y = m.apply(v, x)
    # 36267 samples -> exactly 34 frames x 32 feats
    # (conv cascade of reference multimodal_context_net.py:9-28)
    assert y.shape == (B, 34, 32)


def test_text_encoder_shapes():
    m = TextEncoderTCN(n_words=N_WORDS, embed_size=16, hidden_size=24,
                       n_layers=2)
    ids = jnp.zeros((B, N_POSES), jnp.int32)
    v = m.init(rngs(), ids)
    y, _ = m.apply(v, ids)
    assert y.shape == (B, N_POSES, 32)


def test_text_encoder_causality():
    """Dilated convs are causal: changing a future token must not change
    past outputs."""
    m = TextEncoderTCN(n_words=N_WORDS, embed_size=16, hidden_size=24,
                       n_layers=2)
    ids = np.zeros((1, N_POSES), np.int32)
    v = m.init(rngs(), jnp.asarray(ids))
    y1, _ = m.apply(v, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, 20] = 5
    y2, _ = m.apply(v, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(y1)[0, :20], np.asarray(y2)[0, :20],
                               atol=1e-6)
    assert not np.allclose(np.asarray(y1)[0, 20:], np.asarray(y2)[0, 20:])


def test_pose_generator_forward():
    m = multimodal_context.PoseGenerator(
        pose_dim=POSE_DIM, n_words=N_WORDS, word_embed_size=16,
        hidden_size=32, n_layers=2, z_type="speaker", n_speakers=5)
    pre_seq = jnp.zeros((B, N_POSES, POSE_DIM + 1))
    in_text = jnp.zeros((B, N_POSES), jnp.int32)
    in_audio = jnp.zeros((B, AUDIO_LEN))
    vids = jnp.zeros((B,), jnp.int32)
    v = m.init(rngs(), pre_seq, in_text, in_audio, vids)
    out, z, mu, logvar = m.apply(v, pre_seq, in_text, in_audio, vids,
                                 rngs={"noise": jax.random.PRNGKey(9)})
    assert out.shape == (B, N_POSES, POSE_DIM)
    assert z.shape == (B, 16) and mu.shape == (B, 16)


def test_pose_generator_z_none_and_random():
    for z_type, n_sp in (("none", 0), ("random", 0)):
        m = multimodal_context.PoseGenerator(
            pose_dim=POSE_DIM, n_words=N_WORDS, word_embed_size=16,
            hidden_size=32, n_layers=2, z_type=z_type)
        pre_seq = jnp.zeros((B, N_POSES, POSE_DIM + 1))
        in_text = jnp.zeros((B, N_POSES), jnp.int32)
        in_audio = jnp.zeros((B, AUDIO_LEN))
        v = m.init(rngs(), pre_seq, in_text, in_audio, None)
        out, z, mu, logvar = m.apply(v, pre_seq, in_text, in_audio, None,
                                     rngs={"noise": jax.random.PRNGKey(3)})
        assert out.shape == (B, N_POSES, POSE_DIM)
        assert (z is None) == (z_type == "none")
        assert mu is None and logvar is None


def test_conv_discriminator():
    m = multimodal_context.ConvDiscriminator(input_size=POSE_DIM)
    x = jnp.zeros((B, N_POSES, POSE_DIM))
    v = m.init(rngs(), x)
    y = m.apply(v, x)
    assert y.shape == (B, 1)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


def test_pose_autoencoder_roundtrip_shapes():
    m = embedding_net.EmbeddingNet(pose_dim=POSE_DIM, n_frames=N_POSES,
                                   mode="pose")
    poses = jnp.zeros((B, N_POSES, POSE_DIM))
    v = m.init(rngs(), None, None, None, poses, "pose")
    ctx, _, _, feat, mu, logvar, out = m.apply(v, None, None, None, poses,
                                               "pose")
    assert ctx is None
    assert feat.shape == (B, 32)
    assert out.shape == (B, N_POSES, POSE_DIM)


def test_pose_autoencoder_64_frames():
    # the reference supports 34- and 64-frame decoders
    # (embedding_net.py:180-195)
    m = embedding_net.EmbeddingNet(pose_dim=10, n_frames=64, mode="pose")
    poses = jnp.zeros((B, 64, 10))
    v = m.init(rngs(), None, None, None, poses, "pose")
    *_, out = m.apply(v, None, None, None, poses, "pose")
    assert out.shape == (B, 64, 10)


def test_joint_embed_modes():
    m = embedding_net.EmbeddingNet(
        pose_dim=POSE_DIM, n_frames=N_POSES, mode="random",
        n_words=N_WORDS, word_embed_size=16, hidden_size=24, n_layers=2)
    poses = jnp.zeros((B, N_POSES, POSE_DIM))
    pre = jnp.zeros((B, 4, POSE_DIM))
    in_text = jnp.zeros((B, N_POSES), jnp.int32)
    in_audio = jnp.zeros((B, AUDIO_LEN))
    v = m.init(rngs(), in_text, in_audio, pre, poses, "speech")
    for mode in ("speech", "pose", "random"):
        ctx, cmu, clv, feat, mu, lv, out = m.apply(
            v, in_text, in_audio, pre, poses, mode,
            rngs={"noise": jax.random.PRNGKey(5)})
        assert out.shape == (B, N_POSES, POSE_DIM)
        assert ctx.shape == (B, 32) and feat.shape == (B, 32)


def test_seq2seq_forward():
    m = seq2seq.Seq2SeqNet(pose_dim=POSE_DIM, n_frames=N_POSES,
                           n_pre_poses=4, n_words=N_WORDS,
                           word_embed_size=16, hidden_size=32, n_layers=2,
                           dropout_prob=0.1)
    words = jnp.array(np.random.RandomState(0).randint(0, N_WORDS, (B, 9)))
    lengths = jnp.array([9, 5])
    poses = jnp.asarray(np.random.RandomState(1).randn(B, N_POSES, POSE_DIM),
                        jnp.float32)
    v = m.init(rngs(), words, lengths, poses)
    out = m.apply(v, words, lengths, poses)
    assert out.shape == (B, N_POSES, POSE_DIM)
    # frame 0 is the seed pose
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(poses)[:, 0])


def test_seq2seq_encoder_mask_semantics():
    """Outputs past each sequence's length must be exactly zero (packed
    sequence parity)."""
    enc = seq2seq.EncoderRNN(n_words=N_WORDS, embed_size=8, hidden_size=12,
                             n_layers=1, dropout=0.0)
    words = jnp.ones((2, 7), jnp.int32)
    lengths = jnp.array([7, 3])
    v = enc.init(rngs(), words, lengths)
    out, hn = enc.apply(v, words, lengths)
    assert out.shape == (2, 7, 12)
    np.testing.assert_allclose(np.asarray(out)[1, 3:], 0.0, atol=1e-7)
    assert not np.allclose(np.asarray(out)[1, 2], 0.0)


def test_speech2gesture_shapes():
    g = speech2gesture.Generator(n_poses=N_POSES, pose_dim=POSE_DIM,
                                 n_pre_poses=4)
    spec = jnp.zeros((B, 128, SPEC_LEN))
    pre = jnp.zeros((B, 4, POSE_DIM))
    v = g.init(rngs(), spec, pre)
    out = g.apply(v, spec, pre)
    assert out.shape == (B, N_POSES, POSE_DIM)

    d = speech2gesture.Discriminator(pose_dim=POSE_DIM)
    dv = d.init(rngs(), out)
    y = d.apply(dv, out)
    assert y.shape[0] == B and y.shape[2] == 1
