"""The proposed trimodal model: PoseGenerator + ConvDiscriminator.

Behavioral contract: reference scripts/model/multimodal_context_net.py:64-252.

PoseGenerator per-frame input = [pre_seq(pose_dim+1 constraint bit) |
audio feat 32 | text feat 32 | speaker z 16] -> n_layers bidirectional
GRU(hidden) with summed directions -> 2-layer MLP -> pose_dim dir-vec.
Speaker z: embedding -> mu/logvar -> reparameterize (z_type='speaker'),
N(0,1) noise (z_type='random'), or absent (z_type='none').

ConvDiscriminator: 3 valid convs (pose_dim->16->8->8) shrinking 34->28
frames -> 4-layer bi-GRU(64) summed -> per-frame linear -> Linear(28->1)
-> sigmoid.

Quirk preserved: the generator head's and discriminator's
``nn.LeakyReLU(True)`` activations are identities (see ops/layers).

GRUDiscriminator rebuilds the separate text-conditioned ``Discriminator``
class (multimodal_context_net.py:163-204) that the reference defines but
never instantiates: its no-text path is parity-tested against the
executed reference class, and its text path — which cannot even be
constructed as written upstream (the TextEncoderTCN(...) call at :170
passes n_words where the ``args`` namespace is expected) — is rebuilt
working.  Opt-in via --discriminator_type {gru,gru_text}; the default
(conv) keeps the reference's actual training configuration.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import normal_init
from ..ops.layers import (BatchNorm, TorchConv, TorchDense,
                          identity_leaky_relu)
from ..ops.recurrent import GRU
from .embedding_net import reparameterize
from .encoders import TextEncoderTCN, WavEncoder

Z_SIZE = 16
AUDIO_FEAT = 32
TEXT_FEAT = 32


class PoseGenerator(nn.Module):
    pose_dim: int
    n_words: int
    word_embed_size: int
    hidden_size: int
    n_layers: int
    dropout_prob: float = 0.3
    input_context: str = "both"   # both | audio | text | none
    z_type: str = "none"          # speaker | random | none
    n_speakers: int = 0
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, pre_seq, in_text, in_audio,
                 vid_indices: Optional[jax.Array] = None,
                 train: bool = False):
        text_feat = audio_feat = None
        if self.input_context != "none":
            audio_feat = WavEncoder()(in_audio, train=train)
            text_feat, _ = TextEncoderTCN(
                n_words=self.n_words, embed_size=self.word_embed_size,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout_prob,
                freeze_wordembed=self.freeze_wordembed)(in_text, train=train)
            assert audio_feat.shape[1] == text_feat.shape[1]

        z_context = z_mu = z_logvar = None
        if self.z_type == "speaker":
            table = self.param("speaker_embedding", normal_init(1.0),
                               (self.n_speakers, Z_SIZE))
            z = jnp.take(table, vid_indices, axis=0)
            z = TorchDense(Z_SIZE)(z)
            z_mu = TorchDense(Z_SIZE, name="speaker_mu")(z)
            z_logvar = TorchDense(Z_SIZE, name="speaker_logvar")(z)
            z_context = reparameterize(self.make_rng("noise"), z_mu, z_logvar)
        elif self.z_type == "random":
            z_context = jax.random.normal(
                self.make_rng("noise"), (pre_seq.shape[0], Z_SIZE),
                pre_seq.dtype)

        if self.input_context == "both":
            in_data = jnp.concatenate([pre_seq, audio_feat, text_feat], axis=2)
        elif self.input_context == "audio":
            in_data = jnp.concatenate([pre_seq, audio_feat], axis=2)
        elif self.input_context == "text":
            in_data = jnp.concatenate([pre_seq, text_feat], axis=2)
        elif self.input_context == "none":
            in_data = pre_seq
        else:
            raise ValueError("bad input_context %r" % (self.input_context,))

        if z_context is not None:
            rep = jnp.repeat(z_context[:, None, :], in_data.shape[1], axis=1)
            in_data = jnp.concatenate([in_data, rep], axis=2)

        out, _ = GRU(hidden_size=self.hidden_size, num_layers=self.n_layers,
                     bidirectional=True, dropout=self.dropout_prob)(
                         in_data, deterministic=not train)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        out = TorchDense(self.hidden_size // 2)(out)
        out = identity_leaky_relu(out)  # quirk: nn.LeakyReLU(True)
        out = TorchDense(self.pose_dim)(out)

        return out, z_context, z_mu, z_logvar


class ConvDiscriminator(nn.Module):
    """Pose-sequence discriminator (reference
    multimodal_context_net.py:207-252).  The Linear(28->1) head hardcodes
    n_poses=34, as in the reference."""
    input_size: int
    hidden_size: int = 64

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        x = TorchConv(16, (3,), padding=0)(poses)
        x = BatchNorm()(x, use_running_average=not train)
        x = identity_leaky_relu(x)  # quirk: nn.LeakyReLU(True)
        x = TorchConv(8, (3,), padding=0)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = identity_leaky_relu(x)
        x = TorchConv(8, (3,), padding=0)(x)

        out, _ = GRU(hidden_size=self.hidden_size, num_layers=4,
                     bidirectional=True, dropout=0.3)(
                         x, deterministic=not train)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        out = TorchDense(1)(out)          # per-frame score
        out = out[..., 0]                 # (B, T')
        out = TorchDense(1)(out)          # aggregate over the 28 frames
        return jax.nn.sigmoid(out)


class GRUDiscriminator(nn.Module):
    """Recurrent (optionally text-conditioned) sequence discriminator
    (reference multimodal_context_net.py:163-204 ``Discriminator``).

    poses (B, n_poses, pose_dim) [concat text feat 32 when use_text] ->
    n_layers bi-GRU(hidden) with summed directions -> per-frame
    Linear(hidden->1) -> (B, n_poses) -> Linear(n_poses->1) -> sigmoid.
    Unlike ConvDiscriminator there is no conv front-end, so the
    time-aggregating head requires the input length to equal n_poses.

    The reference never instantiates this class, and its text branch is
    unconstructible as written (multimodal_context_net.py:170 calls
    TextEncoderTCN(n_words, word_embed_size, word_embeddings) against
    the signature (args, n_words, embed_size, pre_trained_embedding));
    the no-text path below is parity-tested against the executed
    reference class, and the text path is rebuilt with the encoder the
    generator uses (DOCUMENTED DEVIATION, opt-in via
    --discriminator_type gru_text)."""
    input_size: int
    hidden_size: int
    n_layers: int
    dropout_prob: float = 0.3
    use_text: bool = False
    n_words: int = 0
    word_embed_size: int = 0
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        if self.use_text:
            text_feat, _ = TextEncoderTCN(
                n_words=self.n_words, embed_size=self.word_embed_size,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout_prob,
                freeze_wordembed=self.freeze_wordembed)(in_text, train=train)
            poses = jnp.concatenate([poses, text_feat], axis=2)
        out, _ = GRU(hidden_size=self.hidden_size,
                     num_layers=self.n_layers, bidirectional=True,
                     dropout=self.dropout_prob)(
                         poses, deterministic=not train)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        out = TorchDense(1)(out)          # per-frame score ("self.out")
        out = out[..., 0]                 # (B, n_poses)
        out = TorchDense(1)(out)          # Linear(n_poses->1) ("self.out2")
        return jax.nn.sigmoid(out)
