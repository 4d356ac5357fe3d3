"""Joint text/audio <-> pose embedding networks + the FGD feature extractor.

Behavioral contract: reference scripts/model/embedding_net.py:10-314.
Architecture summary (for n_frames=34, pose_dim=27):

- PoseEncoderConv: conv stack over time (27->32->64->64(s2)->32) then an
  MLP to a 32-d latent with mu/logvar heads (embedding_net.py:42-82).
- PoseDecoderConv: latent -> (4ch x 34) seed -> two transposed convs ->
  two convs -> (B, 34, 27) (embedding_net.py:165-217).
- PoseDecoderGRU: [pre-pose feat 32 | latent 32] repeated over time ->
  4-layer bi-GRU(300) summed halves -> MLP (embedding_net.py:130-162).
- PoseDecoderFC: pure MLP decoder variant (embedding_net.py:85-127).
- ContextEncoder: TextEncoderTCN + WavEncoder -> GRU(256, 2 layers) ->
  last step -> 32-d latent with mu/logvar (embedding_net.py:220-259).
- EmbeddingNet: mode 'pose' (autoencoder: the FGD feature net) or
  text/audio-conditional with a decoder driven by either latent
  (embedding_net.py:262-314).

Known reference quirk preserved: every ``nn.LeakyReLU(True)`` site is an
identity (negative_slope=1.0); those sites call ``identity_leaky_relu``.

TPU design notes: layouts are NWC, convs map onto XLA's fused conv/matmul
path; the GRU decoders use the fused-projection scan in ops/recurrent.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import (BatchNorm, TorchConv, TorchConvTranspose,
                          TorchDense, identity_leaky_relu, leaky_relu)
from ..ops.recurrent import GRU
from .encoders import TextEncoderTCN, WavEncoder


def reparameterize(rng, mu, logvar):
    """z = mu + eps * exp(0.5*logvar) (reference embedding_net.py:10-13)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return mu + eps * std


class ConvNormRelu(nn.Module):
    """Conv(+BN)+LeakyReLU(0.2) block, VALID padding
    (reference embedding_net.py:16-39)."""
    out_channels: int
    downsample: bool = False
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (4, 2) if self.downsample else (3, 1)
        x = TorchConv(self.out_channels, (k,), strides=s, padding=0)(x)
        if self.batchnorm:
            x = BatchNorm()(x, use_running_average=not train)
        return leaky_relu(x, 0.2)


class PoseEncoderConv(nn.Module):
    """Pose window -> 32-d latent (reference embedding_net.py:42-82)."""
    length: int
    dim: int

    @nn.compact
    def __call__(self, poses, variational_encoding: bool = False,
                 train: bool = False):
        # poses: (B, T, dim) — already time-major (torch transposes to NCW;
        # our convs are NWC so no transpose is needed).
        x = ConvNormRelu(32)(poses, train)
        x = ConvNormRelu(64)(x, train)
        x = ConvNormRelu(64, downsample=True)(x, train)
        x = TorchConv(32, (3,), padding=0)(x)

        # flatten in torch's channel-major order so parameter layouts stay
        # convertible: (B, T', 32) -> (B, 32, T') -> (B, 32*T')
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)

        x = TorchDense(256)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = identity_leaky_relu(x)  # quirk: nn.LeakyReLU(True)
        x = TorchDense(128)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = identity_leaky_relu(x)
        x = TorchDense(32)(x)

        mu = TorchDense(32, name="fc_mu")(x)
        logvar = TorchDense(32, name="fc_logvar")(x)
        if variational_encoding:
            z = reparameterize(self.make_rng("noise"), mu, logvar)
        else:
            z = mu
        return z, mu, logvar


class PoseDecoderFC(nn.Module):
    """MLP decoder variant (reference embedding_net.py:85-127)."""
    gen_length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent_code, pre_poses=None, train: bool = False):
        feat = latent_code
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = TorchDense(32)(pre)
            pre = BatchNorm()(pre, use_running_average=not train)
            pre = nn.relu(pre)
            pre = TorchDense(32)(pre)
            feat = jnp.concatenate([pre, latent_code], axis=1)
        x = feat
        for width in (128, 128, 256, 512):
            x = TorchDense(width)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        x = TorchDense(self.gen_length * self.pose_dim)(x)
        return x.reshape(-1, self.gen_length, self.pose_dim)


class PoseDecoderGRU(nn.Module):
    """GRU decoder used by the joint-embedding model
    (reference embedding_net.py:130-162)."""
    gen_length: int
    pose_dim: int
    hidden_size: int = 300

    @nn.compact
    def __call__(self, latent_code, pre_poses, train: bool = False):
        pre = pre_poses.reshape(pre_poses.shape[0], -1)
        pre = TorchDense(32)(pre)
        pre = BatchNorm()(pre, use_running_average=not train)
        pre = nn.relu(pre)
        pre = TorchDense(32)(pre)

        feat = jnp.concatenate([pre, latent_code], axis=1)
        feat = jnp.repeat(feat[:, None, :], self.gen_length, axis=1)

        out, _ = GRU(hidden_size=self.hidden_size, num_layers=4,
                     bidirectional=True, dropout=0.3)(
                         feat, deterministic=not train)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        out = TorchDense(self.hidden_size // 2)(out)
        out = identity_leaky_relu(out)  # quirk: nn.LeakyReLU(True)
        out = TorchDense(self.pose_dim)(out)
        return out


class PoseDecoderConv(nn.Module):
    """Latent -> pose window via transposed convs
    (reference embedding_net.py:165-217)."""
    length: int
    dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, feat, pre_poses=None, train: bool = False):
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = TorchDense(32)(pre)
            pre = BatchNorm()(pre, use_running_average=not train)
            pre = nn.relu(pre)
            pre = TorchDense(32)(pre)
            feat = jnp.concatenate([pre, feat], axis=1)

        if self.length == 64:
            x = TorchDense(128)(feat)
            x = BatchNorm()(x, use_running_average=not train)
            x = identity_leaky_relu(x)  # quirk
            x = TorchDense(256)(x)
        elif self.length == 34:
            x = TorchDense(64)(feat)
            x = BatchNorm()(x, use_running_average=not train)
            x = identity_leaky_relu(x)  # quirk
            x = TorchDense(136)(x)
        else:
            raise ValueError("unsupported decoder length %d" % self.length)

        # torch reshapes (B, 4*L) -> (B, 4ch, L); NWC equivalent: (B, L, 4)
        x = x.reshape(x.shape[0], 4, -1)
        x = jnp.swapaxes(x, 1, 2)

        x = TorchConvTranspose(32, (3,))(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        x = TorchConvTranspose(32, (3,))(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        x = TorchConv(32, (3,), padding=0)(x)
        x = TorchConv(self.dim, (3,), padding=0)(x)
        return x


class ContextEncoder(nn.Module):
    """Text+audio context -> 32-d latent (reference embedding_net.py:220-259)."""
    n_words: int
    word_embed_size: int
    hidden_size: int      # args.hidden_size for the TCN channel widths
    n_layers: int         # args.n_layers for the TCN depth
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, in_text, in_audio, train: bool = False):
        text_feat, _ = TextEncoderTCN(
            n_words=self.n_words, embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            freeze_wordembed=self.freeze_wordembed)(in_text, train=train)
        audio_feat = WavEncoder()(in_audio, train=train)
        x = jnp.concatenate([audio_feat, text_feat], axis=2)
        out, _ = GRU(hidden_size=256, num_layers=2)(x, deterministic=not train)
        last = out[:, -1]
        x = TorchDense(128)(last)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchDense(32)(x)
        mu = TorchDense(32, name="fc_mu")(x)
        logvar = TorchDense(32, name="fc_logvar")(x)
        z = reparameterize(self.make_rng("noise"), mu, logvar)
        return z, mu, logvar


class EmbeddingNet(nn.Module):
    """Pose autoencoder / joint embedding net
    (reference embedding_net.py:262-314).

    mode='pose': PoseEncoderConv + PoseDecoderConv only (the FGD net).
    other modes: + ContextEncoder and a PoseDecoderGRU, decoder driven by
    the 'speech' (context) or 'pose' latent; 'random' flips a coin
    in-graph per call.
    """
    pose_dim: int
    n_frames: int
    mode: str
    n_words: int = 0
    word_embed_size: int = 0
    hidden_size: int = 200
    n_layers: int = 2
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, in_text, in_audio, pre_poses, poses,
                 input_mode: Optional[str] = None,
                 variational_encoding: bool = False, train: bool = False):
        if input_mode is None:
            input_mode = self.mode

        context_feat = context_mu = context_logvar = None
        if self.mode != "pose" and in_text is not None and in_audio is not None:
            context_feat, context_mu, context_logvar = ContextEncoder(
                n_words=self.n_words, word_embed_size=self.word_embed_size,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                freeze_wordembed=self.freeze_wordembed)(
                    in_text, in_audio, train=train)

        poses_feat = pose_mu = pose_logvar = None
        if poses is not None:
            poses_feat, pose_mu, pose_logvar = PoseEncoderConv(
                self.n_frames, self.pose_dim)(
                    poses, variational_encoding, train=train)

        if self.mode == "pose":
            out_poses = PoseDecoderConv(self.n_frames, self.pose_dim)(
                poses_feat, pre_poses, train=train)
        else:
            if input_mode == "random":
                # per-call coin flip (reference embedding_net.py:296-297);
                # both latents exist, select in-graph
                coin = jax.random.bernoulli(self.make_rng("noise"))
                latent = jnp.where(coin, context_feat, poses_feat)
            elif input_mode == "speech":
                latent = context_feat
            elif input_mode == "pose":
                latent = poses_feat
            else:
                raise ValueError("bad input_mode %r" % (input_mode,))
            out_poses = PoseDecoderGRU(self.n_frames, self.pose_dim)(
                latent, pre_poses, train=train)

        return (context_feat, context_mu, context_logvar,
                poses_feat, pose_mu, pose_logvar, out_poses)
