"""Shared modality encoders: raw-audio conv encoder and dilated-conv text
encoder.

Behavioral contract:
- WavEncoder (reference scripts/model/multimodal_context_net.py:9-28):
  raw 16 kHz audio (36267 samples for a 34-frame window) -> (B, 34, 32)
  via four strided Conv1d (k=15; strides 5,6,6,6; first pad 1600) with
  BN + LeakyReLU(0.3) between (none after the last conv).
- TemporalConvNet (reference scripts/model/tcn.py:7-64, vendored from
  locuslab/TCN): dilated causal residual blocks with weight-normalized
  convs.  The reference pads both sides then crops the right ("Chomp");
  we left-pad only, which is numerically identical and avoids the slice.
- TextEncoderTCN (reference multimodal_context_net.py:31-61): fastText
  embedding (optionally frozen) -> TCN -> Linear to 32 channels.

Pretrained word embeddings are loaded by overwriting the 'embedding'
param after init (models/factory.py), keeping modules free of array
attributes.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import normal_init
from ..ops.layers import BatchNorm, TorchConv, TorchDense, WNConv1d, leaky_relu


class WavEncoder(nn.Module):
    """Raw audio (B, L) -> frame-aligned features (B, T, 32)."""

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None]  # channel dim, NWC
        x = TorchConv(16, (15,), strides=5, padding=1600)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = leaky_relu(x, 0.3)
        x = TorchConv(32, (15,), strides=6, padding=0)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = leaky_relu(x, 0.3)
        x = TorchConv(64, (15,), strides=6, padding=0)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = leaky_relu(x, 0.3)
        x = TorchConv(32, (15,), strides=6, padding=0)(x)
        return x


class TemporalBlock(nn.Module):
    """Dilated causal residual block (reference tcn.py:16-46)."""
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) * self.dilation
        n_inputs = x.shape[-1]
        out = WNConv1d(self.n_outputs, self.kernel_size,
                       padding=[(pad, 0)], kernel_dilation=self.dilation)(x)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        out = WNConv1d(self.n_outputs, self.kernel_size,
                       padding=[(pad, 0)], kernel_dilation=self.dilation)(out)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)

        if n_inputs != self.n_outputs:
            res = TorchConv(self.n_outputs, (1,), padding=0,
                            kernel_init=normal_init(0.01))(x)
        else:
            res = x
        return nn.relu(out + res)


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks with dilations 1, 2, 4, ...
    (reference tcn.py:49-64)."""
    num_channels: tuple
    kernel_size: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel_size, 2 ** i, self.dropout)(
                x, train=train)
        return x


class TextEncoderTCN(nn.Module):
    """Frame-aligned word indices (B, T) -> (B, T, 32)
    (reference multimodal_context_net.py:31-61)."""
    n_words: int
    embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    kernel_size: int = 2
    dropout: float = 0.3
    emb_dropout: float = 0.1
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, word_ids, train: bool = False):
        table = self.param("embedding", normal_init(1.0),
                           (self.n_words, self.embed_size))
        if self.freeze_wordembed:
            table = jax.lax.stop_gradient(table)
        emb = jnp.take(table, word_ids, axis=0)
        emb = nn.Dropout(self.emb_dropout)(emb, deterministic=not train)

        y = TemporalConvNet((self.hidden_size,) * self.n_layers,
                            self.kernel_size, self.dropout)(emb, train=train)
        # decoder head: N(0, 0.01) weights, zero bias
        # (reference multimodal_context_net.py:53-55)
        y = TorchDense(32, kernel_init=normal_init(0.01),
                       bias_init=nn.initializers.zeros)(y)
        return y, jnp.zeros((), y.dtype)
