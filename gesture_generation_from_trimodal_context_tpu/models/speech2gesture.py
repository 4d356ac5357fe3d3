"""Baseline 2: Speech2Gesture conv GAN (audio spectrogram -> gesture).

Behavioral contract: reference scripts/model/speech2gesture.py:106-251
(itself a torch port of amirbar/speech2gesture).

- Spectrogram 2-D conv stack with TF-"SAME" padding -> bilinear resize to
  (n_frames, 1) -> 1-D UNet (5 down / 5 up with additive skips, upsampling
  by repeat-interleave) conditioned on a 16-d pre-pose feature -> conv
  decoder -> poses.
- PatchGAN-style conv discriminator on pose *differences*.

TPU notes: flax's padding='SAME' is exactly the TF semantics the
reference re-implemented by hand (Conv1d_tf/Conv2d_tf,
speech2gesture.py:9-103), so no custom padding code is needed;
jax.image.resize(method='bilinear') matches torch's
align_corners=False upsampling.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import BatchNorm, TorchConv, TorchDense, leaky_relu


class ConvNormRelu(nn.Module):
    """TF-SAME Conv(+BN)+LeakyReLU(0.2) (reference speech2gesture.py:106-128)."""
    out_channels: int
    kind: str = "1d"          # '1d' | '2d'
    downsample: bool = False
    k: int = 0
    s: int = 0
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (self.k, self.s)
        if not k and not s:
            k, s = (4, 2) if self.downsample else (3, 1)
        ksize = (k,) if self.kind == "1d" else (k, k)
        x = TorchConv(self.out_channels, ksize, strides=s,
                      padding=self.padding)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return leaky_relu(x, 0.2)


class UnetUp(nn.Module):
    """repeat-interleave x2 upsample + additive skip + conv
    (reference speech2gesture.py:131-141)."""
    out_channels: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = jnp.repeat(x1, 2, axis=1)[:, :x2.shape[1], :]
        return ConvNormRelu(self.out_channels)(x1 + x2, train=train)


class AudioEncoder(nn.Module):
    """Spectrogram (B, n_mels, T_spec) -> (B, n_frames, 256)
    (reference speech2gesture.py:144-197)."""
    n_frames: int

    @nn.compact
    def __call__(self, spectrogram, train: bool = False):
        x = spectrogram.astype(jnp.float32)[..., None]  # NHWC, 1 channel
        x = ConvNormRelu(64, "2d")(x, train)
        x = ConvNormRelu(64, "2d", downsample=True)(x, train)
        x = ConvNormRelu(128, "2d")(x, train)
        x = ConvNormRelu(128, "2d", downsample=True)(x, train)
        x = ConvNormRelu(256, "2d")(x, train)
        x = ConvNormRelu(256, "2d", downsample=True)(x, train)
        x = ConvNormRelu(256, "2d")(x, train)
        x = ConvNormRelu(256, "2d", padding="VALID")(x, train)

        # bilinear resize (H, W) -> (n_frames, 1), torch Upsample
        # align_corners=False semantics
        x = jax.image.resize(
            x, (x.shape[0], self.n_frames, 1, x.shape[3]), method="bilinear")
        x1 = x[:, :, 0, :]  # (B, n_frames, 256)

        x2 = ConvNormRelu(256)(x1, train)
        x2 = ConvNormRelu(256)(x2, train)
        x3 = ConvNormRelu(256, downsample=True)(x2, train)
        x4 = ConvNormRelu(256, downsample=True)(x3, train)
        x5 = ConvNormRelu(256, downsample=True)(x4, train)
        x6 = ConvNormRelu(256, downsample=True)(x5, train)
        x7 = ConvNormRelu(256, downsample=True)(x6, train)
        x = UnetUp(256)(x7, x6, train)
        x = UnetUp(256)(x, x5, train)
        x = UnetUp(256)(x, x4, train)
        x = UnetUp(256)(x, x3, train)
        x = UnetUp(256)(x, x2, train)
        return x


class Generator(nn.Module):
    """(spectrogram, pre_poses) -> poses (reference speech2gesture.py:200-231)."""
    n_poses: int
    pose_dim: int
    n_pre_poses: int

    @nn.compact
    def __call__(self, in_spec, pre_poses, train: bool = False):
        audio_feat = AudioEncoder(self.n_poses)(in_spec, train=train)

        pre = pre_poses.reshape(pre_poses.shape[0], -1)
        pre = TorchDense(32)(pre)
        pre = BatchNorm()(pre, use_running_average=not train)
        pre = nn.relu(pre)
        pre = TorchDense(16)(pre)
        pre = jnp.repeat(pre[:, None, :], self.n_poses, axis=1)

        x = jnp.concatenate([audio_feat, pre], axis=2)
        x = ConvNormRelu(256)(x, train)
        x = ConvNormRelu(256)(x, train)
        x = ConvNormRelu(256)(x, train)
        x = ConvNormRelu(256)(x, train)
        x = TorchConv(self.pose_dim, (1,), strides=1, padding=0)(x)
        return x


class Discriminator(nn.Module):
    """PatchGAN on pose differences (reference speech2gesture.py:234-250)."""
    pose_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, 1:] - x[:, :-1]  # pose differences
        x = TorchConv(64, (4,), strides=2, padding="SAME")(x)
        x = leaky_relu(x, 0.2)
        x = ConvNormRelu(128, downsample=True)(x, train)
        x = ConvNormRelu(256, k=4, s=1)(x, train)
        x = TorchConv(1, (4,), strides=1, padding="SAME")(x)
        return x
