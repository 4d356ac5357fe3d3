"""Shared flax layers with torch-default initialization and reference quirks.

Notes on fidelity:
- ``identity_leaky_relu``: the reference writes ``nn.LeakyReLU(True)`` in
  many places (e.g. multimodal_context_net.py:102,216,219,
  embedding_net.py:57,60,147); in PyTorch that sets negative_slope=1.0,
  i.e. the activation is the identity.  The reference README acknowledges
  the bug and keeps it for reproducibility; we do the same, explicitly.
- ``WNConv1d``: torch ``weight_norm`` (dim=0) as used by the TCN
  (reference scripts/model/tcn.py:19-26): w = g * v / ||v|| with the norm
  per output channel, v initialized N(0, 0.01), g initialized to ||v||.
"""

from typing import Any, Sequence, Union

# flax-convention BatchNorm momentum (torch momentum 0.1):
# running = m*running + (1-m)*batch.  The fused/folded GAN steps'
# running-stat chain reconstruction (train/gan.py) depends on this
# exact value — change them together.
BN_MOMENTUM = 0.9

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import torch_linear_kernel_init, torch_conv_kernel_init, torch_bias_init


def identity_leaky_relu(x):
    """nn.LeakyReLU(True) == LeakyReLU(negative_slope=1.0) == identity.

    Kept (with its name) so every quirk site in the models is greppable."""
    return x


def leaky_relu(x, negative_slope):
    return jnp.where(x >= 0, x, negative_slope * x)


class TorchDense(nn.Module):
    """nn.Linear with torch default init."""
    features: int
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        bias_init = self.bias_init or torch_bias_init(in_features)
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=kernel_init, bias_init=bias_init)(x)


class TorchConv(nn.Module):
    """nn.Conv1d/2d with torch default init.  NWC/NHWC layouts."""
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Any = 0  # int, 'SAME', 'VALID', or [(lo, hi), ...]
    input_dilation: Union[int, Sequence[int]] = 1
    kernel_dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        ksize = tuple(self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * len(ksize)
        receptive = 1
        for k in ksize:
            receptive *= k
        kernel_init = self.kernel_init or torch_conv_kernel_init
        return nn.Conv(self.features, ksize, strides=self.strides,
                       padding=pad, input_dilation=self.input_dilation,
                       kernel_dilation=self.kernel_dilation,
                       use_bias=self.use_bias,
                       kernel_init=kernel_init,
                       bias_init=torch_bias_init(in_features * receptive))(x)


class TorchConvTranspose(nn.Module):
    """nn.ConvTranspose1d (stride 1, no padding) with torch default init.

    For stride=1, padding=0 a transposed conv equals a conv with full
    padding (k-1 on both sides) over the *flipped* kernel; flax's
    nn.ConvTranspose implements exactly this, so we use it directly.
    Torch init bound uses fan_in = in_channels * kernel (same as Conv).
    """
    features: int
    kernel_size: Sequence[int]

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        ksize = tuple(self.kernel_size)
        receptive = 1
        for k in ksize:
            receptive *= k
        return nn.ConvTranspose(
            self.features, ksize, strides=(1,) * len(ksize), padding="VALID",
            use_bias=True, kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(in_features * receptive))(x)


class BatchNorm(nn.Module):
    """BatchNorm1d/2d with torch semantics (momentum 0.1, eps 1e-5).

    flax momentum convention: running = m*running + (1-m)*batch, so torch
    momentum 0.1 == flax momentum 0.9.  Channel axis is last (NWC)."""
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        return nn.BatchNorm(use_running_average=ura, momentum=BN_MOMENTUM,
                            epsilon=1e-5)(x)


def _wn_init(kernel_shape, std=0.01):
    """Init {'v', 'g'} for weight-norm conv: v ~ N(0, std), g = ||v|| per
    output channel (torch weight_norm captures g from the initial weight)."""

    def init(key, _unused_shape=None):
        v = std * jax.random.normal(key, kernel_shape)
        g = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(len(kernel_shape) - 1))))
        return {"v": v, "g": g}

    return init


class WNConv1d(nn.Module):
    """Weight-normalized causal-capable Conv1d (torch weight_norm dim=0).

    Input (B, T, C); kernel shape (k, in, out); norm over (k, in) per out
    channel.  ``padding`` is [(lo, hi)] explicit."""
    features: int
    kernel_size: int
    padding: Sequence[Sequence[int]]
    kernel_dilation: int = 1
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        wn = self.param("wn", _wn_init(kshape, self.init_std))
        v, g = wn["v"], wn["g"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        kernel = g[None, None, :] * v / jnp.maximum(norm, 1e-12)
        bias = self.param("bias",
                          torch_bias_init(in_ch * self.kernel_size),
                          (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=tuple(map(tuple, self.padding)),
            rhs_dilation=(self.kernel_dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + bias
