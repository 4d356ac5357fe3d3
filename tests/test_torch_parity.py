"""Full-module numerical parity vs torch-built equivalents.

These tests construct the reference architectures with torch layers
(torch CPU is available in the test environment), copy our flax
parameters into them, and compare outputs in eval mode.  This validates
conv striding/padding, BatchNorm semantics, weight-norm, gate math, and
layout conversions end to end — not just individual ops."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.models.encoders import (
    TemporalConvNet, WavEncoder)
from gesture_generation_from_trimodal_context_tpu.models.multimodal_context import (
    ConvDiscriminator)

ATOL = 2e-4  # f32 conv reassociation noise


def _conv_w(flax_kernel):
    """flax (k, in, out) -> torch (out, in, k)."""
    return torch.tensor(np.asarray(flax_kernel).transpose(2, 1, 0))


def _copy_bn(tbn, scope_params, scope_stats):
    tbn.weight.data = torch.tensor(np.asarray(scope_params["scale"]))
    tbn.bias.data = torch.tensor(np.asarray(scope_params["bias"]))
    tbn.running_mean.data = torch.tensor(np.asarray(scope_stats["mean"]))
    tbn.running_var.data = torch.tensor(np.asarray(scope_stats["var"]))


def test_wav_encoder_parity():
    m = WavEncoder()
    x = np.random.RandomState(0).randn(2, 36267).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(v, jnp.asarray(x), train=False))

    p, s = v["params"], v["batch_stats"]
    tm = torch.nn.Sequential(
        torch.nn.Conv1d(1, 16, 15, stride=5, padding=1600),
        torch.nn.BatchNorm1d(16), torch.nn.LeakyReLU(0.3),
        torch.nn.Conv1d(16, 32, 15, stride=6),
        torch.nn.BatchNorm1d(32), torch.nn.LeakyReLU(0.3),
        torch.nn.Conv1d(32, 64, 15, stride=6),
        torch.nn.BatchNorm1d(64), torch.nn.LeakyReLU(0.3),
        torch.nn.Conv1d(64, 32, 15, stride=6),
    )
    for i, ci in enumerate([0, 3, 6, 9]):
        conv_scope = p["TorchConv_%d" % i]["Conv_0"]
        tm[ci].weight.data = _conv_w(conv_scope["kernel"])
        tm[ci].bias.data = torch.tensor(np.asarray(conv_scope["bias"]))
    for i, bi in enumerate([1, 4, 7]):
        _copy_bn(tm[bi], p["BatchNorm_%d" % i]["BatchNorm_0"],
                 s["BatchNorm_%d" % i]["BatchNorm_0"])
    tm.eval()
    with torch.no_grad():
        ty = tm(torch.tensor(x).unsqueeze(1)).transpose(1, 2).numpy()
    assert y.shape == ty.shape == (2, 34, 32)
    np.testing.assert_allclose(y, ty, atol=ATOL)


def test_conv_discriminator_parity():
    m = ConvDiscriminator(input_size=27)
    x = np.random.RandomState(1).randn(3, 34, 27).astype(np.float32) * 0.3
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(v, jnp.asarray(x), train=False))

    p, s = v["params"], v["batch_stats"]

    class TD(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pre_conv = torch.nn.Sequential(
                torch.nn.Conv1d(27, 16, 3), torch.nn.BatchNorm1d(16),
                torch.nn.Identity(),  # LeakyReLU(True) quirk == identity
                torch.nn.Conv1d(16, 8, 3), torch.nn.BatchNorm1d(8),
                torch.nn.Identity(),
                torch.nn.Conv1d(8, 8, 3),
            )
            self.gru = torch.nn.GRU(8, 64, num_layers=4, bidirectional=True,
                                    batch_first=True)
            self.out = torch.nn.Linear(64, 1)
            self.out2 = torch.nn.Linear(28, 1)

        def forward(self, poses):
            f = self.pre_conv(poses.transpose(1, 2)).transpose(1, 2)
            o, _ = self.gru(f)
            o = o[:, :, :64] + o[:, :, 64:]
            b = poses.shape[0]
            o = self.out(o.reshape(-1, 64)).view(b, -1)
            return torch.sigmoid(self.out2(o))

    tm = TD()
    for i, ci in enumerate([0, 3, 6]):
        conv_scope = p["TorchConv_%d" % i]["Conv_0"]
        tm.pre_conv[ci].weight.data = _conv_w(conv_scope["kernel"])
        tm.pre_conv[ci].bias.data = torch.tensor(
            np.asarray(conv_scope["bias"]))
    for i, bi in enumerate([1, 4]):
        _copy_bn(tm.pre_conv[bi], p["BatchNorm_%d" % i]["BatchNorm_0"],
                 s["BatchNorm_%d" % i]["BatchNorm_0"])
    gp = p["GRU_0"]
    for layer in range(4):
        for sfx in ("l%d" % layer, "l%d_reverse" % layer):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                getattr(tm.gru, "%s_%s" % (kind, sfx)).data = torch.tensor(
                    np.asarray(gp["%s_%s" % (kind, sfx)]))
    for tl, scope in ((tm.out, "TorchDense_0"), (tm.out2, "TorchDense_1")):
        tl.weight.data = torch.tensor(
            np.asarray(p[scope]["Dense_0"]["kernel"]).T)
        tl.bias.data = torch.tensor(np.asarray(p[scope]["Dense_0"]["bias"]))
    tm.eval()
    with torch.no_grad():
        ty = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(y, ty, atol=ATOL)


def test_tcn_parity():
    """Weight-normalized dilated causal TCN vs torch weight_norm + Chomp."""
    m = TemporalConvNet(num_channels=(12, 12), kernel_size=2, dropout=0.0)
    x = np.random.RandomState(2).randn(2, 20, 12).astype(np.float32)
    v = m.init(jax.random.PRNGKey(3), jnp.asarray(x))
    y = np.asarray(m.apply(v, jnp.asarray(x), train=False))

    class Chomp(torch.nn.Module):
        def __init__(self, n):
            super().__init__()
            self.n = n

        def forward(self, t):
            return t[:, :, :-self.n]

    blocks = []
    p = v["params"]
    for bi in range(2):
        dilation = 2 ** bi
        pad = (2 - 1) * dilation
        convs = []
        for ci in range(2):
            c = torch.nn.utils.parametrizations.weight_norm(
                torch.nn.Conv1d(12, 12, 2, dilation=dilation, padding=pad))
            scope = p["TemporalBlock_%d" % bi]["WNConv1d_%d" % ci]
            vk = np.asarray(scope["wn"]["v"]).transpose(2, 1, 0)
            gk = np.asarray(scope["wn"]["g"]).reshape(-1, 1, 1)
            c.parametrizations.weight.original1.data = torch.tensor(vk)
            c.parametrizations.weight.original0.data = torch.tensor(gk)
            c.bias.data = torch.tensor(np.asarray(scope["bias"]))
            convs += [c, Chomp(pad), torch.nn.ReLU()]
        blocks.append(torch.nn.Sequential(*convs))

    with torch.no_grad():
        t = torch.tensor(x).transpose(1, 2)
        for block in blocks:
            t = torch.relu(block(t) + t)  # residual (channels equal)
        ty = t.transpose(1, 2).numpy()
    np.testing.assert_allclose(y, ty, atol=ATOL)
