"""Inference parity against the ACTUAL reference implementation.

The reference PyTorch code (read-only at /root/reference) runs on CPU
torch here; we copy this framework's initialized parameters into the
reference modules and require outputs to agree within the 1e-3 target of
BASELINE.md ("inference pose outputs matching reference within 1e-3").
This is the strongest fidelity check available without the TED dataset.
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference/scripts"


@pytest.fixture(scope="module")
def ref_models():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference's vocab.py imports fasttext at module scope; stub it
    if "fasttext" not in sys.modules:
        sys.modules["fasttext"] = types.ModuleType("fasttext")
    # embedding_net must import first (the reference's circular import
    # between the two modules only resolves in that order)
    import model.embedding_net as ref_embed
    import model.multimodal_context_net as ref_mmc
    return ref_mmc, ref_embed


def _np(x):
    return np.asarray(x)


def _set_linear(tlin, scope):
    tlin.weight.data = torch.tensor(_np(scope["Dense_0"]["kernel"]).T)
    tlin.bias.data = torch.tensor(_np(scope["Dense_0"]["bias"]))


def _set_conv(tconv, scope):
    tconv.weight.data = torch.tensor(
        _np(scope["Conv_0"]["kernel"]).transpose(2, 1, 0))
    tconv.bias.data = torch.tensor(_np(scope["Conv_0"]["bias"]))


def _set_bn(tbn, pscope, sscope):
    tbn.weight.data = torch.tensor(_np(pscope["BatchNorm_0"]["scale"]))
    tbn.bias.data = torch.tensor(_np(pscope["BatchNorm_0"]["bias"]))
    tbn.running_mean.data = torch.tensor(_np(sscope["BatchNorm_0"]["mean"]))
    tbn.running_var.data = torch.tensor(_np(sscope["BatchNorm_0"]["var"]))


def _set_gru(tgru, scope, n_layers, bidirectional):
    for layer in range(n_layers):
        for sfx in (["l%d" % layer] +
                    (["l%d_reverse" % layer] if bidirectional else [])):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                getattr(tgru, "%s_%s" % (kind, sfx)).data = torch.tensor(
                    _np(scope["%s_%s" % (kind, sfx)]))


def _set_wav_encoder(tenc, p, s):
    seq = tenc.feat_extractor
    for i, ci in enumerate([0, 3, 6, 9]):
        _set_conv(seq[ci], p["TorchConv_%d" % i])
    for i, bi in enumerate([1, 4, 7]):
        _set_bn(seq[bi], p["BatchNorm_%d" % i], s["BatchNorm_%d" % i])


def _set_wn_conv(tconv, scope):
    """Reference TCN convs use torch.nn.utils.weight_norm (weight_g/_v)."""
    v = _np(scope["wn"]["v"]).transpose(2, 1, 0)
    g = _np(scope["wn"]["g"]).reshape(-1, 1, 1)
    tconv.weight_v.data = torch.tensor(v)
    tconv.weight_g.data = torch.tensor(g)
    tconv.bias.data = torch.tensor(_np(scope["bias"]))


def _set_text_encoder(tenc, p, s):
    tenc.embedding.weight.data = torch.tensor(_np(p["embedding"]))
    tcn_p = p["TemporalConvNet_0"]
    for bi, block in enumerate(tenc.tcn.network):
        bp = tcn_p["TemporalBlock_%d" % bi]
        _set_wn_conv(block.conv1, bp["WNConv1d_0"])
        _set_wn_conv(block.conv2, bp["WNConv1d_1"])
        if block.downsample is not None:
            _set_conv(block.downsample, bp["TorchConv_0"])
    _set_linear(tenc.decoder, p["TorchDense_0"])


def test_pose_generator_matches_reference(ref_models):
    """Full trimodal generator (text + audio + pre-seq, z_type none)."""
    ref_mmc, _ = ref_models
    from gesture_generation_from_trimodal_context_tpu.models.multimodal_context import (
        PoseGenerator)

    n_words, embed, hidden, layers, pose_dim = 30, 16, 24, 2, 27
    ours = PoseGenerator(pose_dim=pose_dim, n_words=n_words,
                         word_embed_size=embed, hidden_size=hidden,
                         n_layers=layers, z_type="none")
    rng = np.random.RandomState(0)
    pre_seq = jnp.asarray(0.1 * rng.randn(2, 34, pose_dim + 1),
                          jnp.float32)
    in_text = jnp.asarray(rng.randint(0, n_words, (2, 34)), jnp.int32)
    in_audio = jnp.asarray(0.1 * rng.randn(2, 36267), jnp.float32)
    v = ours.init({"params": jax.random.PRNGKey(0),
                   "noise": jax.random.PRNGKey(1)},
                  pre_seq, in_text, in_audio, None)
    out, _, _, _ = ours.apply(v, pre_seq, in_text, in_audio, None,
                              train=False)

    args = SimpleNamespace(n_pre_poses=4, n_poses=34, hidden_size=hidden,
                           n_layers=layers, dropout_prob=0.3,
                           input_context="both", freeze_wordembed=False)
    ref = ref_mmc.PoseGenerator(args, pose_dim=pose_dim, n_words=n_words,
                                word_embed_size=embed, word_embeddings=None,
                                z_obj=None)
    p, s = v["params"], v["batch_stats"]
    _set_wav_encoder(ref.audio_encoder, p["WavEncoder_0"], s["WavEncoder_0"])
    _set_text_encoder(ref.text_encoder, p["TextEncoderTCN_0"],
                      s.get("TextEncoderTCN_0", {}))
    _set_gru(ref.gru, p["GRU_0"], layers, bidirectional=True)
    _set_linear(ref.out[0], p["TorchDense_0"])
    _set_linear(ref.out[2], p["TorchDense_1"])
    ref.eval()
    with torch.no_grad():
        t_out, *_ = ref(torch.tensor(np.asarray(pre_seq)),
                        torch.tensor(np.asarray(in_text), dtype=torch.long),
                        torch.tensor(np.asarray(in_audio)), None)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-3)
    # and typically much tighter:
    assert np.abs(np.asarray(out) - t_out.numpy()).max() < 3e-4


def test_fgd_autoencoder_matches_reference(ref_models):
    """EmbeddingNet mode='pose' (the FGD feature net): latents AND
    reconstructions must match — FGD parity depends on this network."""
    _, ref_embed = ref_models
    from gesture_generation_from_trimodal_context_tpu.models.embedding_net import (
        EmbeddingNet)

    pose_dim, n_frames = 27, 34
    ours = EmbeddingNet(pose_dim=pose_dim, n_frames=n_frames, mode="pose")
    rng = np.random.RandomState(1)
    poses = jnp.asarray(0.2 * rng.randn(3, n_frames, pose_dim), jnp.float32)
    v = ours.init({"params": jax.random.PRNGKey(0),
                   "noise": jax.random.PRNGKey(1)},
                  None, None, None, poses, "pose")
    _, _, _, feat, mu, logvar, recon = ours.apply(
        v, None, None, None, poses, "pose", train=False)

    ref = ref_embed.EmbeddingNet(None, pose_dim, n_frames, None, None,
                                 None, mode="pose")
    p, s = v["params"], v["batch_stats"]
    pe_p, pe_s = p["PoseEncoderConv_0"], s["PoseEncoderConv_0"]
    # encoder conv stack: net = [CNR, CNR, CNR(down), Conv1d]
    for i in range(3):
        cnr = ref.pose_encoder.net[i]
        _set_conv(cnr[0], pe_p["ConvNormRelu_%d" % i]["TorchConv_0"])
        _set_bn(cnr[1], pe_p["ConvNormRelu_%d" % i]["BatchNorm_0"],
                pe_s["ConvNormRelu_%d" % i]["BatchNorm_0"])
    _set_conv(ref.pose_encoder.net[3], pe_p["TorchConv_0"])
    # out_net = [Linear, BN, lrelu, Linear, BN, lrelu, Linear]
    for li, (di, bi) in enumerate([(0, 1), (3, 4)]):
        _set_linear(ref.pose_encoder.out_net[di],
                    pe_p["TorchDense_%d" % li])
        _set_bn(ref.pose_encoder.out_net[bi],
                pe_p["BatchNorm_%d" % li], pe_s["BatchNorm_%d" % li])
    _set_linear(ref.pose_encoder.out_net[6], pe_p["TorchDense_2"])
    _set_linear(ref.pose_encoder.fc_mu, pe_p["fc_mu"])
    _set_linear(ref.pose_encoder.fc_logvar, pe_p["fc_logvar"])

    pd_p, pd_s = p["PoseDecoderConv_0"], s["PoseDecoderConv_0"]
    # pre_net = [Linear, BN, lrelu, Linear]
    _set_linear(ref.decoder.pre_net[0], pd_p["TorchDense_0"])
    _set_bn(ref.decoder.pre_net[1], pd_p["BatchNorm_0"],
            pd_s["BatchNorm_0"])
    _set_linear(ref.decoder.pre_net[3], pd_p["TorchDense_1"])
    # net = [ConvT, BN, lrelu, ConvT, BN, lrelu, Conv, Conv]
    for ti, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        ct = ref.decoder.net[ci]
        k = _np(pd_p["TorchConvTranspose_%d" % ti]["ConvTranspose_0"]
                ["kernel"])
        # flax ConvTranspose kernel (k, in, out) == torch (in, out, k)
        # transposed to (k, in, out) and flipped along k
        ct.weight.data = torch.tensor(
            np.ascontiguousarray(k[::-1].transpose(1, 2, 0)))
        ct.bias.data = torch.tensor(
            _np(pd_p["TorchConvTranspose_%d" % ti]["ConvTranspose_0"]
                ["bias"]))
        _set_bn(ref.decoder.net[bi], pd_p["BatchNorm_%d" % (ti + 1)],
                pd_s["BatchNorm_%d" % (ti + 1)])
    _set_conv(ref.decoder.net[6], pd_p["TorchConv_0"])
    _set_conv(ref.decoder.net[7], pd_p["TorchConv_1"])

    ref.eval()
    with torch.no_grad():
        _, _, _, t_feat, t_mu, t_lv, t_recon = ref(
            None, None, None, torch.tensor(np.asarray(poses)), "pose",
            variational_encoding=False)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), t_recon.numpy(),
                               atol=1e-3)


def _set_cnr1d(tseq, pscope, sscope):
    """reference s2g ConvNormRelu Sequential[Conv_tf, BN, LeakyReLU]."""
    _set_conv(tseq[0], pscope["TorchConv_0"])
    _set_bn(tseq[1], pscope["BatchNorm_0"], sscope["BatchNorm_0"])


def _set_cnr2d(tseq, pscope, sscope):
    tseq[0].weight.data = torch.tensor(
        _np(pscope["TorchConv_0"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1))
    tseq[0].bias.data = torch.tensor(
        _np(pscope["TorchConv_0"]["Conv_0"]["bias"]))
    _set_bn(tseq[1], pscope["BatchNorm_0"], sscope["BatchNorm_0"])


class _SanitizedConvInit:
    """The reference's Conv1d_tf/Conv2d_tf pass padding='SAME'/'VALID' to
    the torch conv constructors, which modern torch rejects; the subclass
    re-sets self.padding afterwards, so constructing with padding=0 is
    equivalent.  Patch the base inits while building reference modules."""

    def __enter__(self):
        self.saved = (torch.nn.Conv1d.__init__, torch.nn.Conv2d.__init__)

        def wrap(orig):
            def init(self_, *args, **kwargs):
                if isinstance(kwargs.get("padding"), str) and \
                        kwargs["padding"].isupper():
                    kwargs["padding"] = 0
                return orig(self_, *args, **kwargs)
            return init

        torch.nn.Conv1d.__init__ = wrap(self.saved[0])
        torch.nn.Conv2d.__init__ = wrap(self.saved[1])
        return self

    def __exit__(self, *exc):
        torch.nn.Conv1d.__init__, torch.nn.Conv2d.__init__ = self.saved


def test_speech2gesture_matches_reference():
    """Full s2g generator + discriminator vs the reference torch port."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.speech2gesture as ref_s2g
    from gesture_generation_from_trimodal_context_tpu.models import (
        speech2gesture as ours_mod)

    n_poses, pose_dim, n_pre = 34, 27, 4
    ours = ours_mod.Generator(n_poses=n_poses, pose_dim=pose_dim,
                              n_pre_poses=n_pre)
    rng = np.random.RandomState(3)
    spec = jnp.asarray(rng.randn(2, 128, 70), jnp.float32)
    pre = jnp.asarray(0.1 * rng.randn(2, n_pre, pose_dim), jnp.float32)
    v = ours.init(jax.random.PRNGKey(0), spec, pre)
    out = ours.apply(v, spec, pre, train=False)

    with _SanitizedConvInit():
        ref = ref_s2g.Generator(n_poses, pose_dim, n_pre)
    p, s = v["params"], v["batch_stats"]
    ap, as_ = p["AudioEncoder_0"], s["AudioEncoder_0"]
    for i in range(8):
        _set_cnr2d(ref.audio_encoder.first_net[i],
                   ap["ConvNormRelu_%d" % i], as_["ConvNormRelu_%d" % i])
    _set_cnr1d(ref.audio_encoder.down1[0], ap["ConvNormRelu_8"],
               as_["ConvNormRelu_8"])
    _set_cnr1d(ref.audio_encoder.down1[1], ap["ConvNormRelu_9"],
               as_["ConvNormRelu_9"])
    for i, name in enumerate(["down2", "down3", "down4", "down5", "down6"]):
        _set_cnr1d(getattr(ref.audio_encoder, name),
                   ap["ConvNormRelu_%d" % (10 + i)],
                   as_["ConvNormRelu_%d" % (10 + i)])
    for i in range(5):
        _set_cnr1d(getattr(ref.audio_encoder, "up%d" % (i + 1)).conv,
                   ap["UnetUp_%d" % i]["ConvNormRelu_0"],
                   as_["UnetUp_%d" % i]["ConvNormRelu_0"])
    _set_linear(ref.pre_pose_encoder[0], p["TorchDense_0"])
    _set_bn(ref.pre_pose_encoder[1], p["BatchNorm_0"], s["BatchNorm_0"])
    _set_linear(ref.pre_pose_encoder[3], p["TorchDense_1"])
    for i in range(4):
        _set_cnr1d(ref.decoder[i], p["ConvNormRelu_%d" % i],
                   s["ConvNormRelu_%d" % i])
    _set_conv(ref.final_out, p["TorchConv_0"])

    ref.eval()
    with torch.no_grad():
        t_out = ref(torch.tensor(np.asarray(spec)),
                    torch.tensor(np.asarray(pre))).numpy()
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-3)

    # discriminator
    d_ours = ours_mod.Discriminator(pose_dim=pose_dim)
    dv = d_ours.init(jax.random.PRNGKey(1), jnp.asarray(out))
    d_out = d_ours.apply(dv, jnp.asarray(out), train=False)
    with _SanitizedConvInit():
        d_ref = ref_s2g.Discriminator(pose_dim)
    dp, ds = dv["params"], dv["batch_stats"]
    _set_conv(d_ref.net[0], dp["TorchConv_0"])
    _set_cnr1d(d_ref.net[2], dp["ConvNormRelu_0"], ds["ConvNormRelu_0"])
    _set_cnr1d(d_ref.net[3], dp["ConvNormRelu_1"], ds["ConvNormRelu_1"])
    _set_conv(d_ref.net[4], dp["TorchConv_1"])
    d_ref.eval()
    with torch.no_grad():
        t_d = d_ref(torch.tensor(t_out)).numpy()
    np.testing.assert_allclose(np.asarray(d_out)[:, :, 0],
                               t_d[:, 0, :], atol=1e-3)


def test_seq2seq_matches_reference():
    """Attention seq2seq: full autoregressive decode must match."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.seq2seq_net as ref_s2s
    from gesture_generation_from_trimodal_context_tpu.models.seq2seq import (
        Seq2SeqNet)

    n_words, embed, hidden, layers, pose_dim, n_frames = 25, 12, 20, 2, 27, 34
    ours = Seq2SeqNet(pose_dim=pose_dim, n_frames=n_frames, n_pre_poses=4,
                      n_words=n_words, word_embed_size=embed,
                      hidden_size=hidden, n_layers=layers, dropout_prob=0.1)
    rng = np.random.RandomState(4)
    words = rng.randint(1, n_words, (2, 9)).astype(np.int32)
    words[1, 6:] = 0  # pad
    lengths = np.array([9, 6], np.int32)  # descending (torch pack req.)
    poses = (0.1 * rng.randn(2, n_frames, pose_dim)).astype(np.float32)
    v = ours.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)},
                  jnp.asarray(words), jnp.asarray(lengths),
                  jnp.asarray(poses))
    out = ours.apply(v, jnp.asarray(words), jnp.asarray(lengths),
                     jnp.asarray(poses), train=False)

    args = SimpleNamespace(hidden_size=hidden, n_layers=layers,
                           dropout_prob=0.1, n_pre_poses=4,
                           GAN_noise_size=0)
    ref = ref_s2s.Seq2SeqNet(args, pose_dim, n_frames, n_words, embed,
                             None)
    p, s = v["params"], v["batch_stats"]
    ep = p["EncoderRNN_0"]
    ref.encoder.embedding.weight.data = torch.tensor(_np(ep["embedding"]))
    _set_gru(ref.encoder.gru, ep, layers, bidirectional=True)
    dec = ref.decoder.decoder  # BahdanauAttnDecoderRNN
    dp = p["decoder"]
    dstat = s["decoder"]
    _set_linear(dec.pre_linear[0], dp["pre_linear"])
    _set_bn(dec.pre_linear[1], dp["BatchNorm_0"], dstat["BatchNorm_0"])
    _set_linear(dec.attn.attn, dp["Attn_0"]["attn"])
    dec.attn.v.data = torch.tensor(_np(dp["Attn_0"]["v"]))
    _set_gru(dec.gru, dp["GRUCell_0"], layers, bidirectional=False)
    _set_linear(dec.out, dp["out"])

    ref.eval()
    with torch.no_grad():
        t_out = ref(torch.tensor(words, dtype=torch.long),
                    torch.tensor(lengths, dtype=torch.long),
                    torch.tensor(poses), None).numpy()
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-3)


def test_motion_filter_checks_match_reference():
    """Predicate-level parity with the reference MotionPreprocessor.

    The reference's get() wrapper is not executable on modern numpy (its
    `skeletons != []` array-vs-list comparison now raises), so the three
    check methods are compared directly on diverse windows."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from data_loader.motion_preprocessor import MotionPreprocessor
    from gesture_generation_from_trimodal_context_tpu.data.motion_filter import (
        MotionFilter)
    from gesture_generation_from_trimodal_context_tpu.data import synthetic

    rng = np.random.RandomState(0)
    mean_pose = synthetic.MEAN_POSE
    cases = [synthetic.synthetic_pose_sequence(34, 15, rng, i * 0.9)
             for i in range(5)]
    cases.append(np.tile(mean_pose.reshape(1, 10, 3) + 0.05, (34, 1, 1)))
    cases.append(np.tile(mean_pose.reshape(1, 10, 3), (34, 1, 1))
                 + 0.001 * rng.randn(34, 10, 3))
    tilted = synthetic.synthetic_pose_sequence(34, 15, rng)
    c, s_ = np.cos(0.8), np.sin(0.8)
    rot = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1.0]])
    cases.append(tilted @ rot.T)
    for i in range(5):
        cases.append(0.3 * rng.randn(34, 10, 3) + mean_pose.reshape(10, 3))

    for i, skel in enumerate(cases):
        ours = MotionFilter(skel.copy(), mean_pose)
        ref = MotionPreprocessor(skel.copy(), mean_pose)
        assert ours.check_pose_diff() == ref.check_pose_diff(), i
        assert ours.check_spine_angle() == ref.check_spine_angle(), i
        assert ours.check_static_motion() == ref.check_static_motion(), i


def test_seq2seq_custom_loss_matches_reference():
    """Loss-formula parity with the reference's custom_loss
    (train_eval/train_seq2seq.py:6-33), evaluated on identical tensors."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from train_eval.train_seq2seq import custom_loss as ref_loss
    from gesture_generation_from_trimodal_context_tpu.train.seq2seq_step import (
        custom_loss as our_loss)

    args = SimpleNamespace(loss_regression_weight=250.0,
                           loss_kld_weight=0.1, loss_reg_weight=25.0)
    rng = np.random.RandomState(5)
    out = rng.randn(4, 34, 27).astype(np.float32)
    tgt = rng.randn(4, 34, 27).astype(np.float32)
    ours = float(our_loss(jnp.asarray(out), jnp.asarray(tgt), args))
    theirs = float(ref_loss(torch.tensor(out), torch.tensor(tgt), args,
                            epoch=0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_huber_beta_trick_matches_torch():
    """smooth_l1(x/b, y/b)*b — the GAN regression loss's beta-scaling
    trick (reference train_gan.py:53-54,69) — matches torch exactly."""
    import torch.nn.functional as F
    from gesture_generation_from_trimodal_context_tpu.train.common import (
        smooth_l1, smooth_l1_none)
    rng = np.random.RandomState(0)
    a = rng.randn(8, 34, 27).astype(np.float32)
    b = rng.randn(8, 34, 27).astype(np.float32)
    for beta in (0.1, 0.05):
        ours = float(smooth_l1(jnp.asarray(a), jnp.asarray(b), beta))
        theirs = float(F.smooth_l1_loss(torch.tensor(a) / beta,
                                        torch.tensor(b) / beta) * beta)
        assert abs(ours - theirs) < 1e-5
        np.testing.assert_allclose(
            np.asarray(smooth_l1_none(jnp.asarray(a), jnp.asarray(b), beta)),
            (F.smooth_l1_loss(torch.tensor(a) / beta,
                              torch.tensor(b) / beta,
                              reduction="none") * beta).numpy(), atol=1e-5)
