"""Import reference PyTorch checkpoints into this framework's format.

The reference saves ``torch.save({'args', 'epoch', 'lang_model',
'speaker_model', 'pose_dim', 'gen_dict', 'dis_dict'})`` blobs
(reference scripts/utils/train_utils.py:147-149, scripts/train.py:153-157;
the FGD autoencoder trainer saves the same minus the vocabs,
scripts/train_feature_extractor.py:155-157).  This module converts those
released artifacts — including the published ``*_checkpoint_best.bin``
generator and the ``train_h36m_gesture_autoencoder`` FGD net — into this
framework's self-describing msgpack checkpoints, so ``synthesize.py`` and
the FGD evaluator can run directly from the reference's published weights.

The torch->flax layout maps here are the exact inverses of the maps used
by tests/test_reference_parity.py (which copies flax params INTO the
reference torch modules and checks outputs to 1e-3/3e-4); the round-trip
is covered by tests/test_torch_import.py.

No torch import happens at module import time; torch is only required
when an actual torch checkpoint is read.
"""

import logging
import os
import sys
import types

import numpy as np

from ..config.parse_args import ALL_OPTIONS
from ..data.vocab import Vocab
from ..models import factory


# --------------------------------------------------------------------------
# torch.load with the reference's pickled classes mapped onto ours
# --------------------------------------------------------------------------

def _load_torch_blob(path):
    """torch.load a reference checkpoint.  The blob pickles
    ``model.vocab.Vocab`` instances; if the reference package is not
    importable we shim ``model.vocab`` to this framework's Vocab (the two
    classes are attribute-identical by design)."""
    import torch

    added = []
    if "model.vocab" not in sys.modules:
        from ..data import vocab as our_vocab
        pkg = types.ModuleType("model")
        shim = types.ModuleType("model.vocab")
        shim.Vocab = our_vocab.Vocab
        pkg.vocab = shim
        for name, mod in (("model", pkg), ("model.vocab", shim)):
            if name not in sys.modules:
                sys.modules[name] = mod
                added.append(name)
    # the real reference model.vocab imports fasttext at module scope
    if "fasttext" not in sys.modules:
        sys.modules["fasttext"] = types.ModuleType("fasttext")
        added.append("fasttext")
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in added:
            sys.modules.pop(name, None)


def is_torch_checkpoint(path):
    """Sniff the file format: torch zip archives start with 'PK', legacy
    torch pickles with protocol marker 0x80; our msgpack maps do neither."""
    with open(path, "rb") as f:
        head = f.read(2)
    return head[:2] == b"PK" or (len(head) > 0 and head[0] == 0x80)


def _to_our_vocab(obj):
    """Reference Vocab -> ours (attribute-compatible); pass through
    ints/None (the z_type='random' sentinel / absent speaker model)."""
    if obj is None or isinstance(obj, (int, Vocab)):
        return obj
    if type(obj).__name__ == "Vocab":
        ours = Vocab.__new__(Vocab)
        ours.__dict__.update(obj.__dict__)
        return ours
    raise TypeError("unexpected vocab object %r" % (type(obj),))


def merge_args(ref_args):
    """Reference argparse namespace -> ours: same flags by construction;
    TPU-only options get their defaults."""
    d = dict(vars(ref_args))
    for opt in ALL_OPTIONS:
        if opt.name not in d:
            d[opt.name] = opt.default if not opt.append else None
    from types import SimpleNamespace
    return SimpleNamespace(**d)


# --------------------------------------------------------------------------
# state-dict accessor with full-consumption accounting
# --------------------------------------------------------------------------

class _SD:
    """Flat torch state_dict as numpy, tracking which keys were consumed
    so that mapping drift fails loudly instead of silently skipping
    weights."""

    def __init__(self, state_dict):
        self.d = {}
        for k, v in state_dict.items():
            if k.startswith("module."):   # DataParallel-era prefixes
                k = k[len("module."):]
            self.d[k] = np.asarray(v.detach().cpu().numpy()
                                   if hasattr(v, "detach") else v)
        self.used = set()

    def __contains__(self, key):
        return key in self.d

    def take(self, key):
        if key not in self.d:
            raise KeyError("torch checkpoint is missing key %r" % key)
        self.used.add(key)
        return self.d[key]

    def unused(self, allow_prefixes=()):
        left = []
        for k in self.d:
            if k in self.used or k.endswith("num_batches_tracked"):
                continue
            if any(k.startswith(p) for p in allow_prefixes):
                continue
            left.append(k)
        return sorted(left)


# ---- primitive layout inversions (see tests/test_reference_parity.py) ----

def _linear(sd, p):
    return {"Dense_0": {"kernel": sd.take(p + ".weight").T,
                        "bias": sd.take(p + ".bias")}}


def _conv1d(sd, p):
    # torch (out, in, k) -> flax (k, in, out)
    return {"Conv_0": {"kernel": sd.take(p + ".weight").transpose(2, 1, 0),
                       "bias": sd.take(p + ".bias")}}


def _conv2d(sd, p):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return {"Conv_0": {"kernel": sd.take(p + ".weight").transpose(2, 3, 1, 0),
                       "bias": sd.take(p + ".bias")}}


def _conv_transpose1d(sd, p):
    # torch (in, out, k) -> flax (k, in, out), kernel flipped along k
    w = sd.take(p + ".weight").transpose(2, 0, 1)[::-1]
    return {"ConvTranspose_0": {"kernel": np.ascontiguousarray(w),
                                "bias": sd.take(p + ".bias")}}


def _bn(sd, p):
    params = {"BatchNorm_0": {"scale": sd.take(p + ".weight"),
                              "bias": sd.take(p + ".bias")}}
    stats = {"BatchNorm_0": {"mean": sd.take(p + ".running_mean"),
                             "var": sd.take(p + ".running_var")}}
    return params, stats


def _wn_conv(sd, p):
    """torch.nn.utils.weight_norm Conv1d (weight_g/weight_v)."""
    return {"wn": {"v": sd.take(p + ".weight_v").transpose(2, 1, 0),
                   "g": sd.take(p + ".weight_g").reshape(-1)},
            "bias": sd.take(p + ".bias")}


def _gru(sd, p):
    """Our GRU stores torch-layout leaves under torch names verbatim."""
    out = {}
    layer = 0
    while "%s.weight_ih_l%d" % (p, layer) in sd:
        for sfx in ("l%d" % layer, "l%d_reverse" % layer):
            if "%s.weight_ih_%s" % (p, sfx) not in sd:
                continue
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                name = "%s_%s" % (kind, sfx)
                out[name] = sd.take("%s.%s" % (p, name))
        layer += 1
    return out


# --------------------------------------------------------------------------
# per-module converters (torch attribute names from the reference sources)
# --------------------------------------------------------------------------

def _wav_encoder(sd, p):
    """reference multimodal_context_net.py:9-28 (Sequential indices)."""
    params, stats = {}, {}
    for i, ci in enumerate([0, 3, 6, 9]):
        params["TorchConv_%d" % i] = _conv1d(sd, "%s.feat_extractor.%d" % (p, ci))
    for i, bi in enumerate([1, 4, 7]):
        bp, bs = _bn(sd, "%s.feat_extractor.%d" % (p, bi))
        params["BatchNorm_%d" % i] = bp
        stats["BatchNorm_%d" % i] = bs
    return params, stats


def _text_encoder_tcn(sd, p):
    """reference multimodal_context_net.py:31-61 + tcn.py."""
    params = {"embedding": sd.take(p + ".embedding.weight")}
    tcn = {}
    i = 0
    while "%s.tcn.network.%d.conv1.weight_v" % (p, i) in sd:
        blk = {"WNConv1d_0": _wn_conv(sd, "%s.tcn.network.%d.conv1" % (p, i)),
               "WNConv1d_1": _wn_conv(sd, "%s.tcn.network.%d.conv2" % (p, i))}
        # reference TemporalBlock registers conv1/conv2 a second time inside
        # its Sequential (tcn.py: self.net = Sequential(conv1, ..., conv2,
        # ...)); consume the aliased duplicates
        for alias in ("net.0", "net.4"):
            for leaf in ("weight_g", "weight_v", "bias"):
                k = "%s.tcn.network.%d.%s.%s" % (p, i, alias, leaf)
                if k in sd:
                    sd.take(k)
        if "%s.tcn.network.%d.downsample.weight" % (p, i) in sd:
            blk["TorchConv_0"] = _conv1d(sd, "%s.tcn.network.%d.downsample"
                                         % (p, i))
        tcn["TemporalBlock_%d" % i] = blk
        i += 1
    params["TemporalConvNet_0"] = tcn
    params["TorchDense_0"] = _linear(sd, p + ".decoder")
    return params


def convert_pose_generator(sd):
    """reference PoseGenerator (multimodal_context_net.py:64-160)."""
    params, stats = {}, {}
    if "audio_encoder.feat_extractor.0.weight" in sd:
        wp, ws = _wav_encoder(sd, "audio_encoder")
        params["WavEncoder_0"], stats["WavEncoder_0"] = wp, ws
    if "text_encoder.embedding.weight" in sd:
        params["TextEncoderTCN_0"] = _text_encoder_tcn(sd, "text_encoder")
    dense = 0
    if "speaker_embedding.0.weight" in sd:
        params["speaker_embedding"] = sd.take("speaker_embedding.0.weight")
        params["TorchDense_0"] = _linear(sd, "speaker_embedding.1")
        params["speaker_mu"] = _linear(sd, "speaker_mu")
        params["speaker_logvar"] = _linear(sd, "speaker_logvar")
        dense = 1
    params["GRU_0"] = _gru(sd, "gru")
    params["TorchDense_%d" % dense] = _linear(sd, "out.0")
    params["TorchDense_%d" % (dense + 1)] = _linear(sd, "out.2")
    return params, stats


def convert_conv_discriminator(sd):
    """reference ConvDiscriminator (multimodal_context_net.py:207-252)."""
    params, stats = {}, {}
    for i, ci in enumerate([0, 3, 6]):
        params["TorchConv_%d" % i] = _conv1d(sd, "pre_conv.%d" % ci)
    for i, bi in enumerate([1, 4]):
        bp, bs = _bn(sd, "pre_conv.%d" % bi)
        params["BatchNorm_%d" % i] = bp
        stats["BatchNorm_%d" % i] = bs
    params["GRU_0"] = _gru(sd, "gru")
    params["TorchDense_0"] = _linear(sd, "out")
    params["TorchDense_1"] = _linear(sd, "out2")
    return params, stats


def convert_gru_discriminator(sd):
    """reference recurrent ``Discriminator`` (multimodal_context_net.py:
    163-204), optionally text-conditioned (models/multimodal_context.
    GRUDiscriminator)."""
    params, stats = {}, {}
    if "text_encoder.embedding.weight" in sd:
        params["TextEncoderTCN_0"] = _text_encoder_tcn(sd, "text_encoder")
    params["GRU_0"] = _gru(sd, "gru")
    params["TorchDense_0"] = _linear(sd, "out")
    params["TorchDense_1"] = _linear(sd, "out2")
    return params, stats


def convert_mmc_discriminator(sd):
    """Dispatch on the state-dict shape: the conv discriminator (what
    reference train.py instantiates) carries a ``pre_conv`` stack; the
    dormant recurrent one does not."""
    if "pre_conv.0.weight" in sd:
        return convert_conv_discriminator(sd)
    return convert_gru_discriminator(sd)


def _pose_encoder_conv(sd, p):
    """reference PoseEncoderConv (embedding_net.py:42-82)."""
    params, stats = {}, {}
    for i in range(3):
        cp, cs = _bn(sd, "%s.net.%d.1" % (p, i))
        params["ConvNormRelu_%d" % i] = {
            "TorchConv_0": _conv1d(sd, "%s.net.%d.0" % (p, i)),
            "BatchNorm_0": cp}
        stats["ConvNormRelu_%d" % i] = {"BatchNorm_0": cs}
    params["TorchConv_0"] = _conv1d(sd, p + ".net.3")
    for li, (di, bi) in enumerate([(0, 1), (3, 4)]):
        params["TorchDense_%d" % li] = _linear(sd, "%s.out_net.%d" % (p, di))
        bp, bs = _bn(sd, "%s.out_net.%d" % (p, bi))
        params["BatchNorm_%d" % li] = bp
        stats["BatchNorm_%d" % li] = bs
    params["TorchDense_2"] = _linear(sd, p + ".out_net.6")
    params["fc_mu"] = _linear(sd, p + ".fc_mu")
    params["fc_logvar"] = _linear(sd, p + ".fc_logvar")
    return params, stats


def _pose_decoder_conv(sd, p):
    """reference PoseDecoderConv (embedding_net.py:165-218)."""
    params, stats = {}, {}
    params["TorchDense_0"] = _linear(sd, p + ".pre_net.0")
    bp, bs = _bn(sd, p + ".pre_net.1")
    params["BatchNorm_0"] = bp
    stats["BatchNorm_0"] = bs
    params["TorchDense_1"] = _linear(sd, p + ".pre_net.3")
    for ti, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        params["TorchConvTranspose_%d" % ti] = _conv_transpose1d(
            sd, "%s.net.%d" % (p, ci))
        bp, bs = _bn(sd, "%s.net.%d" % (p, bi))
        params["BatchNorm_%d" % (ti + 1)] = bp
        stats["BatchNorm_%d" % (ti + 1)] = bs
    params["TorchConv_0"] = _conv1d(sd, p + ".net.6")
    params["TorchConv_1"] = _conv1d(sd, p + ".net.7")
    return params, stats


def convert_embedding_net(sd):
    """reference EmbeddingNet (embedding_net.py:233-314).  Covers the
    mode='pose' FGD autoencoder (pose encoder + conv decoder) and the
    joint_embed variant's extra context encoder / GRU decoder when their
    keys are present."""
    params, stats = {}, {}
    pe_p, pe_s = _pose_encoder_conv(sd, "pose_encoder")
    params["PoseEncoderConv_0"], stats["PoseEncoderConv_0"] = pe_p, pe_s
    if "context_encoder.gru.weight_ih_l0" in sd:
        cp, cs = {}, {}
        cp["TextEncoderTCN_0"] = _text_encoder_tcn(sd,
                                                   "context_encoder.text_encoder")
        wp, ws = _wav_encoder(sd, "context_encoder.audio_encoder")
        cp["WavEncoder_0"], cs["WavEncoder_0"] = wp, ws
        cp["GRU_0"] = _gru(sd, "context_encoder.gru")
        cp["TorchDense_0"] = _linear(sd, "context_encoder.out.0")
        bp, bs = _bn(sd, "context_encoder.out.1")
        cp["BatchNorm_0"] = bp
        cs["BatchNorm_0"] = bs
        cp["TorchDense_1"] = _linear(sd, "context_encoder.out.3")
        cp["fc_mu"] = _linear(sd, "context_encoder.fc_mu")
        cp["fc_logvar"] = _linear(sd, "context_encoder.fc_logvar")
        params["ContextEncoder_0"], stats["ContextEncoder_0"] = cp, cs
    if "decoder.gru.weight_ih_l0" in sd:
        # PoseDecoderGRU (joint_embed)
        dp, ds = {}, {}
        dp["TorchDense_0"] = _linear(sd, "decoder.pre_pose_net.0")
        bp, bs = _bn(sd, "decoder.pre_pose_net.1")
        dp["BatchNorm_0"] = bp
        ds["BatchNorm_0"] = bs
        dp["TorchDense_1"] = _linear(sd, "decoder.pre_pose_net.3")
        dp["GRU_0"] = _gru(sd, "decoder.gru")
        dp["TorchDense_2"] = _linear(sd, "decoder.out.0")
        dp["TorchDense_3"] = _linear(sd, "decoder.out.2")
        params["PoseDecoderGRU_0"], stats["PoseDecoderGRU_0"] = dp, ds
    else:
        dp, ds = _pose_decoder_conv(sd, "decoder")
        params["PoseDecoderConv_0"], stats["PoseDecoderConv_0"] = dp, ds
    return params, stats


def convert_seq2seq(sd):
    """reference Seq2SeqNet (seq2seq_net.py:14-254)."""
    params, stats = {}, {}
    ep = {"embedding": sd.take("encoder.embedding.weight")}
    ep.update(_gru(sd, "encoder.gru"))
    params["EncoderRNN_0"] = ep
    dp, ds = {}, {}
    dp["pre_linear"] = _linear(sd, "decoder.decoder.pre_linear.0")
    bp, bs = _bn(sd, "decoder.decoder.pre_linear.1")
    dp["BatchNorm_0"] = bp
    ds["BatchNorm_0"] = bs
    dp["Attn_0"] = {"attn": _linear(sd, "decoder.decoder.attn.attn"),
                    "v": sd.take("decoder.decoder.attn.v")}
    dp["GRUCell_0"] = _gru(sd, "decoder.decoder.gru")
    dp["out"] = _linear(sd, "decoder.decoder.out")
    params["decoder"], stats["decoder"] = dp, ds
    return params, stats


def _cnr1d(sd, p):
    bp, bs = _bn(sd, p + ".1")
    return ({"TorchConv_0": _conv1d(sd, p + ".0"),
             "BatchNorm_0": bp},
            {"BatchNorm_0": bs})


def _cnr2d(sd, p):
    bp, bs = _bn(sd, p + ".1")
    return ({"TorchConv_0": _conv2d(sd, p + ".0"),
             "BatchNorm_0": bp},
            {"BatchNorm_0": bs})


def convert_s2g_generator(sd):
    """reference speech2gesture.py Generator (:106-197)."""
    params, stats = {}, {}
    ap, as_ = {}, {}
    for i in range(8):
        cp, cs = _cnr2d(sd, "audio_encoder.first_net.%d" % i)
        ap["ConvNormRelu_%d" % i], as_["ConvNormRelu_%d" % i] = cp, cs
    for j in range(2):
        cp, cs = _cnr1d(sd, "audio_encoder.down1.%d" % j)
        ap["ConvNormRelu_%d" % (8 + j)] = cp
        as_["ConvNormRelu_%d" % (8 + j)] = cs
    for i, name in enumerate(["down2", "down3", "down4", "down5", "down6"]):
        cp, cs = _cnr1d(sd, "audio_encoder." + name)
        ap["ConvNormRelu_%d" % (10 + i)] = cp
        as_["ConvNormRelu_%d" % (10 + i)] = cs
    for i in range(5):
        cp, cs = _cnr1d(sd, "audio_encoder.up%d.conv" % (i + 1))
        ap["UnetUp_%d" % i] = {"ConvNormRelu_0": cp}
        as_["UnetUp_%d" % i] = {"ConvNormRelu_0": cs}
    params["AudioEncoder_0"], stats["AudioEncoder_0"] = ap, as_
    params["TorchDense_0"] = _linear(sd, "pre_pose_encoder.0")
    bp, bs = _bn(sd, "pre_pose_encoder.1")
    params["BatchNorm_0"] = bp
    stats["BatchNorm_0"] = bs
    params["TorchDense_1"] = _linear(sd, "pre_pose_encoder.3")
    for i in range(4):
        cp, cs = _cnr1d(sd, "decoder.%d" % i)
        params["ConvNormRelu_%d" % i], stats["ConvNormRelu_%d" % i] = cp, cs
    params["TorchConv_0"] = _conv1d(sd, "final_out")
    return params, stats


def convert_s2g_discriminator(sd):
    """reference speech2gesture.py Discriminator (:220-250)."""
    params, stats = {}, {}
    params["TorchConv_0"] = _conv1d(sd, "net.0")
    for i, ni in enumerate([2, 3]):
        cp, cs = _cnr1d(sd, "net.%d" % ni)
        params["ConvNormRelu_%d" % i], stats["ConvNormRelu_%d" % i] = cp, cs
    params["TorchConv_1"] = _conv1d(sd, "net.4")
    return params, stats


_GEN_CONVERTERS = {
    "multimodal_context": convert_pose_generator,
    "gesture_autoencoder": convert_embedding_net,
    "joint_embedding": convert_embedding_net,
    "seq2seq": convert_seq2seq,
    "speech2gesture": convert_s2g_generator,
}

_DIS_CONVERTERS = {
    "multimodal_context": convert_mmc_discriminator,
    "speech2gesture": convert_s2g_discriminator,
}


# --------------------------------------------------------------------------
# template validation + top-level import
# --------------------------------------------------------------------------

def _check_tree(converted, template, path=""):
    """Recursively require the converted tree to have exactly the
    template's keys and leaf shapes."""
    if isinstance(template, dict):
        if not isinstance(converted, dict):
            raise ValueError("expected subtree at %s, got leaf" % path)
        tk, ck = set(template), set(converted)
        if tk != ck:
            raise ValueError(
                "key mismatch at %s: missing=%s extra=%s"
                % (path, sorted(tk - ck), sorted(ck - tk)))
        for k in template:
            _check_tree(converted[k], template[k], "%s/%s" % (path, k))
    else:
        cshape = tuple(np.shape(converted))
        tshape = tuple(np.shape(template))
        if cshape != tshape:
            raise ValueError("shape mismatch at %s: got %s, template %s"
                             % (path, cshape, tshape))


def _as_f32(tree):
    if isinstance(tree, dict):
        return {k: _as_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


def convert_variables(model_name, state_dict, template, what="generator"):
    """torch state_dict -> flax variables dict validated against an
    initialized template (same tree, same shapes)."""
    table = _GEN_CONVERTERS if what == "generator" else _DIS_CONVERTERS
    if model_name not in table:
        raise ValueError("no %s converter for model %r" % (what, model_name))
    sd = _SD(state_dict)
    params, stats = table[model_name](sd)
    leftover = sd.unused()
    if leftover:
        raise ValueError("unconsumed torch keys (mapping drift?): %s"
                         % leftover)
    variables = {"params": _as_f32(params)}
    if stats:
        variables["batch_stats"] = _as_f32(stats)
    tdict = {k: v for k, v in dict(template).items()
             if k in ("params", "batch_stats")}
    _check_tree(variables, _unfreeze(tdict))
    return variables


def _unfreeze(tree):
    if hasattr(tree, "items") and not isinstance(tree, dict):
        tree = dict(tree)
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path):
    """Read a reference torch checkpoint into (args, epoch, lang_model,
    speaker_model, pose_dim, gen_vars, dis_vars) with flax variables."""
    import jax

    blob = _load_torch_blob(path)
    args = merge_args(blob["args"])
    lang_model = _to_our_vocab(blob.get("lang_model"))
    speaker_model = _to_our_vocab(blob.get("speaker_model"))
    pose_dim = int(blob["pose_dim"])

    bundle = factory.init_model(args, lang_model, speaker_model, pose_dim)
    rng = jax.random.PRNGKey(0)
    gen_template = factory.generator_init_variables(bundle, args, rng,
                                                    batch_size=1)
    gen_vars = convert_variables(args.model, blob["gen_dict"], gen_template,
                                 "generator")
    dis_vars = None
    if blob.get("dis_dict") and bundle.discriminator is not None:
        dis_template = factory.discriminator_init_variables(bundle, args, rng,
                                                            batch_size=1)
        dis_vars = convert_variables(args.model, blob["dis_dict"],
                                     dis_template, "discriminator")
    return {"args": args, "epoch": int(blob.get("epoch", 0)),
            "lang_model": lang_model, "speaker_model": speaker_model,
            "pose_dim": pose_dim, "gen_vars": gen_vars, "dis_vars": dis_vars,
            "bundle": bundle}


def import_checkpoint(torch_path, out_path):
    """Convert a reference torch checkpoint file into this framework's
    msgpack checkpoint at out_path."""
    from ..train import checkpoint as ckpt_io

    if not os.path.exists(torch_path):
        raise FileNotFoundError("checkpoint not found: %s" % torch_path)
    if not is_torch_checkpoint(torch_path):
        raise ValueError(
            "%s is not a torch checkpoint (already this framework's "
            "msgpack format? it can be used directly)" % torch_path)

    state = load_torch_checkpoint(torch_path)
    ckpt_io.save_checkpoint(state, out_path)
    logging.info("imported %s -> %s (model=%s epoch=%d)", torch_path,
                 out_path, state["args"].model, state["epoch"])
    return out_path
