"""Export this framework's checkpoints to the reference PyTorch format.

Inverse of ``torch_import``: flax variable trees -> the reference's
``torch.save({'args','epoch','lang_model','speaker_model','pose_dim',
'gen_dict','dis_dict'})`` blob (reference
scripts/utils/train_utils.py:147-149, scripts/train.py:153-157), so a
model trained here runs in the reference toolchain unchanged — its
synthesize.py, FGD evaluation, and the Blender render rig.

Exactness contract: export inverts import bit-for-bit.  Every exporter
mirrors the corresponding ``torch_import`` converter, and
``export_variables`` re-runs ``torch_import.convert_variables`` on its
own output against the source tree, so a layout drift between the two
maps fails at export time instead of producing a silently-wrong
checkpoint.  tests/test_torch_export.py round-trips the ACTUAL reference
torch modules (``load_state_dict(strict=True)``) for all five families.

Vocab objects are re-pickled under the reference's ``model.vocab.Vocab``
class identity (attribute-compatible by design) so the blob unpickles in
the reference environment.
"""

import logging
import os
import sys
import types

import numpy as np

from ..data.vocab import Vocab
from . import torch_import


def _t(x):
    return np.asarray(x, np.float32)


# ---- primitive layout inversions (inverses of torch_import's) ------------

def _linear(out, tree, p):
    out[p + ".weight"] = np.ascontiguousarray(_t(tree["Dense_0"]["kernel"]).T)
    out[p + ".bias"] = _t(tree["Dense_0"]["bias"])


def _conv1d(out, tree, p):
    # flax (k, in, out) -> torch (out, in, k)
    out[p + ".weight"] = np.ascontiguousarray(
        _t(tree["Conv_0"]["kernel"]).transpose(2, 1, 0))
    out[p + ".bias"] = _t(tree["Conv_0"]["bias"])


def _conv2d(out, tree, p):
    # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
    out[p + ".weight"] = np.ascontiguousarray(
        _t(tree["Conv_0"]["kernel"]).transpose(3, 2, 0, 1))
    out[p + ".bias"] = _t(tree["Conv_0"]["bias"])


def _conv_transpose1d(out, tree, p):
    # flax (k, in, out), kernel flipped along k -> torch (in, out, k)
    w = _t(tree["ConvTranspose_0"]["kernel"])[::-1].transpose(1, 2, 0)
    out[p + ".weight"] = np.ascontiguousarray(w)
    out[p + ".bias"] = _t(tree["ConvTranspose_0"]["bias"])


def _bn(out, ptree, stree, p):
    out[p + ".weight"] = _t(ptree["BatchNorm_0"]["scale"])
    out[p + ".bias"] = _t(ptree["BatchNorm_0"]["bias"])
    out[p + ".running_mean"] = _t(stree["BatchNorm_0"]["mean"])
    out[p + ".running_var"] = _t(stree["BatchNorm_0"]["var"])
    # torch BN tracks this counter; 0 is what a fresh module holds and
    # momentum-based updates never read it
    out[p + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _wn_conv(out, tree, p):
    # weight_norm Conv1d: g is (out, 1, 1) in torch (norm over dim 0)
    out[p + ".weight_v"] = np.ascontiguousarray(
        _t(tree["wn"]["v"]).transpose(2, 1, 0))
    out[p + ".weight_g"] = _t(tree["wn"]["g"]).reshape(-1, 1, 1)
    out[p + ".bias"] = _t(tree["bias"])


def _gru(out, tree, p):
    # our GRU trees keep torch-layout leaves under torch names verbatim
    for name, leaf in tree.items():
        out["%s.%s" % (p, name)] = _t(leaf)


# ---- per-module exporters (mirror torch_import's converters) -------------

def _wav_encoder(out, params, stats, p):
    for i, ci in enumerate([0, 3, 6, 9]):
        _conv1d(out, params["TorchConv_%d" % i],
                "%s.feat_extractor.%d" % (p, ci))
    for i, bi in enumerate([1, 4, 7]):
        _bn(out, params["BatchNorm_%d" % i], stats["BatchNorm_%d" % i],
            "%s.feat_extractor.%d" % (p, bi))


def _text_encoder_tcn(out, params, p):
    out[p + ".embedding.weight"] = _t(params["embedding"])
    tcn = params["TemporalConvNet_0"]
    for i in range(len(tcn)):
        blk = tcn["TemporalBlock_%d" % i]
        _wn_conv(out, blk["WNConv1d_0"], "%s.tcn.network.%d.conv1" % (p, i))
        _wn_conv(out, blk["WNConv1d_1"], "%s.tcn.network.%d.conv2" % (p, i))
        # the reference TemporalBlock registers conv1/conv2 a second time
        # inside its Sequential (tcn.py), so the state_dict carries
        # aliased copies
        for alias, src in (("net.0", "conv1"), ("net.4", "conv2")):
            for leaf in ("weight_g", "weight_v", "bias"):
                out["%s.tcn.network.%d.%s.%s" % (p, i, alias, leaf)] = \
                    out["%s.tcn.network.%d.%s.%s" % (p, i, src, leaf)]
        if "TorchConv_0" in blk:
            _conv1d(out, blk["TorchConv_0"],
                    "%s.tcn.network.%d.downsample" % (p, i))
    _linear(out, params["TorchDense_0"], p + ".decoder")


def export_pose_generator(params, stats):
    """Inverse of convert_pose_generator (reference
    multimodal_context_net.py:64-160)."""
    out = {}
    if "WavEncoder_0" in params:
        _wav_encoder(out, params["WavEncoder_0"], stats["WavEncoder_0"],
                     "audio_encoder")
    if "TextEncoderTCN_0" in params:
        _text_encoder_tcn(out, params["TextEncoderTCN_0"], "text_encoder")
    dense = 0
    if "speaker_embedding" in params:
        out["speaker_embedding.0.weight"] = _t(params["speaker_embedding"])
        _linear(out, params["TorchDense_0"], "speaker_embedding.1")
        _linear(out, params["speaker_mu"], "speaker_mu")
        _linear(out, params["speaker_logvar"], "speaker_logvar")
        dense = 1
    _gru(out, params["GRU_0"], "gru")
    _linear(out, params["TorchDense_%d" % dense], "out.0")
    _linear(out, params["TorchDense_%d" % (dense + 1)], "out.2")
    return out


def export_conv_discriminator(params, stats):
    """Inverse of convert_conv_discriminator (reference
    multimodal_context_net.py:207-252)."""
    out = {}
    for i, ci in enumerate([0, 3, 6]):
        _conv1d(out, params["TorchConv_%d" % i], "pre_conv.%d" % ci)
    for i, bi in enumerate([1, 4]):
        _bn(out, params["BatchNorm_%d" % i], stats["BatchNorm_%d" % i],
            "pre_conv.%d" % bi)
    _gru(out, params["GRU_0"], "gru")
    _linear(out, params["TorchDense_0"], "out")
    _linear(out, params["TorchDense_1"], "out2")
    return out


def export_gru_discriminator(params, stats):
    """Inverse of convert_gru_discriminator (reference
    multimodal_context_net.py:163-204)."""
    out = {}
    if "TextEncoderTCN_0" in params:
        _text_encoder_tcn(out, params["TextEncoderTCN_0"], "text_encoder")
    _gru(out, params["GRU_0"], "gru")
    _linear(out, params["TorchDense_0"], "out")
    _linear(out, params["TorchDense_1"], "out2")
    return out


def export_mmc_discriminator(params, stats):
    """Dispatch on the param-tree shape, mirroring
    torch_import.convert_mmc_discriminator."""
    if "TorchConv_0" in params:
        return export_conv_discriminator(params, stats)
    return export_gru_discriminator(params, stats)


def _pose_encoder_conv(out, params, stats, p):
    for i in range(3):
        _conv1d(out, params["ConvNormRelu_%d" % i]["TorchConv_0"],
                "%s.net.%d.0" % (p, i))
        _bn(out, params["ConvNormRelu_%d" % i]["BatchNorm_0"],
            stats["ConvNormRelu_%d" % i]["BatchNorm_0"],
            "%s.net.%d.1" % (p, i))
    _conv1d(out, params["TorchConv_0"], p + ".net.3")
    for li, (di, bi) in enumerate([(0, 1), (3, 4)]):
        _linear(out, params["TorchDense_%d" % li], "%s.out_net.%d" % (p, di))
        _bn(out, params["BatchNorm_%d" % li], stats["BatchNorm_%d" % li],
            "%s.out_net.%d" % (p, bi))
    _linear(out, params["TorchDense_2"], p + ".out_net.6")
    _linear(out, params["fc_mu"], p + ".fc_mu")
    _linear(out, params["fc_logvar"], p + ".fc_logvar")


def _pose_decoder_conv(out, params, stats, p):
    _linear(out, params["TorchDense_0"], p + ".pre_net.0")
    _bn(out, params["BatchNorm_0"], stats["BatchNorm_0"], p + ".pre_net.1")
    _linear(out, params["TorchDense_1"], p + ".pre_net.3")
    for ti, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        _conv_transpose1d(out, params["TorchConvTranspose_%d" % ti],
                          "%s.net.%d" % (p, ci))
        _bn(out, params["BatchNorm_%d" % (ti + 1)],
            stats["BatchNorm_%d" % (ti + 1)], "%s.net.%d" % (p, bi))
    _conv1d(out, params["TorchConv_0"], p + ".net.6")
    _conv1d(out, params["TorchConv_1"], p + ".net.7")


def export_embedding_net(params, stats):
    """Inverse of convert_embedding_net (reference
    embedding_net.py:233-314)."""
    out = {}
    _pose_encoder_conv(out, params["PoseEncoderConv_0"],
                       stats["PoseEncoderConv_0"], "pose_encoder")
    if "ContextEncoder_0" in params:
        cp, cs = params["ContextEncoder_0"], stats["ContextEncoder_0"]
        _text_encoder_tcn(out, cp["TextEncoderTCN_0"],
                          "context_encoder.text_encoder")
        _wav_encoder(out, cp["WavEncoder_0"], cs["WavEncoder_0"],
                     "context_encoder.audio_encoder")
        _gru(out, cp["GRU_0"], "context_encoder.gru")
        _linear(out, cp["TorchDense_0"], "context_encoder.out.0")
        _bn(out, cp["BatchNorm_0"], cs["BatchNorm_0"],
            "context_encoder.out.1")
        _linear(out, cp["TorchDense_1"], "context_encoder.out.3")
        _linear(out, cp["fc_mu"], "context_encoder.fc_mu")
        _linear(out, cp["fc_logvar"], "context_encoder.fc_logvar")
    if "PoseDecoderGRU_0" in params:
        dp, ds = params["PoseDecoderGRU_0"], stats["PoseDecoderGRU_0"]
        _linear(out, dp["TorchDense_0"], "decoder.pre_pose_net.0")
        _bn(out, dp["BatchNorm_0"], ds["BatchNorm_0"],
            "decoder.pre_pose_net.1")
        _linear(out, dp["TorchDense_1"], "decoder.pre_pose_net.3")
        _gru(out, dp["GRU_0"], "decoder.gru")
        _linear(out, dp["TorchDense_2"], "decoder.out.0")
        _linear(out, dp["TorchDense_3"], "decoder.out.2")
    else:
        _pose_decoder_conv(out, params["PoseDecoderConv_0"],
                           stats["PoseDecoderConv_0"], "decoder")
    return out


def export_seq2seq(params, stats):
    """Inverse of convert_seq2seq (reference seq2seq_net.py:14-254)."""
    out = {}
    ep = params["EncoderRNN_0"]
    out["encoder.embedding.weight"] = _t(ep["embedding"])
    _gru(out, {k: v for k, v in ep.items() if k != "embedding"},
         "encoder.gru")
    dp, ds = params["decoder"], stats["decoder"]
    _linear(out, dp["pre_linear"], "decoder.decoder.pre_linear.0")
    _bn(out, dp["BatchNorm_0"], ds["BatchNorm_0"],
        "decoder.decoder.pre_linear.1")
    _linear(out, dp["Attn_0"]["attn"], "decoder.decoder.attn.attn")
    out["decoder.decoder.attn.v"] = _t(dp["Attn_0"]["v"])
    _gru(out, dp["GRUCell_0"], "decoder.decoder.gru")
    _linear(out, dp["out"], "decoder.decoder.out")
    return out


def _cnr1d(out, ptree, stree, p):
    _conv1d(out, ptree["TorchConv_0"], p + ".0")
    _bn(out, ptree["BatchNorm_0"], stree["BatchNorm_0"], p + ".1")


def _cnr2d(out, ptree, stree, p):
    _conv2d(out, ptree["TorchConv_0"], p + ".0")
    _bn(out, ptree["BatchNorm_0"], stree["BatchNorm_0"], p + ".1")


def export_s2g_generator(params, stats):
    """Inverse of convert_s2g_generator (reference speech2gesture.py:106-197)."""
    out = {}
    ap, as_ = params["AudioEncoder_0"], stats["AudioEncoder_0"]
    for i in range(8):
        _cnr2d(out, ap["ConvNormRelu_%d" % i], as_["ConvNormRelu_%d" % i],
               "audio_encoder.first_net.%d" % i)
    for j in range(2):
        _cnr1d(out, ap["ConvNormRelu_%d" % (8 + j)],
               as_["ConvNormRelu_%d" % (8 + j)],
               "audio_encoder.down1.%d" % j)
    for i, name in enumerate(["down2", "down3", "down4", "down5", "down6"]):
        _cnr1d(out, ap["ConvNormRelu_%d" % (10 + i)],
               as_["ConvNormRelu_%d" % (10 + i)],
               "audio_encoder." + name)
    for i in range(5):
        _cnr1d(out, ap["UnetUp_%d" % i]["ConvNormRelu_0"],
               as_["UnetUp_%d" % i]["ConvNormRelu_0"],
               "audio_encoder.up%d.conv" % (i + 1))
    _linear(out, params["TorchDense_0"], "pre_pose_encoder.0")
    _bn(out, params["BatchNorm_0"], stats["BatchNorm_0"],
        "pre_pose_encoder.1")
    _linear(out, params["TorchDense_1"], "pre_pose_encoder.3")
    for i in range(4):
        _cnr1d(out, params["ConvNormRelu_%d" % i],
               stats["ConvNormRelu_%d" % i], "decoder.%d" % i)
    _conv1d(out, params["TorchConv_0"], "final_out")
    return out


def export_s2g_discriminator(params, stats):
    """Inverse of convert_s2g_discriminator (reference
    speech2gesture.py:220-250)."""
    out = {}
    _conv1d(out, params["TorchConv_0"], "net.0")
    for i, ni in enumerate([2, 3]):
        _cnr1d(out, params["ConvNormRelu_%d" % i],
               stats["ConvNormRelu_%d" % i], "net.%d" % ni)
    _conv1d(out, params["TorchConv_1"], "net.4")
    return out


_GEN_EXPORTERS = {
    "multimodal_context": export_pose_generator,
    "gesture_autoencoder": export_embedding_net,
    "joint_embedding": export_embedding_net,
    "seq2seq": export_seq2seq,
    "speech2gesture": export_s2g_generator,
}

_DIS_EXPORTERS = {
    "multimodal_context": export_mmc_discriminator,
    "speech2gesture": export_s2g_discriminator,
}


# --------------------------------------------------------------------------
# top level
# --------------------------------------------------------------------------

def _unfreeze(tree):
    if hasattr(tree, "items") and not isinstance(tree, dict):
        tree = dict(tree)
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    return tree


def export_variables(model_name, variables, what="generator"):
    """flax variables -> reference-layout torch state_dict (numpy
    values).  Self-verifying: the result is converted BACK through
    torch_import.convert_variables against the source tree, so any
    import/export drift raises here."""
    table = _GEN_EXPORTERS if what == "generator" else _DIS_EXPORTERS
    if model_name not in table:
        raise ValueError("no %s exporter for model %r" % (what, model_name))
    variables = _unfreeze(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = table[model_name](params, stats)
    # round-trip self-check (exact: both maps are pure layout transforms)
    back = torch_import.convert_variables(model_name, sd, variables, what)
    _assert_trees_equal(back, {k: v for k, v in variables.items()
                               if k in ("params", "batch_stats")})
    return sd


def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        if set(a) != set(b):
            raise AssertionError("export round-trip key drift at %s: %s vs %s"
                                 % (path, sorted(a), sorted(b)))
        for k in a:
            _assert_trees_equal(a[k], b[k], "%s/%s" % (path, k))
        return
    if not np.array_equal(np.asarray(a, np.float32),
                          np.asarray(b, np.float32)):
        raise AssertionError("export round-trip value drift at %s" % path)


def _shim_reference_vocab_module(cleanup):
    """Ensure ``model.vocab.Vocab`` resolves during pickling (pickle
    verifies the declared module path at save time).  Uses the real
    reference module when importable; otherwise registers temporary
    shims, appending undo thunks to ``cleanup`` so the caller restores
    sys.modules AND any attribute set on a pre-existing real ``model``
    package (mirrors torch_import._load_torch_blob's discipline)."""
    pkg = sys.modules.get("model")
    if pkg is None:
        pkg = types.ModuleType("model")
        sys.modules["model"] = pkg
        cleanup.append(lambda: sys.modules.pop("model", None))
    shim = sys.modules.get("model.vocab")
    if shim is None:
        shim = types.ModuleType("model.vocab")
        sys.modules["model.vocab"] = shim
        cleanup.append(lambda: sys.modules.pop("model.vocab", None))
        had_attr = hasattr(pkg, "vocab")
        old_attr = getattr(pkg, "vocab", None)
        pkg.vocab = shim
        if had_attr:
            cleanup.append(lambda: setattr(pkg, "vocab", old_attr))
        else:
            cleanup.append(
                lambda: pkg.__dict__.pop("vocab", None))
    cls = getattr(shim, "Vocab", None)
    if cls is None:
        cls = type("Vocab", (Vocab,), {})
        cls.__module__ = "model.vocab"
        cls.__qualname__ = "Vocab"
        shim.Vocab = cls
    return cls


def _reference_vocab(v, cls):
    """Our Vocab -> an instance pickled as ``model.vocab.Vocab`` (the
    class the reference environment unpickles; attribute-identical)."""
    if v is None or isinstance(v, int):
        return v
    out = cls.__new__(cls)
    out.__dict__.update(v.__dict__)
    return out


def _reference_args(args):
    """Args namespace -> stdlib argparse.Namespace (unpicklable-anywhere,
    what the reference saves; extra TPU flags ride along harmlessly)."""
    import argparse
    return argparse.Namespace(**dict(vars(args)))


def export_checkpoint(our_path, torch_path):
    """Convert one of this framework's msgpack checkpoints into a
    reference-format torch.save blob at torch_path."""
    import collections

    import jax
    import torch
    from flax import serialization

    from ..models import factory
    from ..train import checkpoint as ckpt_io

    if not os.path.exists(our_path):
        raise FileNotFoundError("checkpoint not found: %s" % our_path)
    if torch_import.is_torch_checkpoint(our_path):
        raise ValueError("%s is already a torch checkpoint" % our_path)

    ckpt = ckpt_io.load_checkpoint(our_path)
    args = ckpt["args"]
    bundle = factory.init_model(args, ckpt["lang_model"],
                                ckpt["speaker_model"], ckpt["pose_dim"])
    rng = jax.random.PRNGKey(0)
    gen_template = factory.generator_init_variables(bundle, args, rng,
                                                    batch_size=1)
    gen_vars = serialization.from_bytes(gen_template,
                                        ckpt["gen_vars_bytes"])
    gen_sd = export_variables(args.model, gen_vars, "generator")

    dis_sd = None
    if ckpt["dis_vars_bytes"] and bundle.discriminator is not None:
        dis_template = factory.discriminator_init_variables(
            bundle, args, rng, batch_size=1)
        dis_vars = serialization.from_bytes(dis_template,
                                            ckpt["dis_vars_bytes"])
        dis_sd = export_variables(args.model, dis_vars, "discriminator")

    def to_torch(sd):
        if sd is None:
            return None
        # np.array copies and preserves 0-d scalars (ascontiguousarray
        # would promote BN counters to shape (1,))
        return collections.OrderedDict(
            (k, torch.from_numpy(np.array(v))) for k, v in sd.items())

    cleanup = []
    try:
        vocab_cls = _shim_reference_vocab_module(cleanup)
        blob = {
            "args": _reference_args(args),
            "epoch": int(ckpt["epoch"]),
            "lang_model": _reference_vocab(ckpt["lang_model"], vocab_cls),
            "speaker_model": _reference_vocab(ckpt["speaker_model"],
                                              vocab_cls),
            "pose_dim": int(ckpt["pose_dim"]),
            "gen_dict": to_torch(gen_sd),
            "dis_dict": to_torch(dis_sd),
        }
        torch.save(blob, torch_path)
    finally:
        for undo in reversed(cleanup):
            undo()
    logging.info("exported %s -> %s (model=%s epoch=%d)", our_path,
                 torch_path, args.model, blob["epoch"])
    return torch_path
