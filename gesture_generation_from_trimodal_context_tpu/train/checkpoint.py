"""Self-describing checkpoints.

Behavioral contract: reference scripts/utils/train_utils.py:147-183 and
scripts/train.py:136-157.  A checkpoint carries everything needed to
rebuild and run the model — args, epoch, the pickled word/speaker
vocabularies, pose_dim, and the generator/discriminator variables — so
``synthesize.py`` can operate from a single file.  The reference reloads
only generator weights (discriminator weights saved but unused); we keep
that behavior and additionally (beyond the reference, SURVEY.md §5) can
embed optimizer state for true resume.

Format: one msgpack blob; flax variables via flax.serialization;
vocabularies via pickle (like the reference's torch.save of Vocab).
"""

import logging
import os
import pickle

import jax
import msgpack
from flax import serialization

from ..config.parse_args import args_from_dict, args_to_dict
from ..models import factory


def save_checkpoint(state, filename):
    """state keys: args, epoch, lang_model, speaker_model, pose_dim,
    gen_vars, dis_vars, and optionally gen_opt/dis_opt."""
    blob = {
        "args": pickle.dumps(args_to_dict(state["args"])),
        "epoch": int(state["epoch"]),
        "lang_model": pickle.dumps(state.get("lang_model")),
        "speaker_model": pickle.dumps(state.get("speaker_model")),
        "pose_dim": int(state["pose_dim"]),
        "gen_vars": serialization.to_bytes(state["gen_vars"]),
        "dis_vars": (serialization.to_bytes(state["dis_vars"])
                     if state.get("dis_vars") is not None else b""),
        "gen_opt": (serialization.to_bytes(state["gen_opt"])
                    if state.get("gen_opt") is not None else b""),
        "dis_opt": (serialization.to_bytes(state["dis_opt"])
                    if state.get("dis_opt") is not None else b""),
    }
    # atomic: *_checkpoint_last.bin is the crash-recovery file and (with
    # the async writer, train/async_ckpt.py) may be written while the
    # next epoch trains — it must never exist half-written
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(msgpack.packb(blob, use_bin_type=True))
    os.replace(tmp, filename)
    logging.info("Saved the checkpoint")


def load_checkpoint(filename):
    with open(filename, "rb") as f:
        blob = msgpack.unpackb(f.read(), raw=False)
    return {
        "args": args_from_dict(pickle.loads(blob["args"])),
        "epoch": blob["epoch"],
        "lang_model": pickle.loads(blob["lang_model"]),
        "speaker_model": pickle.loads(blob["speaker_model"]),
        "pose_dim": blob["pose_dim"],
        "gen_vars_bytes": blob["gen_vars"],
        "dis_vars_bytes": blob["dis_vars"],
        "gen_opt_bytes": blob.get("gen_opt", b""),
        "dis_opt_bytes": blob.get("dis_opt", b""),
    }


def load_checkpoint_and_model(checkpoint_path, rng):
    """Rebuild the model from a checkpoint's embedded args and load the
    generator variables (reference train_utils.py:167-183).

    Accepts BOTH this framework's msgpack checkpoints and the reference's
    torch.save ``.bin`` blobs (e.g. the released generator and the
    train_h36m_gesture_autoencoder FGD net) — torch files are converted
    in-memory via interop.torch_import."""
    logging.info("loading checkpoint %s", checkpoint_path)
    from ..interop import torch_import
    if torch_import.is_torch_checkpoint(checkpoint_path):
        state = torch_import.load_torch_checkpoint(checkpoint_path)
        return (state["args"], state["bundle"], state["gen_vars"],
                state["lang_model"], state["speaker_model"],
                state["pose_dim"])
    ckpt = load_checkpoint(checkpoint_path)
    args = ckpt["args"]
    lang_model = ckpt["lang_model"]
    speaker_model = ckpt["speaker_model"]
    pose_dim = ckpt["pose_dim"]
    logging.info("epoch %d", ckpt["epoch"])

    bundle = factory.init_model(args, lang_model, speaker_model, pose_dim)
    # template init is eager flax work — run it on the host cpu instead
    # of op-by-op over a tunneled device (utils/platforms.py); the
    # restored leaves are numpy and get placed on first jitted use
    from ..utils import platforms
    with platforms.host_init_context():
        dev = platforms.host_cpu_device()
        if dev is not None:
            rng = jax.device_put(rng, dev)
        template = factory.generator_init_variables(bundle, args, rng,
                                                    batch_size=1)
    gen_vars = serialization.from_bytes(template, ckpt["gen_vars_bytes"])
    return args, bundle, gen_vars, lang_model, speaker_model, pose_dim
