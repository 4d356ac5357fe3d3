"""Model factory: experiment config -> (generator, discriminator) modules.

Behavioral contract: reference scripts/train.py:37-64 (init_model) plus
the z_type -> speaker_model mapping of train_epochs
(reference scripts/train.py:82-87).
"""

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import Vocab
from ..ops import audio as audio_ops
from . import embedding_net, multimodal_context, seq2seq, speech2gesture


@dataclass
class ModelBundle:
    model_name: str
    generator: Any
    discriminator: Optional[Any]
    pose_dim: int
    n_frames: int


def resolve_speaker_model(args, speaker_model):
    """z_type mapping (reference train.py:82-87): 'speaker' keeps the
    vocab, 'random' uses the sentinel 1, anything else drops it."""
    if args.z_type == "speaker":
        return speaker_model
    if args.z_type == "random":
        return 1
    return None


def init_model(args, lang_model, speaker_model, pose_dim) -> ModelBundle:
    n_frames = args.n_poses
    name = args.model
    generator = discriminator = None

    if name == "multimodal_context":
        if isinstance(speaker_model, Vocab):
            z_type, n_speakers = "speaker", speaker_model.n_words
        elif speaker_model:
            z_type, n_speakers = "random", 0
        else:
            z_type, n_speakers = "none", 0
        generator = multimodal_context.PoseGenerator(
            pose_dim=pose_dim,
            n_words=lang_model.n_words,
            word_embed_size=args.wordembed_dim,
            hidden_size=args.hidden_size,
            n_layers=args.n_layers,
            dropout_prob=args.dropout_prob,
            input_context=args.input_context,
            z_type=z_type,
            n_speakers=n_speakers,
            freeze_wordembed=args.freeze_wordembed)
        dis_type = getattr(args, "discriminator_type", "conv") or "conv"
        if dis_type == "conv":
            discriminator = multimodal_context.ConvDiscriminator(
                input_size=pose_dim)
        elif dis_type in ("gru", "gru_text"):
            discriminator = multimodal_context.GRUDiscriminator(
                input_size=pose_dim,
                hidden_size=args.hidden_size,
                n_layers=args.n_layers,
                dropout_prob=args.dropout_prob,
                use_text=(dis_type == "gru_text"),
                n_words=lang_model.n_words,
                word_embed_size=args.wordembed_dim,
                freeze_wordembed=args.freeze_wordembed)
        else:
            raise ValueError("unknown discriminator_type %r" % (dis_type,))
    elif name == "joint_embedding":
        generator = embedding_net.EmbeddingNet(
            pose_dim=pose_dim, n_frames=n_frames, mode="random",
            n_words=lang_model.n_words, word_embed_size=args.wordembed_dim,
            hidden_size=args.hidden_size, n_layers=args.n_layers,
            freeze_wordembed=args.freeze_wordembed)
    elif name == "gesture_autoencoder":
        generator = embedding_net.EmbeddingNet(
            pose_dim=pose_dim, n_frames=n_frames, mode="pose",
            n_words=lang_model.n_words if lang_model else 0,
            word_embed_size=args.wordembed_dim or 0)
    elif name == "seq2seq":
        generator = seq2seq.Seq2SeqNet(
            pose_dim=pose_dim, n_frames=n_frames,
            n_pre_poses=args.n_pre_poses,
            n_words=lang_model.n_words,
            word_embed_size=args.wordembed_dim,
            hidden_size=args.hidden_size, n_layers=args.n_layers,
            dropout_prob=args.dropout_prob)
    elif name == "speech2gesture":
        generator = speech2gesture.Generator(
            n_poses=n_frames, pose_dim=pose_dim,
            n_pre_poses=args.n_pre_poses)
        discriminator = speech2gesture.Discriminator(pose_dim=pose_dim)
    else:
        raise ValueError("unknown model %r" % (name,))

    return ModelBundle(name, generator, discriminator, pose_dim, n_frames)


def example_inputs(args, pose_dim, batch_size=2, n_words=20):
    """Tiny correctly-shaped inputs for module init / compile checks."""
    n = args.n_poses
    audio_len = audio_ops.calc_audio_length_from_motion_length(
        n, args.motion_resampling_framerate)
    spec_len = audio_ops.calc_spectrogram_length_from_motion_length(
        n, args.motion_resampling_framerate)
    return {
        "pre_seq": jnp.zeros((batch_size, n, pose_dim + 1), jnp.float32),
        "pre_seq_partial": jnp.zeros((batch_size, args.n_pre_poses, pose_dim),
                                     jnp.float32),
        "in_text": jnp.zeros((batch_size, n), jnp.int32),
        "word_seq": jnp.zeros((batch_size, 8), jnp.int32),
        "word_lengths": jnp.full((batch_size,), 8, jnp.int32),
        "in_audio": jnp.zeros((batch_size, audio_len), jnp.float32),
        "in_spec": jnp.zeros((batch_size, audio_ops.N_MELS, spec_len),
                             jnp.float32),
        "target_vec": jnp.zeros((batch_size, n, pose_dim), jnp.float32),
        "vid_indices": jnp.zeros((batch_size,), jnp.int32),
    }


def generator_init_variables(bundle, args, rng, batch_size=2):
    """Initialize generator variables with model-appropriate inputs."""
    ex = example_inputs(args, bundle.pose_dim, batch_size)
    rngs = {"params": rng, "noise": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    g = bundle.generator
    if bundle.model_name == "multimodal_context":
        return g.init(rngs, ex["pre_seq"], ex["in_text"], ex["in_audio"],
                      ex["vid_indices"])
    if bundle.model_name in ("joint_embedding", "gesture_autoencoder"):
        mode = "pose" if bundle.model_name == "gesture_autoencoder" else "speech"
        in_text = None if mode == "pose" else ex["in_text"]
        in_audio = None if mode == "pose" else ex["in_audio"]
        return g.init(rngs, in_text, in_audio, ex["pre_seq_partial"],
                      ex["target_vec"], mode)
    if bundle.model_name == "seq2seq":
        return g.init(rngs, ex["word_seq"], ex["word_lengths"],
                      ex["target_vec"])
    if bundle.model_name == "speech2gesture":
        return g.init(rngs, ex["in_spec"], ex["pre_seq_partial"])
    raise ValueError(bundle.model_name)


def discriminator_init_variables(bundle, args, rng, batch_size=2):
    if bundle.discriminator is None:
        return None
    ex = example_inputs(args, bundle.pose_dim, batch_size)
    if getattr(bundle.discriminator, "use_text", False):
        return bundle.discriminator.init({"params": rng}, ex["target_vec"],
                                         ex["in_text"])
    return bundle.discriminator.init({"params": rng}, ex["target_vec"])


def load_pretrained_word_embedding(variables, weights):
    """Overwrite every (n_words, dim) 'embedding' param with pretrained
    weights (fastText matrix from the Vocab)."""
    if weights is None:
        return variables
    weights = jnp.asarray(np.asarray(weights))

    def visit(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if (k == "embedding" and hasattr(v, "shape")
                    and v.shape == weights.shape):
                out[k] = weights
            else:
                out[k] = visit(v)
        return out

    params = visit(dict(variables["params"]))
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
