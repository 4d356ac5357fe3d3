"""Shared pieces of the jitted train/eval steps."""

import jax
import jax.numpy as jnp


AUDIO_INT16_SCALE = 32767.0


def decode_audio(a):
    """Accept int16 PCM audio across the host->device boundary.

    --audio_int16_transfer ships raw audio as int16 (half the bytes of
    fp32; bit-exact for audio decoded from 16-bit PCM sources like the
    TED recordings) and this decodes it back to float32 in-graph.
    float32 input passes through untouched."""
    if a is not None and a.dtype == jnp.int16:
        return a.astype(jnp.float32) * (1.0 / AUDIO_INT16_SCALE)
    return a


def build_pre_seq(target_poses, n_pre_poses):
    """Seed-pose conditioning input: zeros except the first n_pre_poses
    frames carry the target pose + a constraint bit of 1
    (reference train_eval/train_gan.py:20-22)."""
    b, t, d = target_poses.shape
    pre = jnp.zeros((b, t, d + 1), target_poses.dtype)
    pre = pre.at[:, :n_pre_poses, :d].set(target_poses[:, :n_pre_poses])
    pre = pre.at[:, :n_pre_poses, d].set(1.0)
    return pre


def smooth_l1(pred, target, beta):
    """torch F.smooth_l1_loss(pred/beta, target/beta) * beta, mean
    reduction — the beta-scaling trick of reference train_gan.py:53-54."""
    return jnp.mean(smooth_l1_none(pred, target, beta))


def smooth_l1_none(pred, target, beta):
    """Elementwise smooth-L1 with the reference's beta scaling."""
    d = jnp.abs(pred / beta - target / beta)
    elem = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return elem * beta


def apply_net(module, params, batch_stats, *args, train, rngs=None, **kwargs):
    """Apply a flax module; in train mode collect updated batch_stats."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = module.apply(variables, *args, train=True, rngs=rngs,
                                mutable=["batch_stats"], **kwargs)
        return out, mut["batch_stats"]
    out = module.apply(variables, *args, train=False, rngs=rngs, **kwargs)
    return out, batch_stats


def split_rngs(rng, names):
    keys = jax.random.split(rng, len(names))
    return {n: k for n, k in zip(names, keys)}
