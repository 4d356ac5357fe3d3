"""Jitted train/eval steps for the embedding models (joint_embedding,
gesture_autoencoder, and the H3.6M FGD feature extractor).

Behavioral contract:
- train_iter_embed (reference train_eval/train_joint_embed.py:5-51):
  per-sample-mean L1 recon loss summed over the batch; VAE branch exists
  but variational_encoding=False on all published paths.
- eval_embed (train_joint_embed.py:54-62): mean L1 + reconstructions.
- train_iter of the FGD trainer (reference
  scripts/train_feature_extractor.py:54-97): same recon loss plus a
  pose-difference L1 term (use_pose_diff=True there, False in train.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .common import apply_net, decode_audio, split_rngs
from .state import NetState, adam, apply_grads


def make_embed_train_step(bundle, args, mode=None, use_pose_diff=False):
    net = bundle.generator
    tx = adam(args.learning_rate)
    n_pre = args.n_pre_poses

    def step_body(state: NetState, batch, rng):
        in_text = batch.get("in_text")
        in_audio = decode_audio(batch.get("in_audio"))
        target = batch["target_vec"]
        pre_seq = target[:, 0:n_pre]

        def loss_fn(params):
            rngs = split_rngs(rng, ("noise", "dropout"))
            (out_tuple), bs = apply_net(
                net, params, state.batch_stats, in_text, in_audio, pre_seq,
                target, mode, train=True, rngs=rngs,
                variational_encoding=False)
            recon = out_tuple[6]
            recon_loss = jnp.mean(jnp.abs(recon - target), axis=(1, 2))
            if use_pose_diff:
                td = target[:, 1:] - target[:, :-1]
                rd = recon[:, 1:] - recon[:, :-1]
                recon_loss = recon_loss + jnp.mean(jnp.abs(rd - td),
                                                   axis=(1, 2))
            recon_loss = jnp.sum(recon_loss)
            return recon_loss, (bs, {"loss": recon_loss})

        (_, (bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = apply_grads(state, tx, grads, bs)
        return state, metrics

    step = jax.jit(step_body, donate_argnames=("state",))
    step.body = step_body
    return step, tx


def make_embed_resident_multi_step(bundle, args, mode=None, mesh=None,
                                   use_pose_diff=False):
    """--device_resident_data for the embedding families: fused K-step
    scan over microbatches gathered in-graph from the resident dataset
    (train/resident.py)."""
    from ..ops import audio as audio_ops
    from .resident import make_single_state_resident_multi_step
    step, tx = make_embed_train_step(bundle, args, mode=mode,
                                     use_pose_diff=use_pose_diff)
    audio_len = audio_ops.calc_audio_length_from_motion_length(
        args.n_poses, args.motion_resampling_framerate)
    return make_single_state_resident_multi_step(step.body, audio_len,
                                                 mesh), tx


def make_embed_train_step_shardmap(bundle, args, mesh, mode=None,
                                   use_pose_diff=False):
    """Explicit-SPMD variant of the embed train step via shard_map.

    Where the jit path treats the sharded batch as one logical array
    (global-batch BatchNorm statistics), this variant runs the reference
    math per shard — per-device BN batch statistics and per-device
    dropout/noise draws, exactly like torch DataParallel — and reduces
    explicitly over ICI: loss and grads via psum (the reference's summed
    recon loss makes the shard-sum exact), running BN stats via pmean.
    """
    import optax
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    net = bundle.generator
    tx = adam(args.learning_rate)
    n_pre = args.n_pre_poses
    axis = "data"

    def per_shard(params, batch_stats, opt_state, target, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        pre_seq = target[:, 0:n_pre]

        def loss_fn(p):
            rngs = split_rngs(rng, ("noise", "dropout"))
            out_tuple, bs = apply_net(
                net, p, batch_stats, None, None, pre_seq, target, mode,
                train=True, rngs=rngs, variational_encoding=False)
            recon = out_tuple[6]
            recon_loss = jnp.mean(jnp.abs(recon - target), axis=(1, 2))
            if use_pose_diff:
                td = target[:, 1:] - target[:, :-1]
                rd = recon[:, 1:] - recon[:, :-1]
                recon_loss = recon_loss + jnp.mean(jnp.abs(rd - td),
                                                   axis=(1, 2))
            return jnp.sum(recon_loss), bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        loss = jax.lax.psum(loss, axis)          # summed loss is additive
        grads = jax.lax.psum(grads, axis)        # explicit ICI all-reduce
        bs = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), bs)  # sync running stats
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, bs, new_opt, {"loss": loss}

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P()),
        out_specs=(P(), P(), P(), P()))

    @jax.jit
    def step(state: NetState, batch, rng):
        params, bs, opt, metrics = sharded(
            state.params, state.batch_stats, state.opt_state,
            batch["target_vec"], rng)
        return state.replace(params=params, batch_stats=bs, opt_state=opt,
                             step=state.step + 1), metrics

    return step, tx


def make_embed_eval_step(bundle, mode=None):
    net = bundle.generator

    @jax.jit
    def step(params, batch_stats, batch, rng):
        in_text = batch.get("in_text")
        in_audio = decode_audio(batch.get("in_audio"))
        target = batch["target_vec"]
        pre_seq = batch.get("pre_seq_partial")
        rngs = split_rngs(rng, ("noise", "dropout"))
        out_tuple, _ = apply_net(
            net, params, batch_stats, in_text, in_audio, pre_seq, target,
            mode, train=False, rngs=rngs, variational_encoding=False)
        recon = out_tuple[6]
        loss = jnp.mean(jnp.mean(jnp.abs(recon - target), axis=(1, 2)))
        return loss, recon

    return step
