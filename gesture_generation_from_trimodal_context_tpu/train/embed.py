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


def make_embed_train_step(bundle, args, mode=None, use_pose_diff=False,
                          grad_reduce=None):
    """grad_reduce: optional tree-map applied to gradients before the
    optimizer update (the shard_map variants pass a psum over the data
    axis — the reference's SUMMED recon loss makes the shard-sum exact;
    None for the jit path where XLA reduces)."""
    net = bundle.generator
    tx = adam(args.learning_rate)
    n_pre = args.n_pre_poses
    reduce_grads = grad_reduce or (lambda g: g)

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
        state = apply_grads(state, tx, reduce_grads(grads), bs)
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


def _psum_tree(axis):
    return lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis), t)


def make_embed_train_step_shardmap(bundle, args, mesh, mode=None,
                                   use_pose_diff=False):
    """Explicit-SPMD variant of the embed train step via shard_map.

    Where the jit path treats the sharded batch as one logical array
    (global-batch BatchNorm statistics), this variant runs the reference
    math per shard — per-device BN batch statistics and per-device
    dropout/noise draws, exactly like torch DataParallel — and reduces
    explicitly over ICI: loss and grads via psum (the reference's summed
    recon loss makes the shard-sum exact), running BN stats via pmean.

    Reuses step_body so the whole batch dict (incl. in_text/in_audio,
    which joint_embedding's ContextEncoder REQUIRES for mode='random' —
    reference embedding_net.py:294-299) is sharded per device; the
    previous target-only variant crashed that family.
    """
    from .resident import _shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"
    step, tx = make_embed_train_step(bundle, args, mode=mode,
                                     use_pose_diff=use_pose_diff,
                                     grad_reduce=_psum_tree(axis))
    body = step.body

    def shard_body(state, batch, rng):
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        state, metrics = body(state, batch, local_rng)
        # summed recon loss: the global metric is the shard-sum
        metrics = {k: jax.lax.psum(v, axis) for k, v in metrics.items()}
        state = state.replace(batch_stats=jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), state.batch_stats))
        return state, metrics

    fn = _shard_map(shard_body, mesh, in_specs=(P(), P(axis), P()),
                    out_specs=(P(), P()))
    return jax.jit(fn), tx


def make_embed_multi_step_shardmap(bundle, args, mesh, n_steps, mode=None,
                                   use_pose_diff=False):
    """steps_per_call fusion for the DataParallel-faithful shard_map path
    (VERDICT r3 item 4): a lax.scan over n_steps stacked microbatches
    runs INSIDE the shard_map'd body — per-step semantics identical to
    n_steps make_embed_train_step_shardmap calls (per-shard BN/dropout,
    psum'd grads and loss, per-step pmean'd running stats), one
    host<->device dispatch per n_steps iterations."""
    from .resident import scan_single_state_shardmap
    step, tx = make_embed_train_step(bundle, args, mode=mode,
                                     use_pose_diff=use_pose_diff,
                                     grad_reduce=_psum_tree("data"))
    return scan_single_state_shardmap(step.body, mesh,
                                      metrics_reduce="psum"), tx


def make_embed_resident_multi_step_shardmap(bundle, args, mesh, mode=None,
                                            use_pose_diff=False):
    """--device_resident_data under the DataParallel-faithful shard_map
    strategy (VERDICT r3 item 6): per-shard in-HBM gathers feed the
    per-shard faithful step inside ONE shard_map'd scan."""
    from ..ops import audio as audio_ops
    from .resident import make_single_state_resident_multi_step_shardmap
    step, tx = make_embed_train_step(bundle, args, mode=mode,
                                     use_pose_diff=use_pose_diff,
                                     grad_reduce=_psum_tree("data"))
    audio_len = audio_ops.calc_audio_length_from_motion_length(
        args.n_poses, args.motion_resampling_framerate)
    return make_single_state_resident_multi_step_shardmap(
        step.body, audio_len, mesh, metrics_reduce="psum"), tx


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
