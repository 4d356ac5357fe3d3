"""Jitted eval-mode forwards + in-graph validation metrics.

Behavioral contract: reference scripts/train.py:234-329
(evaluate_testset): per-batch generation in eval mode, L1 loss, joint MAE
over generated frames, acceleration difference (2nd discrete diff).  The
reference computes MAE/accel on host numpy after a device->host copy
(train.py:292-310); here they are fused into the same XLA program as the
forward — no host sync in the loop.

Two execution shapes:
- make_eval_step: one jitted call per batch (host input pipeline, or
  the resident iterator on a multi-device mesh);
- make_fused_eval_pass: the ENTIRE validation pass — in-HBM microbatch
  gathers, eval forwards, metrics, AND the FGD feature embedding — as
  one jitted lax.scan.  The per-batch path costs ~3 dispatches/batch
  over the remote-device tunnel (~100 ms each, measured round 2); the
  fused pass costs one dispatch per EPOCH.  Same math, same rng stream
  (fold_in(root_rng, 777000+k)), same batch composition.
"""

import jax
import jax.numpy as jnp

from ..ops import skeleton
from ..ops.quality import beat_alignment_score
from .common import build_pre_seq, decode_audio, split_rngs


def make_eval_body(bundle, args, mean_dir_vec):
    """Non-jitted per-batch eval math:
    fn(gen_vars, batch, vids, rng, mask=None) ->
    (loss, out_dir_vec, joint_mae, accel_diff, beat_align).

    beat_align (ops/quality.beat_alignment_score) is NaN for models
    whose eval batch carries no raw audio (seq2seq/speech2gesture/
    autoencoder); callers skip non-finite values.

    ``mask`` (float (B,), 1.0 = real sample) supports --eval_full_set's
    padded final batch: every reduction becomes a per-sample mean
    followed by a mask-weighted batch mean — identical math to the
    unmasked path on the real rows (all samples have the same
    per-sample element count).  mask=None keeps the original reduction
    expressions bit-for-bit."""
    gen = bundle.generator
    n_pre = args.n_pre_poses
    model = bundle.model_name
    mean_vec = jnp.asarray(mean_dir_vec).reshape(-1)

    def _bmean(x, mask):
        """Mean over all axes (mask=None) / masked mean over axis 0 of
        per-sample means (mask given)."""
        if mask is None:
            return jnp.mean(x)
        per = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def metrics(out, target, mask):
        out_p = skeleton.convert_dir_vec_to_pose(out + mean_vec)
        tgt_p = skeleton.convert_dir_vec_to_pose(target + mean_vec)
        diff = out_p[:, n_pre:] - tgt_p[:, n_pre:]
        mae = _bmean(jnp.abs(diff), mask)
        accel = _bmean(jnp.abs(jnp.diff(tgt_p, n=2, axis=1)
                               - jnp.diff(out_p, n=2, axis=1)), mask)
        return mae, accel

    def body(gen_vars, batch, vids, rng, mask=None):
        has_audio = "in_audio" in batch
        if has_audio:
            batch = dict(batch, in_audio=decode_audio(batch["in_audio"]))
        target = batch["target_vec"]
        rngs = split_rngs(rng, ("noise", "dropout"))
        if model == "multimodal_context":
            pre_seq = build_pre_seq(target, n_pre)
            out, *_ = gen.apply(gen_vars, pre_seq, batch["in_text"],
                                batch["in_audio"], vids, train=False,
                                rngs=rngs)
            loss = _bmean(jnp.abs(out - target), mask)
        elif model == "joint_embedding":
            res = gen.apply(gen_vars, batch["in_text"], batch["in_audio"],
                            target[:, :n_pre], target, "speech",
                            train=False, rngs=rngs)
            out = res[6]
            loss = _bmean(jnp.abs(out - target), mask)
        elif model == "gesture_autoencoder":
            res = gen.apply(gen_vars, None, None, target[:, :n_pre], target,
                            None, train=False, rngs=rngs)
            out = res[6]
            loss = _bmean(jnp.abs(out - target), mask)
        elif model == "seq2seq":
            out = gen.apply(gen_vars, batch["word_seq"],
                            batch["word_lengths"], target, train=False,
                            rngs=rngs)
            loss = _bmean(jnp.abs(out - target), mask)
        elif model == "speech2gesture":
            out = gen.apply(gen_vars, batch["in_spec"], target[:, :n_pre],
                            train=False, rngs=rngs)
            loss = _bmean(jnp.abs(out - target), mask)
        else:
            raise ValueError(model)

        mae, accel = metrics(out, target, mask)
        if has_audio:
            beat = beat_alignment_score(batch["in_audio"], out, mask)
        else:
            beat = jnp.float32(jnp.nan)
        return loss, out, mae, accel, beat

    return body


def make_eval_step(bundle, args, mean_dir_vec):
    """Returns jit fn(gen_vars, batch, vids, rng, mask=None) ->
    (loss, out_dir_vec, joint_mae, accel_diff, beat_align).
    See make_eval_body."""
    body = make_eval_body(bundle, args, mean_dir_vec)

    @jax.jit
    def step(gen_vars, batch, vids, rng, mask=None):
        return body(gen_vars, batch, vids, rng, mask)

    return step


def make_fused_eval_pass(bundle, args, mean_dir_vec, audio_len=None,
                         use_vids=False, embed_apply=None, mesh=None):
    """The whole resident-data validation pass as ONE jitted program.

    fn(gen_vars, embed_vars, data, idx_stack, vids_stack, mask_stack,
       root_rng) -> dict of stacked per-batch device arrays:
        loss/mae/accel/beat (K,) mask-weighted batch means (beat NaN
        for audio-less models, see make_eval_body),
        count (K,) valid samples per batch,
        and when embed_apply is given (the FGD embedding net — signature
        (variables, poses, mask) -> (feat, masked_recon_err), see
        models/evaluator.EmbeddingSpaceEvaluator._embed):
        gen_feat/real_feat (K, B, F), recon_fake/recon_real (K,).

    idx_stack (K, B) i32 resident row indices per microbatch;
    vids_stack (K, B) i32 (ignored unless use_vids);
    mask_stack (K, B) f32, 1.0 = real sample — all-ones rows reproduce
    the per-batch path's unmasked means, a partially-zero final row is
    --eval_full_set's padded tail.  The per-batch rng matches the
    per-batch path exactly: fold_in(root_rng, 777000 + k).

    Replaces the reference's per-batch host loop
    (reference train.py:234-329) with an in-HBM gather + scan; single
    host dispatch per validation pass.

    With a >1-device 'data' mesh (VERDICT r3 item 5) the in-scan gather
    is shard_map'd over the round-robin resident shards — each device
    gathers its LOCAL index block (idx rows use the same local layout as
    ResidentBatchIterator: device d's block at columns [d*B/dp,
    (d+1)*B/dp)) — while the eval math stays under plain jit semantics,
    so rng draws, batch means, and FGD features are computed on the
    GLOBAL batch exactly like the per-batch eval_step path on the same
    mesh."""
    from . import resident

    body = make_eval_body(bundle, args, mean_dir_vec)
    dp = resident.mesh_dp(mesh)
    if dp > 1:
        from jax.sharding import PartitionSpec as P
        gather = resident._shard_map(
            lambda d, i: resident.gather_batch(d, i, audio_len),
            mesh, in_specs=(P(resident.DATA_AXIS), P(resident.DATA_AXIS)),
            out_specs=P(resident.DATA_AXIS))
    else:
        gather = lambda d, i: resident.gather_batch(d, i, audio_len)

    @jax.jit
    def eval_pass(gen_vars, embed_vars, data, idx_stack, vids_stack,
                  mask_stack, root_rng):
        def scan_body(_, xs):
            idx, vids, mask, k = xs
            batch = gather(data, idx)
            rng = jax.random.fold_in(root_rng, 777_000 + k)
            loss, out, mae, accel, beat = body(
                batch=batch, gen_vars=gen_vars,
                vids=vids if use_vids else None, rng=rng, mask=mask)
            ys = {"loss": loss, "mae": mae, "accel": accel, "beat": beat,
                  "count": jnp.sum(mask)}
            if embed_apply is not None:
                gen_feat, recon_f = embed_apply(embed_vars, out, mask)
                real_feat, recon_r = embed_apply(
                    embed_vars, batch["target_vec"], mask)
                ys.update(gen_feat=gen_feat, real_feat=real_feat,
                          recon_fake=recon_f, recon_real=recon_r)
            return None, ys

        ks = jnp.arange(idx_stack.shape[0])
        _, ys = jax.lax.scan(scan_body, None,
                             (idx_stack, vids_stack, mask_stack, ks))
        return ys

    return eval_pass
