"""Jitted eval-mode forwards + in-graph validation metrics.

Behavioral contract: reference scripts/train.py:234-329
(evaluate_testset): per-batch generation in eval mode, L1 loss, joint MAE
over generated frames, acceleration difference (2nd discrete diff).  The
reference computes MAE/accel on host numpy after a device->host copy
(train.py:292-310); here they are fused into the same XLA program as the
forward — no host sync in the loop.
"""

import jax
import jax.numpy as jnp

from ..ops import skeleton
from .common import build_pre_seq, decode_audio, split_rngs


def make_eval_step(bundle, args, mean_dir_vec):
    """Returns jit fn(gen_vars, batch, vids, rng, mask=None) ->
    (loss, out_dir_vec, joint_mae, accel_diff).

    ``mask`` (float (B,), 1.0 = real sample) supports --eval_full_set's
    padded final batch on a multi-device mesh: every reduction becomes a
    per-sample mean followed by a mask-weighted batch mean — identical
    math to the unmasked path on the real rows (all samples have the
    same per-sample element count).  mask=None (the default) keeps the
    original reduction expressions bit-for-bit."""
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

    @jax.jit
    def step(gen_vars, batch, vids, rng, mask=None):
        if "in_audio" in batch:
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
        return loss, out, mae, accel

    return step
