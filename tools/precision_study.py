"""Gradient-fidelity study for the --rnn_bf16 mixed-precision recipe.

Question: does running the recurrent loops in bfloat16 (ops/recurrent.py
``set_rnn_dtype`` — carries, gates, and the recurrent matmul in bf16,
parameters/optimizer fp32) change the TRAINING SIGNAL of the flagship
GAN step in any way that matters?

Method (the standard mixed-precision argument): extract the EXACT
gradient each numerics mode produces for the same parameters, the same
rng stream, and the same batch, and compare the bf16-vs-fp32 gradient
error against the MINIBATCH NOISE FLOOR — the gradient difference
between two i.i.d. batches under fp32.  SGD-family training only
resolves the gradient up to minibatch noise; a numerics scheme whose
error is far below that floor perturbs each update by much less than
the randomness the optimizer already averages over.

Gradient extraction runs the production train step verbatim
(train/gan.py make_gan_train_step — the exact code path bench.py and
train.py compile) with the Adam factory swapped for a CAPTURE
transformation: updates are zero (parameters do not move, so the G
gradient is evaluated at the same point in both modes) and the raw
gradient lands in opt_state where the host can read it.  No production
code is modified; the swap targets the module attribute for this probe
process only.

Comparisons are computed host-side in float64.

Usage:
  python tools/precision_study.py [--batch 128] [--trained_ckpt PATH]

--trained_ckpt probes at trained weights (harsher: near-convergence
gradients are small relative to the parameters and the loss surface is
locally flat, so relative numeric error is at its worst).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_POSES = 34


def grad_capture():
    """optax transformation: zero updates, raw gradient -> opt_state."""
    import jax
    import jax.numpy as jnp
    import optax

    def init(params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def update(grads, state, params=None):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, grads)
        return zeros, grads

    return optax.GradientTransformation(init, update)


def to_host64(tree):
    import jax
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x), np.float64), tree)


def _flat(tree):
    import jax
    return np.concatenate([np.ravel(l)
                           for l in jax.tree_util.tree_leaves(tree)])


def cos_rel(ref, other):
    a, b = _flat(ref), _flat(other)
    cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
    rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30))
    return cos, rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trained_ckpt", default=None)
    ap.add_argument("--hidden_size", type=int, default=300)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--n_words", type=int, default=20000)
    ap.add_argument("--n_speakers", type=int, default=1400)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (plumbing smoke test)")
    cli = ap.parse_args()

    if cli.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from flax import serialization
    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache)
    compile_cache.enable()

    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train import gan
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        NetState)
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent

    key = jax.random.PRNGKey(0)
    if cli.trained_ckpt:
        from gesture_generation_from_trimodal_context_tpu.train.checkpoint \
            import load_checkpoint
        ckpt = load_checkpoint(cli.trained_ckpt)
        args, lang, spk = (ckpt["args"], ckpt["lang_model"],
                           ckpt["speaker_model"])
        bundle = factory.init_model(args, lang, spk, ckpt["pose_dim"])
        gvars = serialization.from_bytes(
            factory.generator_init_variables(bundle, args, key, cli.batch),
            ckpt["gen_vars_bytes"])
        dvars = serialization.from_bytes(
            factory.discriminator_init_variables(bundle, args, key,
                                                 cli.batch),
            ckpt["dis_vars_bytes"])
        n_words = lang.n_words
        n_speakers = spk.n_words if spk is not None else 1
    else:
        args, bundle, lang, spk = ge._flagship(
            hidden_size=cli.hidden_size, n_layers=cli.n_layers,
            n_words=cli.n_words, wordembed_dim=300,
            n_speakers=cli.n_speakers)
        gvars = factory.generator_init_variables(bundle, args, key,
                                                 cli.batch)
        dvars = factory.discriminator_init_variables(bundle, args, key,
                                                     cli.batch)
        n_words, n_speakers = cli.n_words, cli.n_speakers
    args.fused_gen_forwards = True
    args.fold_all_forwards = False

    # Host copies: the jitted step donates gen_state/dis_state, which
    # would invalidate device-resident init buffers after the first call.
    gvars = jax.device_get(gvars)
    dvars = jax.device_get(dvars)

    # Production step with the gradient-capture optimizer swapped in.
    # NOTE: _RNN_DTYPE is read at TRACE time (ops/recurrent.py gru_scan),
    # and jax.jit traces lazily at the first call — so the dtype must be
    # set around each step's first execution (grads_for below), not here.
    real_adam = gan.adam
    gan.adam = lambda lr: grad_capture()
    try:
        step_fns = {m: gan.make_gan_train_step(bundle, args)[0]
                    for m in ("fp32", "bf16")}
    finally:
        gan.adam = real_adam

    def make_batch(seed):
        rs = np.random.RandomState(seed)
        return {
            "in_text": rs.randint(0, n_words,
                                  (cli.batch, N_POSES)).astype(np.int32),
            "in_audio": rs.randn(cli.batch, 36267).astype(np.float32),
            "target_vec": (0.1 * rs.randn(cli.batch, N_POSES, 27)).astype(
                np.float32),
            "vid_indices": rs.randint(0, n_speakers,
                                      (cli.batch,)).astype(np.int32),
        }

    batches = {s: make_batch(s) for s in (0, 1)}
    tx = grad_capture()

    def grads_for(mode, batch_seed):
        g0 = NetState(params=gvars["params"],
                      batch_stats=gvars.get("batch_stats", {}),
                      opt_state=tx.init(gvars["params"]),
                      step=jax.numpy.zeros((), jax.numpy.int32))
        d0 = NetState(params=dvars["params"],
                      batch_stats=dvars.get("batch_stats", {}),
                      opt_state=tx.init(dvars["params"]),
                      step=jax.numpy.zeros((), jax.numpy.int32))
        t0 = time.time()
        recurrent.set_rnn_dtype(
            None if mode == "fp32" else jax.numpy.bfloat16)
        try:
            g1, d1, metrics = step_fns[mode](
                g0, d0, batches[batch_seed], jax.random.PRNGKey(7),
                train_d=True, add_gan=True)
        finally:
            recurrent.set_rnn_dtype(None)
        losses = {k: float(jax.device_get(v))
                  for k, v in metrics.items()}
        gg, dg = to_host64(g1.opt_state), to_host64(d1.opt_state)
        print("  %s batch%d: %s (%.1fs)"
              % (mode, batch_seed,
                 " ".join("%s %.6f" % kv for kv in sorted(losses.items())),
                 time.time() - t0), file=sys.stderr)
        return gg, dg, losses

    print("computing gradients (3 production steps, capture optimizer)...",
          file=sys.stderr)
    g_fp32, d_fp32, l_fp32 = grads_for("fp32", 0)
    g_bf16, d_bf16, l_bf16 = grads_for("bf16", 0)
    g_nz, d_nz, _ = grads_for("fp32", 1)

    report = {"losses": {"fp32": l_fp32, "bf16": l_bf16},
              "trained_ckpt": bool(cli.trained_ckpt)}
    for name, ref, other, noise in (("generator", g_fp32, g_bf16, g_nz),
                                    ("discriminator", d_fp32, d_bf16, d_nz)):
        cos, rel = cos_rel(ref, other)
        ncos, nrel = cos_rel(ref, noise)
        rows = {}
        for k in ref:
            rows[k] = {"cos": cos_rel(ref[k], other[k])[0],
                       "relL2": cos_rel(ref[k], other[k])[1],
                       "noise_relL2": cos_rel(ref[k], noise[k])[1]}
        worst = max(rows.items(), key=lambda kv: kv[1]["relL2"])
        print("%s:" % name, file=sys.stderr)
        print("  bf16 vs fp32 (same batch):  cos %.6f  relL2 %.4g"
              % (cos, rel), file=sys.stderr)
        print("  worst group %-24s cos %.6f  relL2 %.4g (noise relL2 %.4g)"
              % (worst[0], worst[1]["cos"], worst[1]["relL2"],
                 worst[1]["noise_relL2"]), file=sys.stderr)
        print("  fp32 minibatch noise floor: cos %.6f  relL2 %.4g"
              % (ncos, nrel), file=sys.stderr)
        report[name] = {"bf16_cos": cos, "bf16_relL2": rel,
                        "noise_cos": ncos, "noise_relL2": nrel,
                        "groups": rows}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
