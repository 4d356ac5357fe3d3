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


SPEC_LEN = 70  # calc_spectrogram_length_from_motion_length(34, 15)

# family -> (published hidden_size, n_layers, has discriminator)
FAMILY_DIMS = {
    "multimodal_context": (300, 4, True),
    "joint_embedding": (300, 4, False),
    "gesture_autoencoder": (300, 4, False),
    "seq2seq": (200, 2, False),
    "speech2gesture": (300, 4, True),
}


def _family_setup(family, cli, ckpt_path):
    """(args, bundle, gvars, dvars|None, lang, spk) at published dims, or
    loaded from a trained checkpoint of that family."""
    import jax
    from flax import serialization
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory

    key = jax.random.PRNGKey(0)
    if ckpt_path:
        from gesture_generation_from_trimodal_context_tpu.train.checkpoint \
            import load_checkpoint
        ckpt = load_checkpoint(ckpt_path)
        args, lang, spk = (ckpt["args"], ckpt["lang_model"],
                           ckpt["speaker_model"])
        assert args.model == family, (args.model, family)
        bundle = factory.init_model(args, lang, spk, ckpt["pose_dim"])
        gvars = serialization.from_bytes(
            factory.generator_init_variables(bundle, args, key, cli.batch),
            ckpt["gen_vars_bytes"])
        dvars = None
        if ckpt.get("dis_vars_bytes"):
            dvars = serialization.from_bytes(
                factory.discriminator_init_variables(bundle, args, key,
                                                     cli.batch),
                ckpt["dis_vars_bytes"])
    else:
        hidden, layers, has_dis = FAMILY_DIMS[family]
        args, bundle, lang, spk = ge._flagship(
            hidden_size=cli.hidden_size or hidden,
            n_layers=cli.n_layers or layers,
            n_words=cli.n_words, wordembed_dim=300,
            n_speakers=cli.n_speakers)
        if family != "multimodal_context":
            args.model = family
            bundle = factory.init_model(
                args, lang, spk if family == "multimodal_context" else None,
                27)
        gvars = factory.generator_init_variables(bundle, args, key,
                                                 cli.batch)
        dvars = factory.discriminator_init_variables(
            bundle, args, key, cli.batch) if has_dis else None
    args.fused_gen_forwards = True
    args.fold_all_forwards = False
    # host copies: the jitted steps donate their state arguments
    return (args, bundle, jax.device_get(gvars),
            jax.device_get(dvars) if dvars is not None else None, lang, spk)


def _family_steps(family, bundle, args):
    """Build the family's PRODUCTION train step twice (fp32/bf16 trace
    slots) with the gradient-capture optimizer swapped for its Adam
    factory.  Returns (step_fns, two_state, static_kwargs)."""
    if family == "multimodal_context":
        from gesture_generation_from_trimodal_context_tpu.train import gan
        mod, attr, make = gan, "adam", \
            lambda: gan.make_gan_train_step(bundle, args)[0]
        two_state, kw = True, {"train_d": True, "add_gan": True}
    elif family in ("joint_embedding", "gesture_autoencoder"):
        from gesture_generation_from_trimodal_context_tpu.train import embed
        mode = "random" if family == "joint_embedding" else None
        mod, attr, make = embed, "adam", \
            lambda: embed.make_embed_train_step(bundle, args, mode=mode)[0]
        two_state, kw = False, {}
    elif family == "seq2seq":
        from gesture_generation_from_trimodal_context_tpu.train import (
            seq2seq_step)
        mod, attr, make = seq2seq_step, "adam_clipped", \
            lambda: seq2seq_step.make_seq2seq_train_step(bundle, args)[0]
        two_state, kw = False, {}
    elif family == "speech2gesture":
        from gesture_generation_from_trimodal_context_tpu.train import s2g
        mod, attr, make = s2g, "adam", \
            lambda: s2g.make_s2g_train_step(bundle, args)[0]
        two_state, kw = True, {}
    else:
        raise ValueError(family)

    real = getattr(mod, attr)
    setattr(mod, attr, lambda *a, **k: grad_capture())
    try:
        step_fns = {m: make() for m in ("fp32", "bf16")}
    finally:
        setattr(mod, attr, real)
    return step_fns, two_state, kw


def _family_batch(family, cli, seed, n_words, n_speakers):
    rs = np.random.RandomState(seed)
    b = cli.batch
    target = (0.1 * rs.randn(b, N_POSES, 27)).astype(np.float32)
    if family == "multimodal_context":
        return {"in_text": rs.randint(0, n_words,
                                      (b, N_POSES)).astype(np.int32),
                "in_audio": rs.randn(b, 36267).astype(np.float32),
                "target_vec": target,
                "vid_indices": rs.randint(0, n_speakers,
                                          (b,)).astype(np.int32)}
    if family == "joint_embedding":
        return {"in_text": rs.randint(0, n_words,
                                      (b, N_POSES)).astype(np.int32),
                "in_audio": rs.randn(b, 36267).astype(np.float32),
                "target_vec": target}
    if family == "gesture_autoencoder":
        return {"target_vec": target}
    if family == "seq2seq":
        return {"word_seq": rs.randint(0, n_words, (b, 9)).astype(np.int32),
                "word_lengths": np.full(b, 9, np.int32),
                "target_vec": target}
    if family == "speech2gesture":
        return {"in_spec": rs.randn(b, 128, SPEC_LEN).astype(np.float32),
                "target_vec": target}
    raise ValueError(family)


def run_family(family, cli, ckpt_path):
    import jax
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        NetState)
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent

    print("== %s%s ==" % (family, " @ %s" % ckpt_path if ckpt_path else
                          " @ random init"), file=sys.stderr)
    args, bundle, gvars, dvars, lang, spk = _family_setup(family, cli,
                                                          ckpt_path)
    n_words = lang.n_words
    n_speakers = spk.n_words if spk is not None else 1
    # NOTE: _RNN_DTYPE is read at TRACE time (ops/recurrent.py gru_scan),
    # and jax.jit traces lazily at the first call — so the dtype is set
    # around each step's first execution (grads_for), not at build.
    step_fns, two_state, static_kw = _family_steps(family, bundle, args)
    batches = {s: _family_batch(family, cli, s, n_words, n_speakers)
               for s in (0, 1)}
    tx = grad_capture()

    def mk_state(vars_):
        return NetState(params=vars_["params"],
                        batch_stats=vars_.get("batch_stats", {}),
                        opt_state=tx.init(vars_["params"]),
                        step=jax.numpy.zeros((), jax.numpy.int32))

    def grads_for(mode, batch_seed):
        t0 = time.time()
        recurrent.set_rnn_dtype(
            None if mode == "fp32" else jax.numpy.bfloat16)
        try:
            if two_state:
                g1, d1, metrics = step_fns[mode](
                    mk_state(gvars), mk_state(dvars), batches[batch_seed],
                    jax.random.PRNGKey(7), **static_kw)
            else:
                g1, metrics = step_fns[mode](
                    mk_state(gvars), batches[batch_seed],
                    jax.random.PRNGKey(7))
                d1 = None
        finally:
            recurrent.set_rnn_dtype(None)
        losses = {k: float(jax.device_get(v)) for k, v in metrics.items()}
        gg = to_host64(g1.opt_state)
        dg = to_host64(d1.opt_state) if d1 is not None else None
        print("  %s batch%d: %s (%.1fs)"
              % (mode, batch_seed,
                 " ".join("%s %.6f" % kv for kv in sorted(losses.items())),
                 time.time() - t0), file=sys.stderr)
        return gg, dg, losses

    g_fp32, d_fp32, l_fp32 = grads_for("fp32", 0)
    g_bf16, d_bf16, l_bf16 = grads_for("bf16", 0)
    g_nz, d_nz, _ = grads_for("fp32", 1)

    report = {"family": family, "losses": {"fp32": l_fp32, "bf16": l_bf16},
              "trained_ckpt": bool(ckpt_path)}
    nets = [("generator", g_fp32, g_bf16, g_nz)]
    if d_fp32 is not None:
        nets.append(("discriminator", d_fp32, d_bf16, d_nz))
    for name, ref, other, noise in nets:
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
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trained_ckpt", action="append", default=[],
                    help="checkpoint path (repeatable; family sniffed "
                         "from the checkpoint args)")
    ap.add_argument("--families", default="",
                    help="comma list (or 'all') to ALSO probe at random "
                         "init; default: multimodal_context when no "
                         "--trained_ckpt given")
    ap.add_argument("--hidden_size", type=int, default=0,
                    help="override (0 = the family's published size)")
    ap.add_argument("--n_layers", type=int, default=0)
    ap.add_argument("--n_words", type=int, default=20000)
    ap.add_argument("--n_speakers", type=int, default=1400)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (plumbing smoke test)")
    cli = ap.parse_args()

    if cli.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache)
    compile_cache.enable()

    runs = []
    for path in cli.trained_ckpt:
        from gesture_generation_from_trimodal_context_tpu.train.checkpoint \
            import load_checkpoint
        fam = load_checkpoint(path)["args"].model
        runs.append((fam, path))
    fams = cli.families
    if fams == "all":
        fams = ",".join(FAMILY_DIMS)
    if not fams and not runs:
        fams = "multimodal_context"
    for fam in filter(None, fams.split(",")):
        runs.append((fam, None))

    reports = [run_family(fam, cli, path) for fam, path in runs]
    out = reports[0] if len(reports) == 1 else {"runs": reports}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
