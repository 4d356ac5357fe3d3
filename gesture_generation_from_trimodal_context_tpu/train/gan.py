"""Jitted adversarial train step for the multimodal_context model.

Behavioral contract: reference scripts/train_eval/train_gan.py:13-103.
One compiled XLA program performs, in order (matching the reference):
  1. pre_seq construction (seed poses + constraint bit),
  2. D update (when epoch > loss_warmup and loss_gan_weight > 0):
     ns-GAN log loss on real vs detached generated sequences,
  3. G update: beta-scaled Huber + GAN term (epoch-gated) + speaker-z KLD
     + diversity regularizer (pose-L1 / z-L1 between two speaker draws,
     clamped at -1000), with a third (detached) generator forward for the
     regularizer.

Fidelity notes:
- every generator/discriminator forward runs in train mode, so BatchNorm
  running stats update on each of the up-to-3 G / 3 D forwards per
  iteration, exactly like the reference's module.train(True) state;
- the generator's speaker z is reparameterized per forward (fresh noise);
- epoch gating is a static argument (two specializations compile: warmup
  and steady state).

TPU notes: both optimizer updates live in the same jit, so the whole
iteration is one device program; under a data mesh the batch is sharded on
axis 0 and XLA inserts the gradient all-reduce over ICI.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .common import (apply_net, build_pre_seq, decode_audio, smooth_l1,
                     smooth_l1_none, split_rngs)
from ..ops.layers import BN_MOMENTUM
from .state import NetState, adam, apply_grads

EPS = 1e-8


def make_gan_train_step(bundle, args, grad_reduce=None):
    """grad_reduce: optional tree-map applied to gradients before the
    optimizer updates (the shard_map variant passes a pmean over the
    data axis; None for the jit/pjit path where XLA reduces).

    MAINTENANCE NOTE: the loss math exists in three measured variants
    below (step_body = faithful, fused_step_body, folded_step_body) that
    intentionally differ in forward batching, not in the formulas.  A
    change to the D loss, Huber/KLD/div-reg terms, or the BN stat
    bookkeeping must be applied to ALL THREE;
    tests/test_train_steps.py::test_fused_gan_step_matches_faithful_exactly
    pins their equivalence."""
    gen, dis = bundle.generator, bundle.discriminator
    gen_tx = adam(args.learning_rate)
    dis_tx = adam(args.learning_rate * args.discriminator_lr_weight)
    reduce_grads = grad_reduce or (lambda g: g)

    n_pre = args.n_pre_poses
    w_rg = args.loss_regression_weight
    w_gan = args.loss_gan_weight
    w_kld = args.loss_kld_weight
    w_reg = args.loss_reg_weight
    z_type = gen.z_type
    # DOCUMENTED DEVIATION (--gan_prob_clamp c, default 0 = reference
    # math): clamp D's probability into [c, 1-c] before the logs.  The
    # reference's ns-GAN loss hits log(0) = inf once D saturates to
    # exact 0/1 outputs (observed at epoch 39 of the saturated synthetic
    # full-recipe run, RESULTS.md); the clamp bounds losses/gradients so
    # long runs survive D saturation.
    prob_clamp = float(getattr(args, "gan_prob_clamp", 0.0) or 0.0)

    def log_d(p):
        if prob_clamp > 0.0:
            p = jnp.clip(p, prob_clamp, 1.0 - prob_clamp)
        return jnp.log(p + EPS)

    def log_1md(p):
        if prob_clamp > 0.0:
            p = jnp.clip(p, prob_clamp, 1.0 - prob_clamp)
        return jnp.log(1.0 - p + EPS)

    def gen_fwd(params, bstats, pre_seq, in_text, in_audio, vids, rng):
        rngs = split_rngs(rng, ("noise", "dropout"))
        return apply_net(gen, params, bstats, pre_seq, in_text, in_audio,
                         vids, train=True, rngs=rngs)

    # the text-conditioned GRU discriminator (--discriminator_type
    # gru_text) consumes the batch's word indices alongside the poses;
    # conv/gru discriminators ignore them (every call site passes the
    # in-scope in_text so all step variants support both)
    dis_text = getattr(dis, "use_text", False)

    def dis_fwd(params, bstats, poses, in_text, rng):
        rngs = split_rngs(rng, ("dropout",))
        if dis_text:
            return apply_net(dis, params, bstats, poses, in_text,
                             train=True, rngs=rngs)
        return apply_net(dis, params, bstats, poses, train=True, rngs=rngs)

    # the reference's dormant noisy-target D path (train_gan.py:8-10,17,
    # 32-39 — implemented upstream but hard-disabled): N(0, 0.1) noise on
    # the D-step's real/fake pose inputs; --use_noisy_target opts in.
    # The G-step's discriminator forward stays clean, like the reference.
    noisy_target = bool(getattr(args, "use_noisy_target", False))

    def d_inputs(target, fake, key):
        if not noisy_target:
            return target, fake
        k1, k2 = jax.random.split(key)
        return (target + 0.1 * jax.random.normal(k1, target.shape,
                                                 target.dtype),
                fake + 0.1 * jax.random.normal(k2, fake.shape, fake.dtype))

    def _chain_updates(s0, r_once, n):
        """Exact running-stat chain for n sequential BN updates that all
        see the SAME batch statistics b, given one observed update
        r_once = m*s0 + (1-m)*b: iterating s <- m*s + (1-m)*b n times.
        Every BatchNorm in the generator sits in the WavEncoder and sees
        the identical raw-audio batch on each of the step's forwards, so
        this reproduces the reference's sequential-update bookkeeping
        bit-for-math (momentum m = BN_MOMENTUM, ops/layers.py)."""
        def leaf(s, r):
            m = BN_MOMENTUM
            b_term = r - m * s            # == (1-m) * b
            out = s
            for _ in range(n):
                out = m * out + b_term
            return out
        return jax.tree_util.tree_map(leaf, s0, r_once)

    def fused_step_body(gen_state: NetState, dis_state: NetState, batch,
                        rng, train_d: bool, add_gan: bool):
        """Fused variant (--fused_gen_forwards): the two NO-GRAD generator
        forwards (the D-step's fake and the diversity regularizer's
        shuffled-speaker draw) run as ONE 2B-batched forward, and the
        D-step's real/fake discriminator forwards run as ONE vmapped
        forward.  The differentiable G-step forward stays at batch B so
        the backward pass does not grow.  (Folding ALL THREE generator
        forwards into the differentiated forward was measured SLOWER —
        3.17 ms vs 2.17 ms per step on a v5e chip — because the tripled
        backward over the GRU scans outweighs the saved forward chains;
        see RESULTS.md.)

        Numerically this matches the faithful path exactly (reference
        train_gan.py:27-84) up to RNG stream assignment:
        - generator train-mode BN normalization is unchanged because its
          BN layers (WavEncoder) see the same duplicated audio batch, and
          the running-stat chain is reconstructed exactly (_chain_updates);
        - the discriminator runs real and fake as separate vmap slices, so
          each keeps its own batch statistics like the reference's two
          forwards, and the stat chain is recombined exactly.
        Win: ~1/3 fewer sequential GRU scan chains per iteration
        (measured 2.42 -> 2.17 ms/step at the published recipe)."""
        in_text = batch["in_text"]
        in_audio = decode_audio(batch["in_audio"])
        target = batch["target_vec"]
        vids = batch.get("vid_indices")

        pre_seq = build_pre_seq(target, n_pre)
        metrics = {}
        r = jax.random.split(rng, 6)
        gen_bs = gen_state.batch_stats
        use_div = z_type in ("speaker", "random") and w_reg > 0.0

        # the generator consumes vids only for z_type='speaker'; drop
        # them otherwise so the batched slices stay length-consistent
        if z_type != "speaker":
            vids = None

        # ---- one batched no-grad generator forward ----
        fake = out_rand = z_rand = None
        if train_d or use_div:
            n_rep = int(train_d) + int(use_div)
            vid_parts = []
            if train_d and vids is not None:
                vid_parts.append(vids)
            if use_div and z_type == "speaker":
                rand_vids = batch.get("rand_vids")
                if rand_vids is None:
                    rand_vids = jax.random.permutation(r[5], vids)
                vid_parts.append(rand_vids)
            cat = lambda x: jnp.concatenate([x] * n_rep, 0)
            big_vids = jnp.concatenate(vid_parts, 0) if vid_parts else None
            (big_out, big_z, *_), r_big = gen_fwd(
                gen_state.params, gen_bs, cat(pre_seq), cat(in_text),
                cat(in_audio), big_vids, r[0])
            # exact sequential running-stat bookkeeping for the n_rep
            # faithful forwards this fused call replaces
            gen_bs = _chain_updates(gen_bs, r_big, n_rep)
            big_out = jax.lax.stop_gradient(big_out)
            big_z = jax.lax.stop_gradient(big_z) if big_z is not None \
                else None
            B = target.shape[0]
            parts = [big_out[i * B:(i + 1) * B] for i in range(n_rep)]
            if train_d:
                fake = parts.pop(0)
            if use_div:
                out_rand = parts.pop(0)
                z_rand = big_z[-B:] if big_z is not None else None

        # ---- D step: real and fake as vmap slices of ONE forward (each
        # slice keeps its own batch statistics, like the reference's two
        # separate forwards; the recurrent matmuls batch on the MXU) ----
        if train_d:
            def d_loss_fn(d_params):
                both = jnp.stack(d_inputs(target, fake,
                                          jax.random.fold_in(r[1], 777)))
                d_both, bs2 = jax.vmap(
                    lambda poses, k: dis_fwd(d_params, dis_state.batch_stats,
                                             poses, in_text, k))(
                    both, jnp.stack([r[1], r[2]]))
                loss = -jnp.mean(log_d(d_both[0])
                                 + log_1md(d_both[1]))
                # exact chain: r_slice = m*s0 + (1-m)*b_slice  =>
                # s2 = m*r_real + (r_fake - m*s0)
                s0 = dis_state.batch_stats
                bs = jax.tree_util.tree_map(
                    lambda s, rr: BN_MOMENTUM * rr[0]
                    + (rr[1] - BN_MOMENTUM * s), s0, bs2)
                return loss, bs
            (d_loss, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dis_state.params)
            dis_state = apply_grads(dis_state, dis_tx,
                                    reduce_grads(d_grads), d_bs)
            metrics["dis"] = d_loss

        # ---- G step (single differentiable forward at batch B) ----
        def g_loss_fn(g_params):
            (out, z, z_mu, z_logvar), g_bs = gen_fwd(
                g_params, gen_bs, pre_seq, in_text, in_audio, vids, r[3])
            huber = smooth_l1(out, target, beta=0.1)
            d_out, d_bs = dis_fwd(dis_state.params, dis_state.batch_stats,
                                  out, in_text, r[4])
            gen_err = -jnp.mean(log_d(d_out))

            aux_metrics = {"loss": w_rg * huber}
            loss = w_rg * huber
            if use_div:
                pose_l1 = smooth_l1_none(out, out_rand, beta=0.05)
                pose_l1 = pose_l1.sum(axis=1).sum(axis=1)
                pose_l1 = pose_l1.reshape(pose_l1.shape[0], -1).mean(axis=1)
                z_l1 = jnp.abs(jax.lax.stop_gradient(z) - z_rand)
                z_l1 = z_l1.reshape(z_l1.shape[0], -1).mean(axis=1)
                div_reg = -(pose_l1 / (z_l1 + 1.0e-5))
                div_reg = jnp.clip(div_reg, -1000.0, None).mean()
                aux_metrics["DIV_REG"] = w_reg * div_reg
                if z_type == "speaker":
                    kld = -0.5 * jnp.mean(1 + z_logvar - z_mu ** 2
                                          - jnp.exp(z_logvar))
                    aux_metrics["KLD"] = w_kld * kld
                    loss = loss + w_kld * kld + w_reg * div_reg
                else:
                    loss = loss + w_reg * div_reg
            if add_gan:
                loss = loss + w_gan * gen_err
                aux_metrics["gen"] = w_gan * gen_err
            return loss, (g_bs, d_bs, aux_metrics)

        (_, (g_bs, d_bs, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_state.params)
        gen_state = apply_grads(gen_state, gen_tx,
                                reduce_grads(g_grads), g_bs)
        # the reference's D also sees the G-step forward in train mode
        dis_state = dis_state.replace(batch_stats=d_bs)
        metrics.update(g_metrics)
        return gen_state, dis_state, metrics

    def folded_step_body(gen_state: NetState, dis_state: NetState, batch,
                         rng, train_d: bool, add_gan: bool):
        """Fully-folded variant (--fold_all_forwards): ALL generator
        forwards of the iteration (the differentiated G-step forward, the
        D-step's fake, and the diversity regularizer's shuffled-speaker
        draw) run as ONE (1+train_d+use_div)*B-batched forward captured
        with jax.vjp; gradients flow back through slice 0 only (the other
        slices get zero cotangents, reproducing the reference's
        stop_gradient semantics).  One forward chain + one backward chain
        per iteration is the minimum possible number of sequential GRU
        scan chains for this loss.

        Same exactness argument as fused_step_body: BN normalization uses
        current-batch statistics which are identical across the duplicated
        audio slices, and the running-stat chain is reconstructed exactly
        (_chain_updates).  RNG stream assignment differs from the faithful
        path (documented deviation; the reference is unseeded anyway).

        Round-1 note: this variant was rejected based on timings taken
        with jax.block_until_ready, which does not drain the axon tunnel's
        remote queue (see bench.py); honest slope timing re-measured it.
        """
        in_text = batch["in_text"]
        in_audio = decode_audio(batch["in_audio"])
        target = batch["target_vec"]
        vids = batch.get("vid_indices")

        pre_seq = build_pre_seq(target, n_pre)
        metrics = {}
        r = jax.random.split(rng, 6)
        gen_bs0 = gen_state.batch_stats
        use_div = z_type in ("speaker", "random") and w_reg > 0.0
        B = target.shape[0]

        if z_type != "speaker":
            vids = None  # consumed only for z_type='speaker'

        # slice order: [grad | fake (train_d) | rand (use_div)]
        n_rep = 1 + int(train_d) + int(use_div)
        vid_parts = [vids] * (1 + int(train_d)) if vids is not None else []
        if use_div and z_type == "speaker":
            rand_vids = batch.get("rand_vids")
            if rand_vids is None:
                rand_vids = jax.random.permutation(r[5], vids)
            vid_parts.append(rand_vids)
        cat = lambda x: jnp.concatenate([x] * n_rep, 0)
        big_vids = jnp.concatenate(vid_parts, 0) if vid_parts else None

        def fwd(g_params):
            (out, z, z_mu, z_logvar), g_bs = gen_fwd(
                g_params, gen_bs0, cat(pre_seq), cat(in_text),
                cat(in_audio), big_vids, r[0])
            zero = jnp.zeros(())
            diff = (out, z_mu if z_mu is not None else zero,
                    z_logvar if z_logvar is not None else zero)
            return diff, (z, g_bs)

        (big_out, big_mu, big_lv), gvjp, (big_z, g_bs_once) = jax.vjp(
            fwd, gen_state.params, has_aux=True)
        gen_bs = _chain_updates(gen_bs0, g_bs_once, n_rep)

        # ---- D step (same vmapped real/fake forward as fused_step_body) ----
        if train_d:
            fake = jax.lax.stop_gradient(big_out[B:2 * B])

            def d_loss_fn(d_params):
                both = jnp.stack(d_inputs(target, fake,
                                          jax.random.fold_in(r[1], 777)))
                d_both, bs2 = jax.vmap(
                    lambda poses, k: dis_fwd(d_params, dis_state.batch_stats,
                                             poses, in_text, k))(
                    both, jnp.stack([r[1], r[2]]))
                loss = -jnp.mean(log_d(d_both[0])
                                 + log_1md(d_both[1]))
                s0 = dis_state.batch_stats
                bs = jax.tree_util.tree_map(
                    lambda s, rr: BN_MOMENTUM * rr[0]
                    + (rr[1] - BN_MOMENTUM * s), s0, bs2)
                return loss, bs
            (d_loss, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dis_state.params)
            dis_state = apply_grads(dis_state, dis_tx,
                                    reduce_grads(d_grads), d_bs)
            metrics["dis"] = d_loss

        # ---- G step: loss head on slice 0, backward via the saved vjp ----
        def head_loss(out_all, mu_all, lv_all):
            out = out_all[:B]
            huber = smooth_l1(out, target, beta=0.1)
            d_out, d_bs = dis_fwd(dis_state.params, dis_state.batch_stats,
                                  out, in_text, r[4])
            gen_err = -jnp.mean(log_d(d_out))

            aux_metrics = {"loss": w_rg * huber}
            loss = w_rg * huber
            if use_div:
                out_rand = jax.lax.stop_gradient(out_all[-B:])
                pose_l1 = smooth_l1_none(out, out_rand, beta=0.05)
                pose_l1 = pose_l1.sum(axis=1).sum(axis=1)
                pose_l1 = pose_l1.reshape(pose_l1.shape[0], -1).mean(axis=1)
                z_l1 = jnp.abs(jax.lax.stop_gradient(
                    big_z[:B] - big_z[-B:]))
                z_l1 = z_l1.reshape(z_l1.shape[0], -1).mean(axis=1)
                div_reg = -(pose_l1 / (z_l1 + 1.0e-5))
                div_reg = jnp.clip(div_reg, -1000.0, None).mean()
                aux_metrics["DIV_REG"] = w_reg * div_reg
                if z_type == "speaker":
                    z_mu, z_logvar = mu_all[:B], lv_all[:B]
                    kld = -0.5 * jnp.mean(1 + z_logvar - z_mu ** 2
                                          - jnp.exp(z_logvar))
                    aux_metrics["KLD"] = w_kld * kld
                    loss = loss + w_kld * kld + w_reg * div_reg
                else:
                    loss = loss + w_reg * div_reg
            if add_gan:
                loss = loss + w_gan * gen_err
                aux_metrics["gen"] = w_gan * gen_err
            return loss, (d_bs, aux_metrics)

        (_, (d_bs, g_metrics)), head_grads = jax.value_and_grad(
            head_loss, argnums=(0, 1, 2), has_aux=True)(big_out, big_mu,
                                                        big_lv)
        (g_grads,) = gvjp(head_grads)
        gen_state = apply_grads(gen_state, gen_tx,
                                reduce_grads(g_grads), gen_bs)
        # the reference's D also sees the G-step forward in train mode
        dis_state = dis_state.replace(batch_stats=d_bs)
        metrics.update(g_metrics)
        return gen_state, dis_state, metrics

    def step_body(gen_state: NetState, dis_state: NetState, batch, rng,
                  train_d: bool, add_gan: bool):
        in_text = batch["in_text"]
        in_audio = decode_audio(batch["in_audio"])
        target = batch["target_vec"]
        vids = batch.get("vid_indices")

        pre_seq = build_pre_seq(target, n_pre)
        metrics = {}
        r = jax.random.split(rng, 6)

        gen_bs = gen_state.batch_stats

        # ---- D step (reference train_gan.py:27-43) ----
        if train_d:
            (fake, *_), gen_bs = gen_fwd(gen_state.params, gen_bs, pre_seq,
                                         in_text, in_audio, vids, r[0])
            fake = jax.lax.stop_gradient(fake)
            target_d, fake_d = d_inputs(target, fake,
                                        jax.random.fold_in(r[1], 777))

            def d_loss_fn(d_params):
                d_real, bs1 = dis_fwd(d_params, dis_state.batch_stats,
                                      target_d, in_text, r[1])
                d_fake, bs2 = dis_fwd(d_params, bs1, fake_d, in_text, r[2])
                loss = -jnp.mean(log_d(d_real)
                                 + log_1md(d_fake))
                return loss, bs2

            (d_loss, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dis_state.params)
            dis_state = apply_grads(dis_state, dis_tx,
                                    reduce_grads(d_grads), d_bs)
            metrics["dis"] = d_loss

        # ---- G step (reference train_gan.py:47-92) ----
        def g_loss_fn(g_params):
            (out, z, z_mu, z_logvar), g_bs = gen_fwd(
                g_params, gen_bs, pre_seq, in_text, in_audio, vids, r[3])
            huber = smooth_l1(out, target, beta=0.1)
            d_out, d_bs = dis_fwd(dis_state.params, dis_state.batch_stats,
                                  out, in_text, r[4])
            gen_err = -jnp.mean(log_d(d_out))

            aux_metrics = {"loss": w_rg * huber}
            loss = w_rg * huber

            if z_type in ("speaker", "random") and w_reg > 0.0:
                if z_type == "speaker":
                    # the shard_map path precomputes a GLOBAL permutation
                    # (reference permutes the full batch before scatter)
                    rand_vids = batch.get("rand_vids")
                    if rand_vids is None:
                        rand_vids = jax.random.permutation(r[5], vids)
                else:
                    rand_vids = None
                (out_rand, z_rand, *_), g_bs = gen_fwd(
                    g_params, g_bs, pre_seq, in_text, in_audio, rand_vids,
                    jax.random.fold_in(r[5], 1))
                out_rand = jax.lax.stop_gradient(out_rand)
                z_rand = jax.lax.stop_gradient(z_rand)

                pose_l1 = smooth_l1_none(out, out_rand, beta=0.05)
                pose_l1 = pose_l1.sum(axis=1).sum(axis=1)
                pose_l1 = pose_l1.reshape(pose_l1.shape[0], -1).mean(axis=1)
                z_l1 = jnp.abs(jax.lax.stop_gradient(z) - z_rand)
                z_l1 = z_l1.reshape(z_l1.shape[0], -1).mean(axis=1)
                div_reg = -(pose_l1 / (z_l1 + 1.0e-5))
                div_reg = jnp.clip(div_reg, -1000.0, None).mean()
                aux_metrics["DIV_REG"] = w_reg * div_reg

                if z_type == "speaker":
                    kld = -0.5 * jnp.mean(1 + z_logvar - z_mu ** 2
                                          - jnp.exp(z_logvar))
                    aux_metrics["KLD"] = w_kld * kld
                    loss = loss + w_kld * kld + w_reg * div_reg
                else:
                    loss = loss + w_reg * div_reg

            if add_gan:
                loss = loss + w_gan * gen_err
                aux_metrics["gen"] = w_gan * gen_err
            return loss, (g_bs, d_bs, aux_metrics)

        (_, (g_bs, d_bs, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_state.params)
        gen_state = apply_grads(gen_state, gen_tx,
                                reduce_grads(g_grads), g_bs)
        # the reference's D also sees the G-step forward in train mode
        dis_state = dis_state.replace(batch_stats=d_bs)

        metrics.update(g_metrics)
        return gen_state, dis_state, metrics

    if getattr(args, "fold_all_forwards", False):
        body = folded_step_body
    elif getattr(args, "fused_gen_forwards", False):
        body = fused_step_body
    else:
        body = step_body
    step = jax.jit(body, static_argnames=("train_d", "add_gan"),
                   donate_argnames=("gen_state", "dis_state"))
    step.body = body
    return step, gen_tx, dis_tx


def make_gan_train_step_shardmap(bundle, args, mesh):
    """Explicit-SPMD variant of the adversarial step via shard_map.

    DataParallel-faithful semantics for the flagship model: BatchNorm
    batch statistics and dropout/noise draws are PER SHARD (like per-GPU
    replicas under torch DataParallel), the diversity regularizer's
    speaker permutation is GLOBAL (the reference permutes the full batch
    before scatter, train_gan.py:62-63), the losses are global batch
    means (gradients pmean-reduced over ICI before both optimizer
    updates), and running BN stats are pmean-synced.  The jit path
    (make_gan_train_step) instead computes global-batch BN statistics.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"
    pmean_tree = lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis), t)
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args,
                                               grad_reduce=pmean_tree)
    body = step.body
    z_type = bundle.generator.z_type

    def shard_body(gen_state, dis_state, batch, rng, train_d, add_gan):
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        gen_state, dis_state, metrics = body(
            gen_state, dis_state, batch, local_rng, train_d, add_gan)
        metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
        gen_state = gen_state.replace(
            batch_stats=pmean_tree(gen_state.batch_stats))
        dis_state = dis_state.replace(
            batch_stats=pmean_tree(dis_state.batch_stats))
        return gen_state, dis_state, metrics

    @partial(jax.jit, static_argnames=("train_d", "add_gan"))
    def sm_step(gen_state, dis_state, batch, rng, train_d, add_gan):
        if z_type == "speaker" and "rand_vids" not in batch:
            # global permutation, computed before sharding into replicas
            batch = dict(batch, rand_vids=jax.random.permutation(
                jax.random.fold_in(rng, 999), batch["vid_indices"]))
        kwargs = dict(mesh=mesh,
                      in_specs=(P(), P(), P(axis), P()),
                      out_specs=(P(), P(), P()))
        body_fn = lambda g, d, b, r: shard_body(g, d, b, r, train_d,
                                                add_gan)
        try:
            # replicated h0/constants mix with sharded activations inside
            # the GRU scans; skip the varying-manual-axes check
            fn = shard_map(body_fn, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(body_fn, check_rep=False, **kwargs)
        return fn(gen_state, dis_state, batch, rng)

    return sm_step, gen_tx, dis_tx


def make_gan_multi_step(bundle, args, n_steps):
    """Fuse n_steps training iterations into ONE compiled program via
    lax.scan over stacked microbatches (leading axis n_steps).

    One host<->device roundtrip then amortizes over n_steps iterations —
    essential when dispatch/transfer latency dominates tiny step times
    (very fast chips, or remote-tunneled devices).  Semantically identical
    to calling the single step n_steps times with rng = fold_in(rng, k).
    """
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
    body = step.body

    @partial(jax.jit, static_argnames=("train_d", "add_gan"),
             donate_argnames=("gen_state", "dis_state"))
    def multi_step(gen_state, dis_state, batches, rng, train_d, add_gan):
        def scan_body(carry, xs):
            g, d = carry
            batch_k, k = xs
            g, d, m = body(g, d, batch_k, jax.random.fold_in(rng, k),
                           train_d, add_gan)
            return (g, d), m

        ks = jnp.arange(n_steps)
        (gen_state, dis_state), metrics = jax.lax.scan(
            scan_body, (gen_state, dis_state),
            (batches, ks))
        return gen_state, dis_state, metrics  # metrics stacked (n_steps,)

    return multi_step, gen_tx, dis_tx


def make_gan_multi_step_shardmap(bundle, args, mesh, n_steps):
    """steps_per_call fusion for the DataParallel-faithful shard_map
    path: a lax.scan over n_steps stacked microbatches runs INSIDE the
    shard_map'd body, so the per-step semantics match calling
    make_gan_train_step_shardmap n_steps times (per-shard BN/dropout,
    pmean'd grads, per-step pmean'd running stats) while one
    host<->device roundtrip amortizes over n_steps iterations — closing
    the gap where the faithful-BN path previously paid full per-step
    dispatch cost (VERDICT r2 item 3).

    Batches are stacked on a leading n_steps axis and sharded on the
    batch axis (in_spec P(None, 'data')), the same layout the jit fused
    path uses; the diversity regularizer's speaker permutations are
    computed GLOBALLY per step before sharding, like sm_step.

    n_steps is taken from the stacked batch shape at trace time (the
    argument is kept for signature compatibility and may be None), so
    the resident path's remainder groups respecialize like the jit
    path."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"
    pmean_tree = lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis), t)
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args,
                                               grad_reduce=pmean_tree)
    body = step.body
    z_type = bundle.generator.z_type

    def shard_body(gen_state, dis_state, batches, rng, train_d, add_gan):
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def scan_body(carry, xs):
            g, d = carry
            batch_k, k = xs
            g, d, m = body(g, d, batch_k,
                           jax.random.fold_in(local_rng, k),
                           train_d, add_gan)
            # per-step running-stat sync, exactly like n_steps separate
            # shard_map step calls
            g = g.replace(batch_stats=pmean_tree(g.batch_stats))
            d = d.replace(batch_stats=pmean_tree(d.batch_stats))
            return (g, d), m

        ks = jnp.arange(jax.tree_util.tree_leaves(batches)[0].shape[0])
        (gen_state, dis_state), metrics = jax.lax.scan(
            scan_body, (gen_state, dis_state), (batches, ks))
        metrics = pmean_tree(metrics)
        return gen_state, dis_state, metrics

    @partial(jax.jit, static_argnames=("train_d", "add_gan"),
             donate_argnames=("gen_state", "dis_state"))
    def multi_step(gen_state, dis_state, batches, rng, train_d, add_gan):
        k_steps = jax.tree_util.tree_leaves(batches)[0].shape[0]
        if z_type == "speaker" and "rand_vids" not in batches:
            # global per-step permutations, computed before sharding
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.fold_in(rng, 999), jnp.arange(k_steps))
            batches = dict(batches, rand_vids=jax.vmap(
                jax.random.permutation)(keys, batches["vid_indices"]))
        kwargs = dict(mesh=mesh,
                      in_specs=(P(), P(), P(None, axis), P()),
                      out_specs=(P(), P(), P()))
        body_fn = lambda g, d, b, r: shard_body(g, d, b, r, train_d,
                                                add_gan)
        try:
            fn = shard_map(body_fn, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(body_fn, check_rep=False, **kwargs)
        return fn(gen_state, dis_state, batches, rng)

    return multi_step, gen_tx, dis_tx


def make_gan_resident_multi_step_shardmap(bundle, args, mesh):
    """--device_resident_data x dp_strategy=shard_map for the flagship
    model (VERDICT r3 item 6): each steps_per_call group runs as TWO
    device programs, exactly like the jit resident path — the mesh-aware
    in-HBM gather (its own program: a scan's large loop-invariant inputs
    would be copied into HBM temps, see make_gan_resident_multi_step),
    then the DataParallel-faithful fused multi-step
    (make_gan_multi_step_shardmap: per-shard BN/dropout, pmean'd grads,
    GLOBAL per-step speaker permutations like the reference's
    pre-scatter permute, train_gan.py:62-63).

    The caller passes the same (K, B) LOCAL-layout index stacks the jit
    resident path builds (train/loops.py: per-device permutations over
    each round-robin residue class, concatenated on the batch axis)."""
    from ..ops import audio as audio_ops
    from .resident import make_gather_stack
    audio_len = audio_ops.calc_audio_length_from_motion_length(
        args.n_poses, args.motion_resampling_framerate)
    gather_stack = make_gather_stack(audio_len, mesh)
    multi, gen_tx, dis_tx = make_gan_multi_step_shardmap(bundle, args,
                                                         mesh, None)

    def resident_multi_step(gen_state, dis_state, data, idx_stack, rng,
                            train_d, add_gan):
        batches = gather_stack(data, jnp.asarray(idx_stack))
        return multi(gen_state, dis_state, batches, rng, train_d=train_d,
                     add_gan=add_gan)

    return resident_multi_step, gen_tx, dis_tx


def make_gan_resident_multi_step(bundle, args, n_steps, mesh=None):
    """Device-resident-data variant of make_gan_multi_step
    (--device_resident_data): the ENTIRE training set lives in HBM as a
    dict of stacked per-sample tensors (audio int16, text int32,
    target_vec f32, vid_indices int32), and each fused call receives only
    an (n_steps, B) int32 index matrix.  Microbatches are gathered
    in-graph (jnp.take fuses into the step), so the host->device traffic
    per call is a few KB of indices instead of ~n_steps*12 MB of batch
    data.

    Motivation (TPU-native + dev-environment): the published TED cache
    at int16 audio is ~11 GB — it FITS in a v5e chip's 16 GB HBM, which
    turns the input pipeline into an in-HBM gather at memory bandwidth.
    On the axon dev tunnel this is also the difference between
    transfer-bound (~15-100 MB/s link, which additionally leaks host RAM
    per transfer) and compute-bound training.

    `data` is NOT donated (it persists across calls); gen/dis states are.
    Semantically identical to the per-batch step on the same indices.

    With a >1-device 'data' mesh (round-robin sharded resident data,
    train/resident.py shard_host_data) the gather is shard_map'd: each
    device receives its (n_steps, B/dp) column block of LOCAL indices
    and gathers rows from its OWN shard, yielding microbatches sharded
    on the batch axis — the resident input path itself scales with the
    mesh, and XLA all-reduces gradients over ICI as usual.
    """
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
    body = step.body

    # The gather lives in its OWN program (not inside the scanned train
    # program, whose large loop-invariant inputs XLA copies into temps)
    # and uses the in-place row-DMA gather of train/resident.py — a
    # jnp.take here allocates an operand-sized HBM temp and OOMs at the
    # published dataset scale (see resident.gather_rows).
    from ..ops import audio as audio_ops
    from .resident import make_gather_stack
    audio_len = audio_ops.calc_audio_length_from_motion_length(
        args.n_poses, args.motion_resampling_framerate)
    gather_stack = make_gather_stack(audio_len, mesh)

    @partial(jax.jit, static_argnames=("train_d", "add_gan"),
             donate_argnames=("gen_state", "dis_state", "batches"))
    def multi_step(gen_state, dis_state, batches, rng, train_d, add_gan):
        def scan_body(carry, xs):
            g, d = carry
            batch_k, k = xs
            g, d, m = body(g, d, batch_k, jax.random.fold_in(rng, k),
                           train_d, add_gan)
            return (g, d), m

        ks = jnp.arange(jax.tree_util.tree_leaves(batches)[0].shape[0])
        (gen_state, dis_state), metrics = jax.lax.scan(
            scan_body, (gen_state, dis_state), (batches, ks))
        return gen_state, dis_state, metrics  # metrics stacked (n_steps,)

    def resident_multi_step(gen_state, dis_state, data, idx_stack, rng,
                            train_d, add_gan):
        batches = gather_stack(data, jnp.asarray(idx_stack))
        return multi_step(gen_state, dis_state, batches, rng,
                          train_d=train_d, add_gan=add_gan)

    return resident_multi_step, gen_tx, dis_tx
