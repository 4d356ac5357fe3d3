"""Jitted LSGAN train step for the speech2gesture baseline.

Behavioral contract: reference train_eval/train_speech2gesture.py:5-37 —
D: MSE on motion differences (real->1, fake->0); G: L1 * 100 + GAN * 10.
Both updates in one compiled program, D first.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .common import apply_net, split_rngs
from .state import NetState, adam, apply_grads


def make_s2g_train_step(bundle, args):
    gen, dis = bundle.generator, bundle.discriminator
    gen_tx = adam(args.learning_rate)
    dis_tx = adam(args.learning_rate * args.discriminator_lr_weight)
    n_pre = args.n_pre_poses
    w_rg = args.loss_regression_weight
    w_gan = args.loss_gan_weight

    @partial(jax.jit, donate_argnames=("gen_state", "dis_state"))
    def step(gen_state: NetState, dis_state: NetState, batch, rng):
        in_spec = batch["in_spec"]
        target = batch["target_vec"]
        pre_poses = target[:, 0:n_pre]
        r = jax.random.split(rng, 3)

        # generation (shared by both updates, reference s2g.py:8-13)
        (out_poses), gen_bs = apply_net(
            gen, gen_state.params, gen_state.batch_stats, in_spec, pre_poses,
            train=True, rngs=split_rngs(r[0], ("dropout",)))
        target_motion = target[:, 1:] - target[:, :-1]
        out_motion = out_poses[:, 1:] - out_poses[:, :-1]

        # ---- D step ----
        def d_loss_fn(d_params):
            # discriminator consumes diffs internally; feed raw sequences
            d_real, bs1 = apply_net(dis, d_params, dis_state.batch_stats,
                                    target, train=True)
            d_fake, bs2 = apply_net(dis, d_params, bs1,
                                    jax.lax.stop_gradient(out_poses),
                                    train=True)
            loss = (jnp.mean((1.0 - d_real) ** 2)
                    + jnp.mean((0.0 - d_fake) ** 2))
            return loss, bs2

        (d_loss, d_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(dis_state.params)
        dis_state = apply_grads(dis_state, dis_tx, d_grads, d_bs)

        # ---- G step ----
        # The reference reuses the single generator forward above for the
        # G loss (s2g.py:9,28-29).  Re-running with the SAME rng and the
        # SAME input batch_stats reproduces it bitwise (train-mode BN uses
        # batch statistics, not running stats), now under value_and_grad.
        def g_loss_fn(g_params):
            (out2), g_bs = apply_net(
                gen, g_params, gen_state.batch_stats, in_spec, pre_poses,
                train=True, rngs=split_rngs(r[0], ("dropout",)))
            l1 = jnp.mean(jnp.abs(out2 - target))
            d_out, d_bs2 = apply_net(dis, dis_state.params,
                                     dis_state.batch_stats, out2, train=True)
            gen_err = jnp.mean((1.0 - d_out) ** 2)
            loss = w_rg * l1 + w_gan * gen_err
            return loss, (g_bs, d_bs2, {"loss": w_rg * l1,
                                        "gen": w_gan * gen_err,
                                        "dis": d_loss})

        (_, (g_bs2, d_bs2, metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_state.params)
        gen_state = apply_grads(gen_state, gen_tx, g_grads, g_bs2)
        dis_state = dis_state.replace(batch_stats=d_bs2)
        return gen_state, dis_state, metrics

    return step, gen_tx, dis_tx
