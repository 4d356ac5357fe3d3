"""Jitted train step for the seq2seq baseline.

Behavioral contract: reference train_eval/train_seq2seq.py:6-51 —
custom loss = loss_regression_weight * MSE
            + loss_kld_weight * continuity (adjacent-frame |diff| sum / numel)
            - loss_reg_weight * motion-variance (sum of per-(batch,dim)
              L2 norms over time / numel),
with global-norm gradient clipping at 5.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .common import apply_net, split_rngs
from .state import NetState, adam_clipped, apply_grads


def custom_loss(output, target, args):
    n_element = output.size
    mse_loss = jnp.mean((output - target) ** 2) * args.loss_regression_weight
    cont = jnp.sum(jnp.abs(output[:, 1:, :] - output[:, :-1, :]))
    cont_loss = cont / n_element * args.loss_kld_weight
    norm = jnp.linalg.norm(output, ord=2, axis=1)  # over time axis
    var_loss = -jnp.sum(norm) / n_element * args.loss_reg_weight
    return mse_loss + cont_loss + var_loss


def make_seq2seq_train_step(bundle, args):
    net = bundle.generator
    tx = adam_clipped(args.learning_rate, 5.0)

    @partial(jax.jit, donate_argnames=("state",))
    def step(state: NetState, batch, rng):
        in_text = batch["word_seq"]
        lengths = batch["word_lengths"]
        target = batch["target_vec"]

        def loss_fn(params):
            rngs = split_rngs(rng, ("dropout",))
            out, bs = apply_net(net, params, state.batch_stats, in_text,
                                lengths, target, train=True, rngs=rngs)
            loss = custom_loss(out, target, args)
            return loss, (bs, {"loss": loss})

        (_, (bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = apply_grads(state, tx, grads, bs)
        return state, metrics

    return step, tx
