"""Training state containers and optimizers.

The reference uses Adam(betas=(0.5, 0.999)) for every model, with the
discriminator at lr * discriminator_lr_weight
(reference scripts/train.py:104-109)."""

from typing import Any

import jax
import optax
from flax import struct


def adam(learning_rate):
    """Adam with the reference's GAN betas (train.py:104-109)."""
    return optax.adam(learning_rate, b1=0.5, b2=0.999)


def adam_clipped(learning_rate, max_norm):
    """Adam + global-norm gradient clipping (seq2seq uses clip 5,
    reference train_eval/train_seq2seq.py:48)."""
    return optax.chain(optax.clip_by_global_norm(max_norm),
                       adam(learning_rate))


@struct.dataclass
class NetState:
    """One network's training state (a pytree usable inside jit)."""
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_net_state(variables, tx):
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return NetState(params=params, batch_stats=batch_stats,
                    opt_state=tx.init(params),
                    step=jax.numpy.zeros((), jax.numpy.int32))


def apply_grads(state: NetState, tx, grads, new_batch_stats=None) -> NetState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        params=new_params, opt_state=new_opt,
        batch_stats=(state.batch_stats if new_batch_stats is None
                     else new_batch_stats),
        step=state.step + 1)
