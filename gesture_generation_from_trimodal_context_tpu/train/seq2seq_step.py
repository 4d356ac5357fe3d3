"""Jitted train step for the seq2seq baseline.

Behavioral contract: reference train_eval/train_seq2seq.py:6-51 —
custom loss = loss_regression_weight * MSE
            + loss_kld_weight * continuity (adjacent-frame |diff| sum / numel)
            - loss_reg_weight * motion-variance (sum of per-(batch,dim)
              L2 norms over time / numel),
with global-norm gradient clipping at 5.
"""


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


def make_seq2seq_train_step(bundle, args, grad_reduce=None):
    """grad_reduce: optional tree-map applied to gradients BEFORE the
    clipped-Adam update (the shard_map variant passes a pmean over the
    data axis, so the global-norm clip at 5 sees the reduced gradient —
    like the reference's clip on the aggregated DataParallel grads)."""
    net = bundle.generator
    tx = adam_clipped(args.learning_rate, 5.0)
    reduce_grads = grad_reduce or (lambda g: g)

    def step_body(state: NetState, batch, rng):
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
        state = apply_grads(state, tx, reduce_grads(grads), bs)
        return state, metrics

    step = jax.jit(step_body, donate_argnames=("state",))
    step.body = step_body
    return step, tx


def make_seq2seq_resident_multi_step(bundle, args, mesh=None):
    """--device_resident_data for seq2seq: fused K-step scan over
    (word_seq, word_lengths, target_vec) microbatches gathered in-graph
    from the resident dataset (train/resident.py)."""
    from .resident import make_single_state_resident_multi_step
    step, tx = make_seq2seq_train_step(bundle, args)
    return make_single_state_resident_multi_step(step.body,
                                                 mesh=mesh), tx


def make_seq2seq_multi_step_shardmap(bundle, args, mesh, n_steps):
    """steps_per_call fusion under shard_map for seq2seq (VERDICT r3
    item 4): per-step semantics of make_seq2seq_train_step_shardmap
    (per-shard dropout, pmean'd grads through the global-norm clip),
    one dispatch per n_steps group."""
    from .resident import scan_single_state_shardmap
    pmean_tree = lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, "data"), t)
    step, tx = make_seq2seq_train_step(bundle, args, grad_reduce=pmean_tree)
    return scan_single_state_shardmap(step.body, mesh), tx


def make_seq2seq_resident_multi_step_shardmap(bundle, args, mesh):
    """--device_resident_data x dp_strategy=shard_map for seq2seq
    (VERDICT r3 item 6): per-shard in-HBM gathers feed the faithful
    per-shard step inside one shard_map'd scan."""
    from .resident import make_single_state_resident_multi_step_shardmap
    pmean_tree = lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, "data"), t)
    step, tx = make_seq2seq_train_step(bundle, args, grad_reduce=pmean_tree)
    return make_single_state_resident_multi_step_shardmap(
        step.body, mesh=mesh), tx


def make_seq2seq_train_step_shardmap(bundle, args, mesh):
    """Explicit-SPMD variant via shard_map (DataParallel-faithful,
    matching the reference's DataParallel wrap of every family,
    reference train.py:93-96): per-shard dropout draws, pmean'd
    gradients (every term of custom_loss is a local-numel-normalized
    sum, so equal shards make the shard-mean exact), and the global-norm
    clip applied to the REDUCED gradient."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"
    pmean_tree = lambda t: jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis), t)
    step, tx = make_seq2seq_train_step(bundle, args, grad_reduce=pmean_tree)
    body = step.body

    def shard_body(state, batch, rng):
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        state, metrics = body(state, batch, local_rng)
        metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
        state = state.replace(batch_stats=pmean_tree(state.batch_stats))
        return state, metrics

    kwargs = dict(mesh=mesh, in_specs=(P(), P(axis), P()),
                  out_specs=(P(), P()))
    try:
        fn = shard_map(shard_body, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(shard_body, check_rep=False, **kwargs)
    return jax.jit(fn), tx
