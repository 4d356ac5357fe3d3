"""shard_map explicit-SPMD train step: single-device equivalence with the
jit path and 8-device execution with psum'd gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.parallel import mesh as mesh_lib
from gesture_generation_from_trimodal_context_tpu.train import state as state_lib
from gesture_generation_from_trimodal_context_tpu.train.embed import (
    make_embed_train_step, make_embed_train_step_shardmap)
from tests.test_train_steps import tiny_args


def _setup(batch):
    args = tiny_args(model="gesture_autoencoder", learning_rate=1e-3)
    bundle = factory.init_model(args, None, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), batch)
    target = 0.1 * np.random.RandomState(0).randn(batch, 34, 27)
    return args, bundle, gvars, {"target_vec": jnp.asarray(target,
                                                           jnp.float32)}


def test_shardmap_matches_jit_on_one_device():
    args, bundle, gvars, batch = _setup(4)
    mesh1 = mesh_lib.get_mesh(1)

    jit_step, tx = make_embed_train_step(bundle, args)
    st1 = state_lib.make_net_state(
        jax.tree_util.tree_map(jnp.array, gvars), tx)
    st1, m1 = jit_step(st1, dict(batch), jax.random.PRNGKey(7))

    with mesh1:
        sm_step, tx2 = make_embed_train_step_shardmap(bundle, args, mesh1)
        st2 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), tx2)
        st2, m2 = sm_step(st2, dict(batch), jax.random.PRNGKey(7))

    # on one device the shard IS the global batch: identical math
    # (rng differs only by the axis_index fold; fold_in(rng, 0) != rng, so
    # compare loss magnitudes rather than bitwise)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=0.2)


def test_shardmap_runs_on_eight_devices():
    args, bundle, gvars, batch = _setup(8)
    mesh = mesh_lib.get_mesh(8)
    assert mesh.shape["data"] == 8
    with mesh:
        sm_step, tx = make_embed_train_step_shardmap(bundle, args, mesh)
        st = state_lib.make_net_state(gvars, tx)
        st = mesh_lib.replicate(st, mesh)
        dbatch = mesh_lib.shard_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh)
        p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), st.params)
        losses = []
        for i in range(5):
            st, m = sm_step(st, dbatch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning
    # params changed and remained replicated
    moved = sum(float(jnp.sum((a - jnp.asarray(b)) ** 2))
                for a, b in zip(jax.tree_util.tree_leaves(st.params),
                                jax.tree_util.tree_leaves(p0)))
    assert moved > 0


def test_gan_shardmap_runs_on_eight_devices(rng):
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step_shardmap)
    from tests.test_train_steps import make_batch, tiny_speakers, tiny_vocab

    args = tiny_args()
    bundle = factory.init_model(args, tiny_vocab(), tiny_speakers(), 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 8)
    dvars = factory.discriminator_init_variables(bundle, args, key, 8)
    mesh = mesh_lib.get_mesh(8)
    with mesh:
        step, gtx, dtx = make_gan_train_step_shardmap(bundle, args, mesh)
        gs = state_lib.make_net_state(gvars, gtx)
        ds = state_lib.make_net_state(dvars, dtx)
        gs = mesh_lib.replicate(gs, mesh)
        ds = mesh_lib.replicate(ds, mesh)
        batch = make_batch(rng, b=8)
        dbatch = mesh_lib.shard_batch(
            {k: np.asarray(batch[k]) for k in
             ("in_text", "in_audio", "target_vec", "vid_indices")}, mesh)
        gs, ds, m = step(gs, ds, dbatch, jax.random.PRNGKey(1),
                         train_d=True, add_gan=True)
        gs, ds, m = step(gs, ds, dbatch, jax.random.PRNGKey(2),
                         train_d=True, add_gan=True)
    for k in ("loss", "gen", "dis", "KLD", "DIV_REG"):
        assert np.isfinite(float(m[k])), k
    # params ended replicated across the mesh
    leaf = jax.tree_util.tree_leaves(gs.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_seq2seq_shardmap_dataparallel_semantics():
    """The seq2seq decoder HAS BatchNorm (models/seq2seq.py:139), so the
    DataParallel-faithful property is: the 8-device shard_map loss
    equals the MEAN of the 8 per-shard jit losses (per-shard BN batch
    statistics, like per-GPU DataParallel replicas) — NOT the jit loss
    on the global batch (global-batch BN).  On a 1-device mesh the
    shard IS the global batch, so shard_map must match jit exactly
    (dropout 0 makes the axis-folded rng dead)."""
    from gesture_generation_from_trimodal_context_tpu.train.seq2seq_step import (
        make_seq2seq_train_step, make_seq2seq_train_step_shardmap)
    from tests.test_train_steps import make_batch, tiny_vocab

    args = tiny_args_family("seq2seq")
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 8)
    batch = make_batch(np.random.RandomState(3), b=8)
    jit_step, tx1 = make_seq2seq_train_step(bundle, args)

    # global-batch jit loss (for the 1-device equivalence)
    st1 = state_lib.make_net_state(
        jax.tree_util.tree_map(jnp.array, gvars), tx1)
    st1, m1 = jit_step(st1, dict(batch), jax.random.PRNGKey(7))

    # per-shard losses: 8 single-sample jit steps from the same init
    shard_losses = []
    for i in range(8):
        st = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), tx1)
        sub = {k: v[i:i + 1] for k, v in batch.items()}
        _, m = jit_step(st, sub, jax.random.PRNGKey(7))
        shard_losses.append(float(m["loss"]))

    mesh8 = mesh_lib.get_mesh(8)
    with mesh8:
        sm_step, tx2 = make_seq2seq_train_step_shardmap(bundle, args, mesh8)
        st2 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), tx2)
        st2 = mesh_lib.replicate(st2, mesh8)
        dbatch = mesh_lib.shard_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh8)
        st2, m2 = sm_step(st2, dbatch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m2["loss"]), np.mean(shard_losses),
                               rtol=1e-5)
    assert jax.tree_util.tree_leaves(st2.params)[0].sharding \
        .is_fully_replicated

    # 1-device mesh: shard == global batch -> exact jit equivalence
    mesh1 = mesh_lib.get_mesh(1)
    with mesh1:
        sm1_step, tx3 = make_seq2seq_train_step_shardmap(bundle, args,
                                                         mesh1)
        st3 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), tx3)
        st3, m3 = sm1_step(st3, dict(batch), jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m3["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        st1.params, st3.params)


def tiny_args_family(model):
    from tests.test_train_steps import tiny_args
    if model == "seq2seq":
        return tiny_args(model="seq2seq", hidden_size=32, n_layers=2,
                         dropout_prob=0.0, loss_regression_weight=250.0,
                         loss_kld_weight=0.1, loss_reg_weight=25.0)
    if model == "speech2gesture":
        return tiny_args(model="speech2gesture",
                         loss_regression_weight=100.0,
                         loss_gan_weight=10.0, learning_rate=1e-3)
    raise ValueError(model)


def test_s2g_shardmap_runs_on_eight_devices():
    """speech2gesture (the BN-heaviest family) trains under the
    DataParallel-faithful shard_map step: per-shard BN batch statistics,
    pmean'd grads, replicated outputs."""
    from gesture_generation_from_trimodal_context_tpu.train.s2g import (
        make_s2g_train_step_shardmap)
    from tests.test_train_steps import make_batch

    args = tiny_args_family("speech2gesture")
    bundle = factory.init_model(args, None, None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 8)
    dvars = factory.discriminator_init_variables(bundle, args, key, 8)
    mesh = mesh_lib.get_mesh(8)
    with mesh:
        step, gtx, dtx = make_s2g_train_step_shardmap(bundle, args, mesh)
        gs = state_lib.make_net_state(gvars, gtx)
        ds = state_lib.make_net_state(dvars, dtx)
        gs = mesh_lib.replicate(gs, mesh)
        ds = mesh_lib.replicate(ds, mesh)
        batch = make_batch(np.random.RandomState(5), b=8)
        dbatch = mesh_lib.shard_batch(
            {k: np.asarray(batch[k]) for k in ("in_spec", "target_vec")},
            mesh)
        for i in range(2):
            gs, ds, m = step(gs, ds, dbatch, jax.random.PRNGKey(i))
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k
    assert jax.tree_util.tree_leaves(gs.params)[0].sharding \
        .is_fully_replicated


def test_gan_multi_step_shardmap_matches_single_steps():
    """make_gan_multi_step_shardmap (steps_per_call under shard_map):
    the scanned 2-step fused program must land where 2 single shard_map
    steps land, up to the documented rng-stream difference — verified
    here with z_type='none' and dropout 0 (deterministic forwards), so
    the trajectories must agree to float-reorder tolerance."""
    import copy
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_multi_step_shardmap, make_gan_train_step_shardmap)
    from tests.test_train_steps import make_batch, tiny_vocab, tiny_args

    args = tiny_args(z_type="none", dropout_prob=0.0,
                     fused_gen_forwards=False)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 8)
    dvars = factory.discriminator_init_variables(bundle, args, key, 8)
    mesh = mesh_lib.get_mesh(8)
    K = 2
    rng0 = np.random.RandomState(11)
    host_batches = [make_batch(rng0, b=8) for _ in range(K)]
    root = jax.random.PRNGKey(21)

    with mesh:
        # fused path on stacked (K, B, ...) microbatches
        multi, gtx, dtx = make_gan_multi_step_shardmap(bundle, args, mesh,
                                                       K)
        g1 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), gtx)
        d1 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, dvars), dtx)
        g1 = mesh_lib.replicate(g1, mesh)
        d1 = mesh_lib.replicate(d1, mesh)
        keys = ("in_text", "in_audio", "target_vec")
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        stacked = {k: jax.device_put(
            np.stack([np.asarray(b[k]) for b in host_batches]), sh)
            for k in keys}
        g1, d1, m1 = multi(g1, d1, stacked, root, train_d=True,
                           add_gan=True)

        # K single shard_map steps with the fused path's rng schedule:
        # body rng = fold_in(fold_in(fold_in(root, axis), k)) — the
        # single-step path folds (root -> axis) too, so feed it
        # fold_in(root, ...) appropriately.  The fused body uses
        # fold_in(fold_in(root, axis_index), k); a single sm_step uses
        # fold_in(step_rng, axis_index).  fold_in does not commute, so
        # with deterministic forwards (z none, dropout 0) the rng only
        # feeds dead draws and trajectories must still match.
        single, gtx2, dtx2 = make_gan_train_step_shardmap(bundle, args,
                                                          mesh)
        g2 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, gvars), gtx2)
        d2 = state_lib.make_net_state(
            jax.tree_util.tree_map(jnp.array, dvars), dtx2)
        g2 = mesh_lib.replicate(g2, mesh)
        d2 = mesh_lib.replicate(d2, mesh)
        for k in range(K):
            dbatch = mesh_lib.shard_batch(
                {kk: np.asarray(host_batches[k][kk]) for kk in keys}, mesh)
            g2, d2, mk = single(g2, d2, dbatch, jax.random.fold_in(root, k),
                                train_d=True, add_gan=True)

    for name, t1, t2 in (("gen", g1.params, g2.params),
                         ("dis", d1.params, d2.params),
                         ("gen_bn", g1.batch_stats, g2.batch_stats)):
        jax.tree_util.tree_map(
            lambda a, b, _n=name: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=4e-3, err_msg=_n),
            t1, t2)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)
