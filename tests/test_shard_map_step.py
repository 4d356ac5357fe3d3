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


# ---------------------------------------------------------------------------
# VERDICT r3 item 4: steps_per_call fusion under shard_map for the
# remaining families.  With dropout 0 (and no z noise) the forwards are
# deterministic, so the fused K-step trajectory must land where K single
# shard_map steps land (rng only feeds dead draws).
# ---------------------------------------------------------------------------

def _tree_close(name, t1, t2, atol=4e-3):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, err_msg=name), t1, t2)


def _replicated_state(vars_, tx, mesh):
    return mesh_lib.replicate(state_lib.make_net_state(
        jax.tree_util.tree_map(jnp.array, vars_), tx), mesh)


def test_joint_embedding_shardmap_runs_with_text_audio():
    """Regression: the target-only shard_map variant crashed
    joint_embedding (mode='random' REQUIRES in_text/in_audio for the
    ContextEncoder latent, models/embedding_net.py:249-270)."""
    from tests.test_train_steps import make_batch, tiny_vocab
    args = tiny_args(model="joint_embedding", learning_rate=1e-3)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 8)
    mesh = mesh_lib.get_mesh(8)
    batch = make_batch(np.random.RandomState(0), b=8)
    keys = ("in_text", "in_audio", "target_vec")
    with mesh:
        from gesture_generation_from_trimodal_context_tpu.train.embed import (
            make_embed_train_step_shardmap)
        step, tx = make_embed_train_step_shardmap(bundle, args, mesh,
                                                  mode="random")
        st = _replicated_state(gvars, tx, mesh)
        dbatch = mesh_lib.shard_batch(
            {k: np.asarray(batch[k]) for k in keys}, mesh)
        st, m = step(st, dbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def _multi_vs_single_single_state(model, keys, make_single, make_multi,
                                  mode=None):
    from tests.test_train_steps import make_batch, tiny_vocab
    args = tiny_args(model=model, dropout_prob=0.0, learning_rate=1e-3)
    lang = tiny_vocab() if model != "gesture_autoencoder" else None
    bundle = factory.init_model(args, lang, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 8)
    mesh = mesh_lib.get_mesh(8)
    K = 2
    rng0 = np.random.RandomState(5)
    host_batches = [make_batch(rng0, b=8) for _ in range(K)]
    root = jax.random.PRNGKey(33)
    from jax.sharding import NamedSharding, PartitionSpec

    with mesh:
        multi, tx = make_multi(bundle, args, mesh, K)
        s1 = _replicated_state(gvars, tx, mesh)
        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        stacked = {k: jax.device_put(
            np.stack([np.asarray(b[k]) for b in host_batches]), sh)
            for k in keys}
        s1, m1 = multi(s1, stacked, root)

        single, tx2 = make_single(bundle, args, mesh)
        s2 = _replicated_state(gvars, tx2, mesh)
        for k in range(K):
            dbatch = mesh_lib.shard_batch(
                {kk: np.asarray(host_batches[k][kk]) for kk in keys}, mesh)
            s2, mk = single(s2, dbatch, jax.random.fold_in(root, k))

    _tree_close("params", s1.params, s2.params)
    _tree_close("bn", s1.batch_stats, s2.batch_stats)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)


def test_embed_multi_step_shardmap_matches_single_steps():
    from gesture_generation_from_trimodal_context_tpu.train.embed import (
        make_embed_multi_step_shardmap, make_embed_train_step_shardmap)
    _multi_vs_single_single_state(
        "gesture_autoencoder", ("target_vec",),
        lambda b, a, m: make_embed_train_step_shardmap(b, a, m, mode=None),
        lambda b, a, m, k: make_embed_multi_step_shardmap(b, a, m, k,
                                                          mode=None))


def test_seq2seq_multi_step_shardmap_matches_single_steps():
    from gesture_generation_from_trimodal_context_tpu.train.seq2seq_step import (
        make_seq2seq_multi_step_shardmap, make_seq2seq_train_step_shardmap)
    _multi_vs_single_single_state(
        "seq2seq", ("word_seq", "word_lengths", "target_vec"),
        make_seq2seq_train_step_shardmap, make_seq2seq_multi_step_shardmap)


def test_s2g_multi_step_shardmap_matches_single_steps():
    from tests.test_train_steps import make_batch, tiny_vocab
    from gesture_generation_from_trimodal_context_tpu.train.s2g import (
        make_s2g_multi_step_shardmap, make_s2g_train_step_shardmap)
    args = tiny_args(model="speech2gesture", dropout_prob=0.0,
                     learning_rate=2e-4)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 8)
    dvars = factory.discriminator_init_variables(bundle, args, key, 8)
    mesh = mesh_lib.get_mesh(8)
    K = 2
    rng0 = np.random.RandomState(7)
    host_batches = [make_batch(rng0, b=8) for _ in range(K)]
    keys = ("in_spec", "target_vec")
    root = jax.random.PRNGKey(44)
    from jax.sharding import NamedSharding, PartitionSpec

    with mesh:
        multi, gtx, dtx = make_s2g_multi_step_shardmap(bundle, args, mesh, K)
        g1 = _replicated_state(gvars, gtx, mesh)
        d1 = _replicated_state(dvars, dtx, mesh)
        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        stacked = {k: jax.device_put(
            np.stack([np.asarray(b[k]) for b in host_batches]), sh)
            for k in keys}
        g1, d1, m1 = multi(g1, d1, stacked, root)

        single, gtx2, dtx2 = make_s2g_train_step_shardmap(bundle, args, mesh)
        g2 = _replicated_state(gvars, gtx2, mesh)
        d2 = _replicated_state(dvars, dtx2, mesh)
        for k in range(K):
            dbatch = mesh_lib.shard_batch(
                {kk: np.asarray(host_batches[k][kk]) for kk in keys}, mesh)
            g2, d2, mk = single(g2, d2, dbatch, jax.random.fold_in(root, k))

    _tree_close("gen", g1.params, g2.params)
    _tree_close("dis", d1.params, d2.params)
    _tree_close("gen_bn", g1.batch_stats, g2.batch_stats)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)


# ---------------------------------------------------------------------------
# VERDICT r3 item 6: --device_resident_data x dp_strategy=shard_map.
# The round-robin resident gather feeding the faithful multi-step must
# land exactly where the host-stacked faithful multi-step lands on the
# same sample rows.
# ---------------------------------------------------------------------------

def test_gan_resident_multi_step_shardmap_matches_host_stacked():
    from tests.test_train_steps import make_batch, tiny_vocab
    from gesture_generation_from_trimodal_context_tpu.train import resident
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_multi_step_shardmap, make_gan_resident_multi_step_shardmap)

    args = tiny_args(z_type="none", dropout_prob=0.0,
                     fused_gen_forwards=False)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 8)
    dvars = factory.discriminator_init_variables(bundle, args, key, 8)
    mesh = mesh_lib.get_mesh(8)
    dp, B, K = 8, 8, 2
    N = 24

    rng0 = np.random.RandomState(3)
    big = make_batch(rng0, b=N)
    host = {k: np.asarray(big[k]) for k in ("in_text", "in_audio",
                                            "target_vec")}
    with mesh:
        data, meta = resident.shard_host_data(host, mesh, label="test")
        # local index stacks: column block d = device d's local rows
        bsl = B // dp
        rs = np.random.RandomState(11)
        idx_local = np.stack([
            np.concatenate([rs.randint(0, meta.valid_local[d], bsl)
                            for d in range(dp)])
            for _ in range(K)]).astype(np.int32)

        res_fn, gtx, dtx = make_gan_resident_multi_step_shardmap(
            bundle, args, mesh)
        g1 = _replicated_state(gvars, gtx, mesh)
        d1 = _replicated_state(dvars, dtx, mesh)
        root = jax.random.PRNGKey(9)
        g1, d1, m1 = res_fn(g1, d1, data, idx_local, root, train_d=True,
                            add_gan=True)

        # host-stacked equivalent batches: local row l on device d is
        # global row l*dp + d (round-robin layout)
        glob = np.empty_like(idx_local)
        for d in range(dp):
            cols = slice(d * bsl, (d + 1) * bsl)
            glob[:, cols] = idx_local[:, cols] * dp + d
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        stacked = {k: jax.device_put(v[glob.reshape(-1)].reshape(
            (K, B) + v.shape[1:]), sh) for k, v in host.items()}

        multi, gtx2, dtx2 = make_gan_multi_step_shardmap(bundle, args,
                                                         mesh, K)
        g2 = _replicated_state(gvars, gtx2, mesh)
        d2 = _replicated_state(dvars, dtx2, mesh)
        g2, d2, m2 = multi(g2, d2, stacked, root, train_d=True,
                           add_gan=True)

    _tree_close("gen", g1.params, g2.params, atol=1e-5)
    _tree_close("dis", d1.params, d2.params, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-4)


def test_embed_resident_multi_step_shardmap_runs():
    from tests.test_train_steps import make_batch
    from gesture_generation_from_trimodal_context_tpu.train import resident
    from gesture_generation_from_trimodal_context_tpu.train.embed import (
        make_embed_resident_multi_step_shardmap)

    args = tiny_args(model="gesture_autoencoder", dropout_prob=0.0,
                     learning_rate=1e-3)
    bundle = factory.init_model(args, None, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 8)
    mesh = mesh_lib.get_mesh(8)
    big = make_batch(np.random.RandomState(1), b=16)
    host = {"target_vec": np.asarray(big["target_vec"])}
    with mesh:
        data, meta = resident.shard_host_data(host, mesh, label="test")
        fn, tx = make_embed_resident_multi_step_shardmap(bundle, args, mesh,
                                                         mode=None)
        st = _replicated_state(gvars, tx, mesh)
        idx = np.zeros((2, 8), np.int32)
        idx[1] = 1
        st, m = fn(st, data, idx, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(m["loss"])))
