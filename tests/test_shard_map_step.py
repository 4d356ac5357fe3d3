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
