"""Fused multi-step training == repeated single steps (exact semantics)."""

import numpy as np
import jax

from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.train import state as state_lib
from gesture_generation_from_trimodal_context_tpu.train.gan import (
    make_gan_multi_step, make_gan_train_step)
from tests.test_train_steps import make_batch, tiny_args, tiny_speakers, tiny_vocab


def test_multi_step_matches_single_steps(rng):
    args = tiny_args()
    bundle = factory.init_model(args, tiny_vocab(), tiny_speakers(), 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 4)
    dvars = factory.discriminator_init_variables(bundle, args, key, 4)

    step, gtx, dtx = make_gan_train_step(bundle, args)
    k_steps = 3
    multi, _, _ = make_gan_multi_step(bundle, args, k_steps)

    batches = [make_batch(rng) for _ in range(k_steps)]
    keys = ("in_text", "in_audio", "target_vec", "vid_indices")
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in keys}

    base_rng = jax.random.PRNGKey(42)

    def fresh(variables, tx):
        host = jax.tree_util.tree_map(np.asarray, variables)
        return state_lib.make_net_state(
            jax.tree_util.tree_map(jax.numpy.asarray, host), tx)

    gs1 = fresh(gvars, gtx)
    ds1 = fresh(dvars, dtx)
    singles = []
    for k in range(k_steps):
        gs1, ds1, m = step(gs1, ds1, {n: batches[k][n] for n in keys},
                           jax.random.fold_in(base_rng, k),
                           train_d=True, add_gan=True)
        singles.append(m)

    gs2 = fresh(gvars, gtx)
    ds2 = fresh(dvars, dtx)
    gs2, ds2, ms = multi(gs2, ds2, stacked, base_rng,
                         train_d=True, add_gan=True)

    for k in range(k_steps):
        for name in singles[k]:
            np.testing.assert_allclose(
                float(singles[k][name]), float(ms[name][k]), rtol=2e-4,
                err_msg="step %d metric %s" % (k, name))
    # scan-fused vs unrolled are different XLA programs; f32 rounding
    # differences get amplified by Adam's per-element rescaling, so param
    # agreement is bounded by ~a few learning-rate quanta (lr=5e-4), not
    # bitwise (the reference itself runs unseeded, README.md:89-90)
    for a, b in zip(jax.tree_util.tree_leaves(gs1.params),
                    jax.tree_util.tree_leaves(gs2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
