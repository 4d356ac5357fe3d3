"""Pallas GRU kernel vs scan-GRU equivalence (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.ops.recurrent import gru_scan
from gesture_generation_from_trimodal_context_tpu.ops.pallas_gru import pallas_gru


def _params(rng, in_size, h):
    return (jnp.asarray(rng.randn(3 * h, in_size) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(3 * h) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(3 * h, h) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(3 * h) * 0.1, jnp.float32))


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("batch,t,in_size,h", [(4, 7, 5, 8), (2, 34, 108, 16)])
def test_pallas_matches_scan(rng, reverse, batch, t, in_size, h):
    wi, bi, wh, bh = _params(rng, in_size, h)
    x = jnp.asarray(rng.randn(batch, t, in_size), jnp.float32)
    h0 = jnp.asarray(rng.randn(batch, h), jnp.float32)

    ref_out, ref_ht = gru_scan(wi, bi, wh, bh, x, h0, reverse=reverse)
    out, ht = pallas_gru(wi, bi, wh, bh, x, h0, reverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ref_ht), atol=1e-5)


def test_pallas_gradients_match_scan(rng):
    wi, bi, wh, bh = _params(rng, 6, 8)
    x = jnp.asarray(rng.randn(3, 9, 6), jnp.float32)
    h0 = jnp.zeros((3, 8), jnp.float32)

    def loss_scan(p):
        out, _ = gru_scan(p[0], p[1], p[2], p[3], x, h0)
        return jnp.sum(out ** 2)

    def loss_pallas(p):
        out, _ = pallas_gru(p[0], p[1], p[2], p[3], x, h0, False)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_scan)((wi, bi, wh, bh))
    g2 = jax.grad(loss_pallas)((wi, bi, wh, bh))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_bigru_matches_two_scans(rng):
    from gesture_generation_from_trimodal_context_tpu.ops.pallas_gru import (
        pallas_bigru)
    in_size, h, batch, t = 10, 12, 3, 8
    pf = _params(rng, in_size, h)
    pb = _params(rng, in_size, h)
    # reorder to (wi, bi, wh, bh)
    x = jnp.asarray(rng.randn(batch, t, in_size), jnp.float32)
    h0f = jnp.asarray(rng.randn(batch, h), jnp.float32)
    h0b = jnp.asarray(rng.randn(batch, h), jnp.float32)

    out, (htf, htb) = pallas_bigru(pf, pb, x, h0f, h0b)
    ref_f, ref_htf = gru_scan(*pf, x, h0f, reverse=False)
    ref_b, ref_htb = gru_scan(*pb, x, h0b, reverse=True)
    np.testing.assert_allclose(np.asarray(out[..., :h]), np.asarray(ref_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., h:]), np.asarray(ref_b),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(htf), np.asarray(ref_htf),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(htb), np.asarray(ref_htb),
                               atol=1e-5)


def test_gru_module_pallas_impl_matches_scan(rng):
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    from gesture_generation_from_trimodal_context_tpu.ops.recurrent import GRU
    x = jnp.asarray(rng.randn(2, 9, 7), jnp.float32)
    m = GRU(hidden_size=11, num_layers=2, bidirectional=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out_scan, hn_scan = m.apply(v, x)
    recurrent.set_gru_impl("pallas")
    try:
        out_pal, hn_pal = m.apply(v, x)
    finally:
        recurrent.set_gru_impl("scan")
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_pal), np.asarray(hn_scan),
                               atol=1e-5)


def test_fused_bigru_gradients(rng):
    from gesture_generation_from_trimodal_context_tpu.ops.pallas_gru import (
        pallas_bigru)
    pf = _params(rng, 5, 8)
    pb = _params(rng, 5, 8)
    x = jnp.asarray(rng.randn(2, 6, 5), jnp.float32)
    h0 = jnp.zeros((2, 8), jnp.float32)

    def loss_pal(params):
        out, _ = pallas_bigru(params[0], params[1], x, h0, h0)
        return jnp.sum(out ** 2)

    def loss_ref(params):
        of, _ = gru_scan(*params[0], x, h0, reverse=False)
        ob, _ = gru_scan(*params[1], x, h0, reverse=True)
        return jnp.sum(of ** 2) + jnp.sum(ob ** 2)

    g1 = jax.grad(loss_pal)((pf, pb))
    g2 = jax.grad(loss_ref)((pf, pb))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gan_train_step_under_pallas_impl(rng):
    """--use_pallas now applies to training; the custom-VJP backward must
    work inside the full adversarial step."""
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    from gesture_generation_from_trimodal_context_tpu.train import (
        state as state_lib)
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step)
    from tests.test_train_steps import make_batch, tiny_args, tiny_speakers, \
        tiny_vocab

    args = tiny_args()
    bundle = factory.init_model(args, tiny_vocab(), tiny_speakers(), 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 4)
    dvars = factory.discriminator_init_variables(bundle, args, key, 4)
    recurrent.set_gru_impl("pallas")
    try:
        step, gtx, dtx = make_gan_train_step(bundle, args)
        gs = state_lib.make_net_state(gvars, gtx)
        ds = state_lib.make_net_state(dvars, dtx)
        batch = make_batch(rng)
        gs, ds, m = step(gs, ds, batch, jax.random.PRNGKey(1),
                         train_d=True, add_gan=True)
    finally:
        recurrent.set_gru_impl("scan")
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k
