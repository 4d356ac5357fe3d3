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
