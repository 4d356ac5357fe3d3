"""GRU parity tests against torch.nn.GRU (the reference's recurrent core).

torch (CPU) is available in the test environment, so we verify bit-level
gate semantics by copying torch-initialized weights into our scan GRU."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.ops.recurrent import GRU, GRUCell


def _copy_torch_gru_params(tg, params, num_layers, bidirectional):
    p = dict(params)
    num_dir = 2 if bidirectional else 1
    for layer in range(num_layers):
        for d in range(num_dir):
            sfx = "l{}{}".format(layer, "_reverse" if d else "")
            p["weight_ih_" + sfx] = jnp.asarray(
                getattr(tg, "weight_ih_" + sfx).detach().numpy())
            p["weight_hh_" + sfx] = jnp.asarray(
                getattr(tg, "weight_hh_" + sfx).detach().numpy())
            p["bias_ih_" + sfx] = jnp.asarray(
                getattr(tg, "bias_ih_" + sfx).detach().numpy())
            p["bias_hh_" + sfx] = jnp.asarray(
                getattr(tg, "bias_hh_" + sfx).detach().numpy())
    return p


@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (2, False),
                                                      (1, True), (4, True)])
def test_gru_matches_torch(num_layers, bidirectional):
    torch.manual_seed(0)
    in_size, hidden, batch, t = 13, 17, 3, 9
    tg = torch.nn.GRU(in_size, hidden, num_layers=num_layers,
                      batch_first=True, bidirectional=bidirectional)
    x = torch.randn(batch, t, in_size)
    with torch.no_grad():
        t_out, t_hn = tg(x)

    model = GRU(hidden_size=hidden, num_layers=num_layers,
                bidirectional=bidirectional)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
    params = _copy_torch_gru_params(tg, variables["params"], num_layers,
                                    bidirectional)
    out, hn = model.apply({"params": params}, jnp.asarray(x.numpy()))

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hn), t_hn.numpy(), atol=2e-5)


def test_gru_cell_matches_full_gru_stepwise():
    """Stepping GRUCell over time must equal the full scan GRU."""
    in_size, hidden, batch, t, layers = 8, 12, 2, 5, 2
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (batch, t, in_size))

    full = GRU(hidden_size=hidden, num_layers=layers)
    fvars = full.init(jax.random.PRNGKey(2), x)
    out_full, hn_full = full.apply(fvars, x)

    cell = GRUCell(hidden_size=hidden, num_layers=layers)
    cvars = cell.init(jax.random.PRNGKey(3), x[:, 0],
                      jnp.zeros((layers, batch, hidden)))
    # reuse the full GRU's params (same naming minus the direction suffix)
    cparams = {k: v for k, v in fvars["params"].items()}
    h = jnp.zeros((layers, batch, hidden))
    outs = []
    for i in range(t):
        o, h = cell.apply({"params": cparams}, x[:, i], h)
        outs.append(o)
    out_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_step), np.asarray(out_full),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(hn_full), atol=1e-5)


def test_gru_init_distribution():
    """Weights ~ U(-1/sqrt(H), 1/sqrt(H)) like torch."""
    model = GRU(hidden_size=100, num_layers=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 10)))
    w = np.asarray(v["params"]["weight_hh_l0"])
    bound = 0.1
    assert np.abs(w).max() <= bound + 1e-6
    assert w.std() > bound / 3  # roughly uniform, not degenerate


def test_gru_bf16_mode_close_to_fp32():
    """set_rnn_dtype(bf16): same math at bf16 precision — outputs must
    track the fp32 scan within bf16 tolerance and come back as fp32."""
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent

    rng = jax.random.PRNGKey(0)
    x = 0.3 * jax.random.normal(rng, (4, 12, 16))
    model = GRU(hidden_size=24, num_layers=2, bidirectional=True)
    v = model.init(jax.random.PRNGKey(1), x)
    out32, hn32 = model.apply(v, x)

    recurrent.set_rnn_dtype(jnp.bfloat16)
    try:
        out16, hn16 = model.apply(v, x)
    finally:
        recurrent.set_rnn_dtype(None)

    assert out16.dtype == x.dtype
    assert hn16.dtype == x.dtype
    # bf16 has ~3 decimal digits; recurrences accumulate a little
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(hn16), np.asarray(hn32),
                               atol=5e-2)
    # and it must be a real precision change, not a no-op
    assert np.abs(np.asarray(out16) - np.asarray(out32)).max() > 1e-5
