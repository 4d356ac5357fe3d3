"""Pallas-fused GRU sequence kernel (TPU).

The scan-based GRU (ops/recurrent.py) lowers to one XLA while-loop per
layer-direction; each tiny recurrent matmul round-trips HBM for weights
and hidden state.  This kernel instead runs the WHOLE time loop on-core:
the recurrent weights W_hh^T (H x 3H), the hoisted input projections
(T, B, 3H) and the hidden state stay resident in VMEM, and each step is
a single MXU matmul + VPU gate math.  The grid tiles the batch so VMEM
stays under budget.

Gradient support: the op carries a custom VJP whose backward re-runs the
mathematically identical pure-JAX scan under jax.vjp, so training through
this op is exact; the kernel itself is the inference/synthesis fast path
(enable with use_pallas).

Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .recurrent import gru_scan

# VMEM budget per batch tile (bytes); leaves headroom for double buffers
_VMEM_BUDGET = 8 * 1024 * 1024


def _batch_tile(batch, t, g, h):
    per_row = 4 * (t * g + t * h + 2 * h)  # xp + out + h0/hT, f32
    tile = max(1, min(batch, _VMEM_BUDGET // per_row))
    while batch % tile:
        tile -= 1
    return tile


def _gru_seq_kernel(xp_ref, wht_ref, bh_ref, h0_ref, out_ref, ht_ref):
    """One batch tile: scan T steps with weights resident in VMEM.

    xp_ref: (T, TB, 3H); wht_ref: (H, 3H); bh_ref: (1, 3H);
    h0_ref/ht_ref: (TB, H); out_ref: (T, TB, H)."""
    t_steps = xp_ref.shape[0]
    h_size = h0_ref.shape[-1]

    def step(t, h):
        xt = xp_ref[t]
        hp = jnp.dot(h, wht_ref[:], preferred_element_type=jnp.float32)
        hp = hp + bh_ref[0]
        xr = xt[:, :h_size]
        xz = xt[:, h_size:2 * h_size]
        xn = xt[:, 2 * h_size:]
        hr = hp[:, :h_size]
        hz = hp[:, h_size:2 * h_size]
        hn = hp[:, 2 * h_size:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        out_ref[t] = h_new
        return h_new

    ht_ref[:] = jax.lax.fori_loop(0, t_steps, step, h0_ref[:])


def _round_up(v, m):
    return -(-v // m) * m


def _pad_gates(arr, h_size, h_pad, axis):
    """Zero-pad each of the 3 gate blocks along ``axis`` from h to h_pad.

    Lane alignment matters: the Mosaic compiler stalls on 300-wide gate
    boundaries, and zero padding is exact for GRU math (padded hidden
    lanes stay 0: r=z=0.5, n=0 => h' = 0.5*0 + 0.5*0)."""
    parts = jnp.split(arr, 3, axis=axis)
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, h_pad - h_size)
    return jnp.concatenate([jnp.pad(p, pad_widths) for p in parts],
                           axis=axis)


def _pallas_gru_forward(wi, bi, wh, bh, x, h0, reverse):
    batch, t_steps, _ = x.shape
    h_size = h0.shape[-1]

    # pad the hidden dimension to the TPU lane width (exact, see _pad_gates)
    h_pad = _round_up(h_size, 128)
    b_pad = _round_up(batch, 8)
    g = 3 * h_pad

    xp = jnp.einsum("bti,gi->btg", x, wi) + bi     # MXU-friendly hoist
    xp = jnp.swapaxes(xp, 0, 1)                    # (T, B, 3H)
    if h_pad != h_size:
        xp = _pad_gates(xp, h_size, h_pad, axis=2)
        wh = _pad_gates(jnp.pad(wh, ((0, 0), (0, h_pad - h_size))),
                        h_size, h_pad, axis=0)
        bh = _pad_gates(bh, h_size, h_pad, axis=0)
        h0 = jnp.pad(h0, ((0, 0), (0, h_pad - h_size)))
    if b_pad != batch:
        xp = jnp.pad(xp, ((0, 0), (0, b_pad - batch), (0, 0)))
        h0 = jnp.pad(h0, ((0, b_pad - batch), (0, 0)))
    if reverse:
        xp = jnp.flip(xp, axis=0)

    tb = _batch_tile(b_pad, t_steps, g, h_pad)
    grid = (b_pad // tb,)
    interpret = jax.default_backend() != "tpu"

    out, h_t = pl.pallas_call(
        _gru_seq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_steps, tb, g), lambda i: (0, i, 0)),
            pl.BlockSpec((h_pad, g), lambda i: (0, 0)),
            pl.BlockSpec((1, g), lambda i: (0, 0)),
            pl.BlockSpec((tb, h_pad), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_steps, tb, h_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((tb, h_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, b_pad, h_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, h_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wh.T.astype(jnp.float32), bh[None].astype(jnp.float32),
      h0.astype(jnp.float32))

    if reverse:
        out = jnp.flip(out, axis=0)
    out = jnp.swapaxes(out, 0, 1)[:batch, :, :h_size]
    return out, h_t[:batch, :h_size]


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def pallas_gru(wi, bi, wh, bh, x, h0, reverse=False):
    """Drop-in replacement for ops.recurrent.gru_scan (same signature)."""
    return _pallas_gru_forward(wi, bi, wh, bh, x, h0, reverse)


def _fwd(wi, bi, wh, bh, x, h0, reverse):
    out = _pallas_gru_forward(wi, bi, wh, bh, x, h0, reverse)
    return out, (wi, bi, wh, bh, x, h0)


def _bwd(reverse, residuals, grads):
    wi, bi, wh, bh, x, h0 = residuals
    _, vjp = jax.vjp(
        lambda *a: gru_scan(*a, reverse=reverse), wi, bi, wh, bh, x, h0)
    return vjp(grads)


pallas_gru.defvjp(_fwd, _bwd)
