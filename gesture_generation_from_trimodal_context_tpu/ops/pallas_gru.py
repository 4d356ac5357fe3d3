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

STATUS (measured, round 2 — tools/bench_gru.py, hard-synced slope
timing): XLA's while-loop lowering already keeps the carry and weights
VMEM-resident at these sizes, so this kernel is ~parity (0.94-0.97x) at
the published recipe and wins only for the B=1 full bidirectional stack
(1.22x, fewer launches).  It is therefore DEFAULT-OFF and kept as the
B=1 synthesis fast path and a worked Pallas example; the lax.scan path
(ops/recurrent.py) is the production path.  See RESULTS.md.

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
    from .recurrent import is_tpu_backend
    interpret = not is_tpu_backend()

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


# ---------------------------------------------------------------------------
# fused bidirectional layer: both directions in ONE kernel launch
# ---------------------------------------------------------------------------

def _bigru_kernel(xp_ref, wht_ref, bh_ref, h0_ref, out_ref, ht_ref):
    """Grid (2, B/TB): dim 0 = direction (leading singleton block axis).
    Same math as _gru_seq_kernel; the backward direction's inputs arrive
    pre-reversed in time."""
    t_steps = xp_ref.shape[1]
    h_size = h0_ref.shape[-1]

    def step(t, h):
        xt = xp_ref[0, t]
        hp = jnp.dot(h, wht_ref[0], preferred_element_type=jnp.float32)
        hp = hp + bh_ref[0, 0]
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
        out_ref[0, t] = h_new
        return h_new

    ht_ref[0] = jax.lax.fori_loop(0, t_steps, step, h0_ref[0])


def pallas_bigru(params_fwd, params_bwd, x, h0_fwd, h0_bwd):
    """One fused launch for a bidirectional GRU layer.

    params_*: (wi, bi, wh, bh) per direction.  The two input projections
    run as a single concatenated MXU matmul; the recurrent loops of both
    directions execute in one pallas grid (direction x batch-tile).
    Returns (out (B, T, 2H) with [fwd | bwd] features, (hT_fwd, hT_bwd)).

    Gradients fall back to the two-scan reference math via custom VJP.
    """
    return _pallas_bigru(tuple(params_fwd), tuple(params_bwd), x,
                         h0_fwd, h0_bwd)


@jax.custom_vjp
def _pallas_bigru(params_fwd, params_bwd, x, h0_fwd, h0_bwd):
    return _bigru_forward(params_fwd, params_bwd, x, h0_fwd, h0_bwd)


def _bigru_reference(params_fwd, params_bwd, x, h0_fwd, h0_bwd):
    out_f, ht_f = gru_scan(*params_fwd, x, h0_fwd, reverse=False)
    out_b, ht_b = gru_scan(*params_bwd, x, h0_bwd, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1), (ht_f, ht_b)


def _bigru_forward(params_fwd, params_bwd, x, h0_fwd, h0_bwd):
    wi_f, bi_f, wh_f, bh_f = params_fwd
    wi_b, bi_b, wh_b, bh_b = params_bwd
    batch, t_steps, _ = x.shape
    h_size = h0_fwd.shape[-1]
    h_pad = _round_up(h_size, 128)
    b_pad = _round_up(batch, 8)
    g = 3 * h_pad

    # one fused projection for both directions: x @ [Wf | Wb]^T
    wi_all = jnp.concatenate([wi_f, wi_b], axis=0)      # (6H, In)
    bi_all = jnp.concatenate([bi_f, bi_b], axis=0)
    xp_all = jnp.einsum("bti,gi->btg", x, wi_all) + bi_all
    xp_f, xp_b = jnp.split(xp_all, 2, axis=2)

    def prep_xp(xp, reverse):
        xp = jnp.swapaxes(xp, 0, 1)
        if h_pad != h_size:
            xp = _pad_gates(xp, h_size, h_pad, axis=2)
        if b_pad != batch:
            xp = jnp.pad(xp, ((0, 0), (0, b_pad - batch), (0, 0)))
        if reverse:
            xp = jnp.flip(xp, axis=0)
        return xp

    def prep_wh(wh):
        if h_pad != h_size:
            wh = _pad_gates(jnp.pad(wh, ((0, 0), (0, h_pad - h_size))),
                            h_size, h_pad, axis=0)
        return wh.T.astype(jnp.float32)

    def prep_bh(bh):
        return (_pad_gates(bh, h_size, h_pad, axis=0)
                if h_pad != h_size else bh)[None].astype(jnp.float32)

    def prep_h0(h0):
        h0 = jnp.pad(h0, ((0, b_pad - batch), (0, h_pad - h_size)))
        return h0.astype(jnp.float32)

    xp = jnp.stack([prep_xp(xp_f, False), prep_xp(xp_b, True)])
    wht = jnp.stack([prep_wh(wh_f), prep_wh(wh_b)])
    bh2 = jnp.stack([prep_bh(bh_f), prep_bh(bh_b)])
    h0 = jnp.stack([prep_h0(h0_fwd), prep_h0(h0_bwd)])

    tb = _batch_tile(b_pad, t_steps, g, h_pad)
    from .recurrent import is_tpu_backend
    interpret = not is_tpu_backend()

    out, h_t = pl.pallas_call(
        _bigru_kernel,
        grid=(2, b_pad // tb),
        in_specs=[
            pl.BlockSpec((1, t_steps, tb, g), lambda d, i: (d, 0, i, 0)),
            pl.BlockSpec((1, h_pad, g), lambda d, i: (d, 0, 0)),
            pl.BlockSpec((1, 1, g), lambda d, i: (d, 0, 0)),
            pl.BlockSpec((1, tb, h_pad), lambda d, i: (d, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t_steps, tb, h_pad), lambda d, i: (d, 0, i, 0)),
            pl.BlockSpec((1, tb, h_pad), lambda d, i: (d, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, t_steps, b_pad, h_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, b_pad, h_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wht, bh2, h0)

    out_f = jnp.swapaxes(out[0], 0, 1)[:batch, :, :h_size]
    out_b = jnp.swapaxes(jnp.flip(out[1], axis=0), 0, 1)[:batch, :, :h_size]
    full = jnp.concatenate([out_f, out_b], axis=-1)
    return full, (h_t[0, :batch, :h_size], h_t[1, :batch, :h_size])


def _bigru_fwd(params_fwd, params_bwd, x, h0_fwd, h0_bwd):
    out = _bigru_forward(params_fwd, params_bwd, x, h0_fwd, h0_bwd)
    return out, (params_fwd, params_bwd, x, h0_fwd, h0_bwd)


def _bigru_bwd(residuals, grads):
    params_fwd, params_bwd, x, h0_fwd, h0_bwd = residuals
    _, vjp = jax.vjp(_bigru_reference, params_fwd, params_bwd, x,
                     h0_fwd, h0_bwd)
    return vjp(grads)


_pallas_bigru.defvjp(_bigru_fwd, _bigru_bwd)
