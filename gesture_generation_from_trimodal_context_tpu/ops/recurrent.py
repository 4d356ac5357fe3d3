"""Multi-layer (bi)directional GRU as a TPU-friendly ``lax.scan``.

Design (TPU-first, not a port):
- The input projection ``x @ W_ih^T + b_ih`` for ALL timesteps is hoisted
  out of the recurrence into one large batched matmul (B*T x In x 3H) that
  maps straight onto the MXU.  Only the small recurrent matmul
  ``h @ W_hh^T`` stays inside the scan.
- Bidirectional = forward scan + ``reverse=True`` scan (lax.scan keeps the
  output time-aligned with the input), concatenated on features.
- Gate math matches torch.nn.GRU exactly (gate order r,z,n; the reset gate
  multiplies the *hidden* candidate term W_hn h + b_hn), so checkpoints
  trained here reproduce reference numerics.  Reference usage sites:
  scripts/model/multimodal_context_net.py:98,223, seq2seq_net.py:30,127,
  embedding_net.py:144,227.
- Inter-layer dropout on every layer output except the last (torch
  semantics).

``gru_cell_step`` is shared with the Pallas-fused sequence kernel in
``ops/pallas_gru.py`` (same parameter layout).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import uniform_init

# Which sequence implementation GRU modules use: "scan" (lax.scan, default)
# or "pallas" (the fused on-core kernel in ops/pallas_gru.py — fastest for
# inference/synthesis).  Resolved at trace time: set it BEFORE building a
# jitted function (jit caches do not observe later changes).
_GRU_IMPL = "scan"

# lax.scan unroll factor for the recurrent loops.  Unrolling trades
# compile time for removing per-iteration while-loop overhead (the
# recurrence itself stays sequential).  Resolved at trace time.
_SCAN_UNROLL = 1

# Compute dtype INSIDE the recurrent loops (None = input dtype, i.e.
# fp32).  "bfloat16" halves the per-step VMEM/HBM traffic and VPU gate
# math; carries, gates, and the recurrent matmul run in bf16 with the
# scan outputs cast back to the input dtype.  DOCUMENTED DEVIATION from
# the reference's fp32 (flag --rnn_bf16); parameters and optimizer state
# stay fp32.  Resolved at trace time.
_RNN_DTYPE = None


def set_gru_impl(name):
    global _GRU_IMPL
    if name not in ("scan", "pallas"):
        raise ValueError(name)
    _GRU_IMPL = name


def is_tpu_backend():
    """THE TPU-detection predicate: shared by the pallas kernel's
    interpret-mode fallback (ops/pallas_gru.py) and the synthesis
    engine's kernel auto-selection so the two can never disagree (a
    backend judged TPU here compiles Mosaic, anything else interprets).
    The tunneled dev platform also reports 'tpu' (measured)."""
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def set_scan_unroll(n):
    global _SCAN_UNROLL
    _SCAN_UNROLL = max(1, int(n))


def set_rnn_dtype(dtype):
    """dtype: None (input dtype) or a jnp dtype like jnp.bfloat16."""
    global _RNN_DTYPE
    _RNN_DTYPE = jnp.dtype(dtype) if dtype is not None else None


def run_gru_direction(wi, bi, wh, bh, x, h0, reverse=False):
    if _GRU_IMPL == "pallas":
        from .pallas_gru import pallas_gru
        return pallas_gru(wi, bi, wh, bh, x, h0, reverse)
    return gru_scan(wi, bi, wh, bh, x, h0, reverse=reverse)


def gru_scan(wi, bi, wh, bh, x, h0, reverse=False):
    """Run one GRU direction over a full sequence.

    Args:
      wi: (3H, In) input-to-hidden weights (torch layout, gate order r,z,n).
      bi: (3H,) input bias.
      wh: (3H, H) hidden-to-hidden weights.
      bh: (3H,) hidden bias.
      x: (B, T, In) inputs.
      h0: (B, H) initial hidden state.
      reverse: process the sequence back-to-front (outputs stay aligned).

    Returns: (outputs (B, T, H), final hidden (B, H))
    """
    h_size = h0.shape[-1]
    out_dtype = x.dtype
    # Hoisted input projection: one MXU-friendly matmul for all timesteps.
    xp = jnp.einsum("bti,gi->btg", x, wi) + bi  # (B, T, 3H)
    xp = jnp.swapaxes(xp, 0, 1)                 # (T, B, 3H)
    if _RNN_DTYPE is not None:
        xp = xp.astype(_RNN_DTYPE)
        wh = wh.astype(_RNN_DTYPE)
        bh = bh.astype(_RNN_DTYPE)
        h0 = h0.astype(_RNN_DTYPE)

    def step(h, xt):
        hp = h @ wh.T + bh
        xr, xz, xn = (xt[..., :h_size], xt[..., h_size:2 * h_size],
                      xt[..., 2 * h_size:])
        hr, hz, hn = (hp[..., :h_size], hp[..., h_size:2 * h_size],
                      hp[..., 2 * h_size:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, xp, reverse=reverse,
                              unroll=_SCAN_UNROLL)
    return (jnp.swapaxes(ys, 0, 1).astype(out_dtype),
            h_last.astype(out_dtype))


def gru_bidir_scan(params_f, params_b, x, h0_f, h0_b):
    """Both directions of one bidirectional GRU layer in a SINGLE
    lax.scan (exact math, not an approximation).

    The two directions are independent recurrences, so step t of the
    forward chain and step T-1-t of the backward chain can execute in the
    same scan iteration: the hidden states are stacked on the batch axis
    and the per-step recurrent matmul becomes (2B, H) @ (H, 3H) — twice
    the MXU work per step and HALF the number of sequential scan chains
    versus running two scans (the chains of separate scans serialize in
    program order).  Weight matrices differ per direction, so the matmul
    is block-batched via einsum over a leading direction axis.

    Returns (out (B, T, 2H) [fwd||bwd, torch concat order], (hT_f, hT_b)).
    """
    wi_f, bi_f, wh_f, bh_f = params_f
    wi_b, bi_b, wh_b, bh_b = params_b
    h_size = h0_f.shape[-1]
    out_dtype = x.dtype

    # hoisted input projections (big MXU matmuls, outside the recurrence)
    xp_f = jnp.einsum("bti,gi->btg", x, wi_f) + bi_f    # (B, T, 3H)
    xp_b = jnp.einsum("bti,gi->btg", x, wi_b) + bi_b
    xp_f = jnp.swapaxes(xp_f, 0, 1)                     # (T, B, 3H)
    xp_b = jnp.swapaxes(xp_b, 0, 1)[::-1]               # reversed time
    xp = jnp.stack([xp_f, xp_b], axis=1)                # (T, 2, B, 3H)

    wh = jnp.stack([wh_f, wh_b])                        # (2, 3H, H)
    bh = jnp.stack([bh_f, bh_b])                        # (2, 3H)
    h0 = jnp.stack([h0_f, h0_b])                        # (2, B, H)
    if _RNN_DTYPE is not None:
        xp, wh, bh, h0 = (a.astype(_RNN_DTYPE) for a in (xp, wh, bh, h0))

    def step(h, xt):
        # h: (2, B, H); xt: (2, B, 3H)
        hp = jnp.einsum("dbh,dgh->dbg", h, wh) + bh[:, None, :]
        xr, xz, xn = (xt[..., :h_size], xt[..., h_size:2 * h_size],
                      xt[..., 2 * h_size:])
        hr, hz, hn = (hp[..., :h_size], hp[..., h_size:2 * h_size],
                      hp[..., 2 * h_size:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, xp,
                              unroll=_SCAN_UNROLL)    # ys: (T, 2, B, H)
    ys = ys.astype(out_dtype)
    h_last = h_last.astype(out_dtype)
    out_f = jnp.swapaxes(ys[:, 0], 0, 1)                # (B, T, H)
    out_b = jnp.swapaxes(ys[::-1, 1], 0, 1)             # re-reverse
    return jnp.concatenate([out_f, out_b], -1), (h_last[0], h_last[1])


class GRU(nn.Module):
    """Stacked (bi)directional GRU, torch.nn.GRU-compatible semantics.

    Returns (outputs (B, T, D*H), h_n (L*D, B, H)) with batch_first layout.
    """
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, h0: Optional[jax.Array] = None,
                 deterministic: bool = True):
        batch, _, _ = x.shape
        h = self.hidden_size
        num_dir = 2 if self.bidirectional else 1
        bound_init = uniform_init(float(h) ** -0.5)

        if h0 is None:
            h0 = jnp.zeros((self.num_layers * num_dir, batch, h), x.dtype)

        layer_in = x
        h_finals = []
        for layer in range(self.num_layers):
            in_size = layer_in.shape[-1]
            dir_params = []
            for d in range(num_dir):
                sfx = "l{}{}".format(layer, "_reverse" if d else "")
                dir_params.append(tuple(
                    self.param(name + sfx, bound_init, shape)
                    for name, shape in (
                        ("weight_ih_", (3 * h, in_size)),
                        ("bias_ih_", (3 * h,)),
                        ("weight_hh_", (3 * h, h)),
                        ("bias_hh_", (3 * h,)))))
            if num_dir == 2 and _GRU_IMPL == "pallas":
                # both directions in ONE fused kernel launch
                from .pallas_gru import pallas_bigru
                layer_in, (ht_f, ht_b) = pallas_bigru(
                    dir_params[0], dir_params[1], layer_in,
                    h0[layer * 2], h0[layer * 2 + 1])
                h_finals.extend([ht_f, ht_b])
            elif num_dir == 2:
                # both directions in ONE scan (half the sequential chains)
                layer_in, (ht_f, ht_b) = gru_bidir_scan(
                    dir_params[0], dir_params[1], layer_in,
                    h0[layer * 2], h0[layer * 2 + 1])
                h_finals.extend([ht_f, ht_b])
            else:
                outs = []
                for d in range(num_dir):
                    wi, bi, wh, bh = dir_params[d]
                    out, h_fin = run_gru_direction(
                        wi, bi, wh, bh, layer_in, h0[layer * num_dir + d],
                        reverse=bool(d))
                    outs.append(out)
                    h_finals.append(h_fin)
                layer_in = outs[0] if num_dir == 1 else \
                    jnp.concatenate(outs, -1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                layer_in = nn.Dropout(rate=self.dropout)(
                    layer_in, deterministic=deterministic)

        return layer_in, jnp.stack(h_finals)


class GRUCell(nn.Module):
    """Single-step GRU cell (used by the seq2seq attention decoder loop).

    Parameter layout matches GRU (one layer, one direction)."""
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, h0, deterministic: bool = True):
        """x: (B, In); h0: (L, B, H) -> (output (B, H), h_n (L, B, H))."""
        h = self.hidden_size
        bound_init = uniform_init(float(h) ** -0.5)
        layer_in = x
        new_h = []
        for layer in range(self.num_layers):
            in_size = layer_in.shape[-1]
            sfx = "l{}".format(layer)
            wi = self.param("weight_ih_" + sfx, bound_init, (3 * h, in_size))
            wh = self.param("weight_hh_" + sfx, bound_init, (3 * h, h))
            bi = self.param("bias_ih_" + sfx, bound_init, (3 * h,))
            bh = self.param("bias_hh_" + sfx, bound_init, (3 * h,))
            out, h_fin = gru_scan(wi, bi, wh, bh, layer_in[:, None, :],
                                  h0[layer])
            layer_in = out[:, 0, :]
            new_h.append(h_fin)
            if self.dropout > 0 and layer < self.num_layers - 1:
                layer_in = nn.Dropout(rate=self.dropout)(
                    layer_in, deterministic=deterministic)
        return layer_in, jnp.stack(new_h)
