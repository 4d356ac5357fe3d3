#!/usr/bin/env python
"""Cross-layer wavefront pipelining: legality analysis + ceiling
measurement for the generator's 4-layer BIDIRECTIONAL GRU stack
(VERDICT r2 'what's weak' #1 / next-round #2).

The proposed diagonal schedule — layer l+1 step t concurrent with layer
l step t+1 — is only legal for UNIdirectional stacks.  The generator's
stack is bidirectional (reference multimodal_context_net.py:223,
nn.GRU(..., bidirectional=True, num_layers=4)), and layer l+1 consumes
the CONCATENATION [fwd_l[t] || bwd_l[t]] at every t:

  - fwd_{l+1}[0]   needs bwd_l[0]   = the LAST step of layer l's
                   backward chain  -> available only after ALL T steps;
  - bwd_{l+1}[T-1] needs fwd_l[T-1] = the last step of the forward
                   chain           -> likewise after all T steps.

So EVERY chain of layer l+1 starts after layer l finishes both chains:
with the two directions already fused into one scan (ops/recurrent.py
gru_bidir_scan), the earliest availability of out_l[t] is scan step
max(t+1, T-t), and the start of any layer-(l+1) chain is bounded below
by T.  The L-layer critical path is exactly L*T fused steps — a
diagonal schedule cannot legally shorten it.  (For unidirectional
stacks the classic (T + L - 1)-step wavefront applies; this model has
none: the only unidirectional GRUs are single-layer, e.g. the seq2seq
decoder cell.)

This tool measures what the diagonal schedule could have bought IF the
dependencies allowed it, by timing a dependency-IGNORING variant that
runs all L*2 chains in ONE scan of T steps with L*2-fold per-step MXU
work (the throughput ceiling of ANY wavefront-style schedule, since it
removes even the (L-1) pipeline-fill steps).  Comparing against the
legal L-sequential-scan stack bounds the foregone speedup; together
with the dependency proof above this closes the roofline question
measurably (same methodology as the fold-all rejection, RESULTS.md).

Usage: python tools/bench_wavefront.py [--t 34] [--h 300] [--layers 4]
       [--batches 128] [--unroll 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_time(fn, x0, n_small=20, n_big=100):
    """Sec/call via chained slope timing with a hard device_get sync
    (bench.py methodology: median of slopes; min reads low under tunnel
    noise)."""
    import jax

    def run(n, x):
        for _ in range(n):
            x = fn(x)
        jax.device_get(x)
        return x

    run(3, x0)  # compile + warm
    slopes = []
    for _ in range(3):
        t0 = time.time(); run(n_small, x0); t_small = time.time() - t0
        t0 = time.time(); run(n_big, x0); t_big = time.time() - t0
        slopes.append((t_big - t_small) / (n_big - n_small))
    return float(np.median(slopes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=34)
    ap.add_argument("--h", type=int, default=300)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batches", type=int, nargs="*", default=[128])
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    from gesture_generation_from_trimodal_context_tpu.ops.recurrent import GRU

    print("devices:", jax.devices(), file=sys.stderr)
    recurrent.set_scan_unroll(args.unroll)
    T, H, L = args.t, args.h, args.layers
    D = 2 * L  # chains: L layers x 2 directions
    rs = np.random.RandomState(0)

    for B in args.batches:
        x = jnp.asarray(0.1 * rs.randn(B, T, H), jnp.float32)

        # ---- legal schedule: the real L-layer bidirectional stack ----
        gru = GRU(hidden_size=H, num_layers=L, bidirectional=True)
        variables = gru.init(jax.random.PRNGKey(0), x)
        head = jnp.asarray(0.1 * rs.randn(2 * H, H), jnp.float32)

        def stack(xin):
            out, _ = gru.apply(variables, xin)
            return out @ head  # (B,T,2H)->(B,T,H) chains the timing loop

        t_stack = slope_time(jax.jit(stack), x)
        print("B=%-4d legal stack (L sequential fused-bidir scans): "
              "%8.3f ms" % (B, t_stack * 1e3), flush=True)

        # ---- dependency-ignoring ceiling: ALL L*2 chains in ONE scan of
        # T steps (each step does D-fold recurrent matmul work).  The
        # inter-layer input projections run up-front on fabricated
        # inputs — same FLOPs as the legal hoisted projections. ----
        wh = jnp.asarray(0.1 * rs.randn(D, 3 * H, H), jnp.float32)
        bh = jnp.zeros((D, 1, 3 * H), jnp.float32)
        wi = jnp.asarray(0.1 * rs.randn(D, 3 * H, H), jnp.float32)
        bi = jnp.zeros((D, 1, 1, 3 * H), jnp.float32)

        def ceiling(xin):
            # hoisted projections for every chain: (D, B, T, 3H)
            xp = jnp.einsum("bti,dgi->dbtg", xin, wi) + bi
            xp = jnp.moveaxis(xp, 2, 0)          # (T, D, B, 3H)
            h0 = jnp.zeros((D, B, H), xin.dtype)

            def step(h, xt):
                hp = jnp.einsum("dbh,dgh->dbg", h, wh) + bh
                xr, xz, xn = (xt[..., :H], xt[..., H:2 * H],
                              xt[..., 2 * H:])
                hr, hz, hn = (hp[..., :H], hp[..., H:2 * H],
                              hp[..., 2 * H:])
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            _, ys = jax.lax.scan(step, h0, xp,
                                 unroll=recurrent._SCAN_UNROLL)
            # (T, D, B, H) -> (B, T, H) reduction to chain the loop
            return jnp.moveaxis(ys.mean(axis=1), 0, 1)

        t_ceiling = slope_time(jax.jit(ceiling), x)
        print("B=%-4d wavefront CEILING (all %d chains, one %d-step "
              "scan): %8.3f ms" % (B, D, T, t_ceiling * 1e3), flush=True)
        print("B=%-4d foregone speedup IF dependencies allowed a perfect "
              "diagonal: %.2fx (illegal for bidirectional stacks — see "
              "module docstring)" % (B, t_stack / t_ceiling), flush=True)


if __name__ == "__main__":
    main()
