#!/usr/bin/env python
"""Honest scan-vs-Pallas GRU timing (slope-timed, hard-synced).

Round-1 numbers for the Pallas kernel were taken with
jax.block_until_ready, which does not drain the axon tunnel's remote
queue (see bench.py); this re-measures with jax.device_get syncs and
slope timing, chaining iterations through a data dependency so they
serialize on device.

Measures, for each (impl, batch) pair:
  - one isolated GRU layer-direction (T=34, H=300) over the sequence
  - the full 4-layer bidirectional generator stack
Usage: python tools/bench_gru.py [--t 34] [--h 300] [--layers 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_time(fn, x0, n_small=100, n_big=500):
    """Time fn chained through its own output; returns sec/call.

    Sub-ms kernels need hundreds of chained iterations per timed run for
    the slope to rise above the axon tunnel's ~30-45 ms sync jitter."""
    import jax

    def run(n, x):
        for _ in range(n):
            x = fn(x)
        jax.device_get(x)  # hard sync (drains the remote queue)
        return x

    run(3, x0)  # compile + warm
    slopes = []
    for _ in range(3):
        t0 = time.time(); run(n_small, x0); t_small = time.time() - t0
        t0 = time.time(); run(n_big, x0); t_big = time.time() - t0
        slopes.append((t_big - t_small) / (n_big - n_small))
    # median, not min: min() reads optimistically low under tunnel noise
    # (same correction bench.py received)
    return float(np.median(slopes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=34)
    ap.add_argument("--h", type=int, default=300)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 128])
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    from gesture_generation_from_trimodal_context_tpu.models import factory

    print("devices:", jax.devices(), file=sys.stderr)
    recurrent.set_scan_unroll(args.unroll)
    T, H, L = args.t, args.h, args.layers
    rs = np.random.RandomState(0)

    for B in args.batches:
        x = jnp.asarray(0.1 * rs.randn(B, T, H), jnp.float32)
        wi = jnp.asarray(0.1 * rs.randn(3 * H, H), jnp.float32)
        bi = jnp.zeros((3 * H,), jnp.float32)
        wh = jnp.asarray(0.1 * rs.randn(3 * H, H), jnp.float32)
        bh = jnp.zeros((3 * H,), jnp.float32)
        h0 = jnp.zeros((B, H), jnp.float32)

        # single layer-direction, output chained back to input
        def layer_factory(impl):
            def f(xin):
                if impl == "scan":
                    out, _ = recurrent.gru_scan(wi, bi, wh, bh, xin, h0)
                else:
                    from gesture_generation_from_trimodal_context_tpu.ops \
                        import pallas_gru
                    out, _ = pallas_gru.pallas_gru(wi, bi, wh, bh, xin, h0)
                return out
            return jax.jit(f)

        # full stacked bi-GRU (the generator's recurrent core)
        from gesture_generation_from_trimodal_context_tpu.ops.recurrent \
            import GRU
        gru = GRU(hidden_size=H, num_layers=L, bidirectional=True,
                  dropout=0.3)
        variables = gru.init(jax.random.PRNGKey(0), x)
        head = jnp.asarray(0.1 * rs.randn(2 * H, H), jnp.float32)

        def stack_factory(impl):
            def f(xin):
                recurrent.set_gru_impl(impl)
                try:
                    out, _ = gru.apply(variables, xin)
                finally:
                    recurrent.set_gru_impl("scan")
                return out @ head  # (B,T,2H)->(B,T,H) to chain
            return jax.jit(f)

        for name, fac, x0 in (("layer", layer_factory, x),
                              ("stack", stack_factory, x)):
            res = {}
            for impl in ("scan", "pallas"):
                dt = slope_time(fac(impl), x0)
                res[impl] = dt
                print("B=%-4d %s %-7s %8.3f ms" % (B, name, impl, dt * 1e3),
                      flush=True)
            print("B=%-4d %s speedup (pallas vs scan): %.2fx"
                  % (B, name, res["scan"] / res["pallas"]), flush=True)


if __name__ == "__main__":
    main()
