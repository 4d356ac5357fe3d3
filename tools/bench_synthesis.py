#!/usr/bin/env python
"""Honest synthesis window-forward latency (slope-timed, hard-synced).

Measures the full flagship generator forward for ONE 34-frame synthesis
window (batch 1: WavEncoder convs over 36,267 samples + TCN over 34
tokens + 4-layer bi-GRU + head), chained through a data dependency, for
the scan and Pallas GRU implementations.  Replaces the round-1 numbers
taken with jax.block_until_ready (which does not drain the axon tunnel's
remote queue — see RESULTS.md "measurement correction").

Usage: python tools/bench_synthesis.py [--impls scan pallas]
"""

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_chain(duration_s=9.0, repeats=3):
    """End-to-end generate_gestures wall per clip: fused one-dispatch
    scan vs the per-window host loop (both warm; the first call of each
    path pays the compile / axon remote-load and is discarded)."""
    import jax
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.synthesis.engine \
        import generate_gestures

    args, bundle, lang, spk = ge._flagship(
        hidden_size=300, n_layers=4, n_words=20000, wordembed_dim=300,
        n_speakers=1400)
    args.mean_dir_vec = [0.0] * 27  # engine derives pose_dim from it
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 1)
    rs = np.random.RandomState(0)
    audio = (0.1 * rs.randn(int(16000 * duration_s))).astype(np.float32)
    words, t = [], 0.3
    while t < duration_s - 0.5:
        words.append(["w%d" % int(t * 10 % 50), t, t + 0.2])
        t += 0.35
    rng = jax.random.PRNGKey(7)

    out = {}
    for fused in (True, False):
        name = "fused" if fused else "per-window"
        generate_gestures(args, bundle, gvars, lang, audio, words, vid=3,
                          rng=rng, fused=fused)  # warm/compile
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            generate_gestures(args, bundle, gvars, lang, audio, words,
                              vid=3, rng=rng, fused=fused)
            ts.append(time.time() - t0)
        out[name] = float(np.median(ts))
        print("clip generation (%4.1f s clip) %-10s %6.2f s/clip"
              % (duration_s, name, out[name]), flush=True)
    print("fused speedup: %.2fx" % (out["per-window"] / out["fused"]))


def bench_batch(duration_s=9.0, n_clips=8, repeats=3):
    """Test-set-scale generation throughput: N clips through ONE
    batched fused scan (generate_gestures_batch) vs N sequential fused
    single-clip calls.  Both warm; clips/s is the figure of merit."""
    import jax
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.synthesis.engine \
        import generate_gestures, generate_gestures_batch

    args, bundle, lang, spk = ge._flagship(
        hidden_size=300, n_layers=4, n_words=20000, wordembed_dim=300,
        n_speakers=1400)
    args.mean_dir_vec = [0.0] * 27
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 1)
    rs = np.random.RandomState(0)
    clips = []
    for c in range(n_clips):
        audio = (0.1 * rs.randn(int(16000 * duration_s))).astype(np.float32)
        words, t = [], 0.3
        while t < duration_s - 0.5:
            words.append(["w%d" % int(t * 10 % 50), t, t + 0.2])
            t += 0.35
        clips.append(dict(audio=audio, words=words, vid=(c % 5),
                          rng=jax.random.PRNGKey(100 + c)))

    def run_seq():
        return [generate_gestures(args, bundle, gvars, lang, c["audio"],
                                  c["words"], vid=c["vid"], rng=c["rng"],
                                  fused=True) for c in clips]

    def run_batch():
        return generate_gestures_batch(args, bundle, gvars, lang, clips)

    out = {}
    for name, fn in (("sequential", run_seq), ("batched", run_batch)):
        fn()  # warm/compile
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        out[name] = dt
        print("%d clips (%4.1f s each) %-10s %6.2f s  (%.2f clips/s)"
              % (n_clips, duration_s, name, dt, n_clips / dt), flush=True)
    print("batch speedup: %.2fx" % (out["sequential"] / out["batched"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", nargs="*", default=["scan", "pallas"])
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--chain", action="store_true",
                    help="bench end-to-end clip generation fused vs "
                         "per-window instead of one window forward")
    ap.add_argument("--batch", type=int, default=0, metavar="N",
                    help="bench N-clip batched generation vs N "
                         "sequential fused clips")
    ap.add_argument("--duration", type=float, default=9.0)
    args_cli = ap.parse_args()

    if args_cli.batch:
        bench_batch(args_cli.duration, args_cli.batch)
        return
    if args_cli.chain:
        bench_chain(args_cli.duration)
        return

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.common import (
        build_pre_seq)

    print("devices:", jax.devices(), file=sys.stderr)
    recurrent.set_scan_unroll(args_cli.unroll)

    args, bundle, lang, spk = ge._flagship(
        hidden_size=300, n_layers=4, n_words=20000, wordembed_dim=300,
        n_speakers=1400)
    gen = bundle.generator
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, batch_size=1)
    rs = np.random.RandomState(0)
    in_text = jnp.asarray(rs.randint(0, 20000, (1, 34)), jnp.int32)
    in_audio = jnp.asarray(0.1 * rs.randn(1, 36267), jnp.float32)
    seed = jnp.asarray(0.1 * rs.randn(1, 34, 27), jnp.float32)
    vids = jnp.asarray([3], jnp.int32)

    results = {}
    for impl in args_cli.impls:
        recurrent.set_gru_impl(impl)
        try:
            def window_fwd(prev_out):
                # chain: previous window's output seeds the next (the
                # real synthesis seed chain, synthesis/engine.py)
                pre_seq = build_pre_seq(prev_out, 4)
                out, *_ = gen.apply(gvars, pre_seq, in_text, in_audio,
                                    vids, train=False,
                                    rngs={"noise": key})
                return out
            f = jax.jit(window_fwd)

            def run(n, x):
                for _ in range(n):
                    x = f(x)
                jax.device_get(x)
                return x
            run(3, seed)
            slopes = []
            for _ in range(3):
                t0 = time.time(); run(100, seed); ts = time.time() - t0
                t0 = time.time(); run(500, seed); tb = time.time() - t0
                slopes.append((tb - ts) / 400.0)
            # median, not min: min() reads optimistically low under
            # tunnel noise (same correction bench.py received)
            med = float(np.median(slopes))
            results[impl] = med
            print("window fwd (B=1, full generator) %-7s %7.3f ms"
                  % (impl, med * 1e3), flush=True)
        finally:
            recurrent.set_gru_impl("scan")
    if len(results) == 2:
        print("speedup (pallas vs scan): %.2fx"
              % (results["scan"] / results["pallas"]))
    win_s = 30 / 15.0  # stride frames / fps: real-time seconds per window
    for impl, dt in results.items():
        print("%s: %.0fx real time" % (impl, win_s / dt))


if __name__ == "__main__":
    main()
