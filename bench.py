"""Benchmark: flagship-model training throughput in gesture frames/sec/chip.

Runs the full multimodal_context adversarial train step (D+G in one
compiled program) at the published recipe sizes (batch 128, hidden 300,
4-layer bi-GRU, full audio/text encoders) on whatever accelerator JAX
exposes, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline derivation (BASELINE.md): the reference trains 100 epochs of the
TED cache in ~8 h on one RTX 2080 Ti at batch 128 (reference
README.md:87).  The TED sample cache holds ~150k windows (34 frames
each), giving an estimated 150000*100/28800 ≈ 521 samples/s ≈ 17,700
gesture frames/s on the reference GPU.  vs_baseline = ours / 17700.
"""

import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FRAMES_PER_SEC = 17700.0
N_POSES = 34
# TPU v5e (v5 lite) peak dense bf16 throughput per chip; MFU is reported
# against this (the recurrent matmuls run bf16 by default since round 4,
# so the bf16 peak is the honest denominator).  Override for other parts.
PEAK_FLOPS = float(os.environ.get("GG_PEAK_FLOPS", 197e12))


def _bench_synthesis(args, bundle, gvars, lang, repeats=3):
    """End-to-end generation throughput (VERDICT r4 item 4): fused
    single-clip and batched 8-clip `synthesis/engine` calls, warm, wall
    clock per call (includes host windowing + the one device dispatch +
    finalize — what a user of scripts/synthesize.py experiences)."""
    import jax
    from gesture_generation_from_trimodal_context_tpu.synthesis.engine import (
        generate_gestures, generate_gestures_batch)
    if not getattr(args, "mean_dir_vec", None):
        args.mean_dir_vec = [0.0] * 27
    rs = np.random.RandomState(0)
    dur = 9.0
    audio = (0.1 * rs.randn(int(16000 * dur))).astype(np.float32)
    words, t = [], 0.3
    while t < dur - 0.5:
        words.append(["w%d" % int(t * 10 % 50), t, t + 0.2])
        t += 0.35
    rng = jax.random.PRNGKey(7)

    t0 = time.time()
    out = generate_gestures(args, bundle, gvars, lang, audio, words,
                            vid=3, rng=rng, fused=True)  # warm/compile
    print("synthesis compile+warmup: %.1fs" % (time.time() - t0),
          file=sys.stderr)
    n_frames = int(out.shape[0])
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        generate_gestures(args, bundle, gvars, lang, audio, words,
                          vid=3, rng=rng, fused=True)
        ts.append(time.time() - t0)
    fused_s = float(np.median(ts))

    n_clips = 8
    clips = [dict(audio=audio, words=words, vid=3,
                  rng=jax.random.fold_in(rng, i)) for i in range(n_clips)]
    generate_gestures_batch(args, bundle, gvars, lang, clips)  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        generate_gestures_batch(args, bundle, gvars, lang, clips)
        ts.append(time.time() - t0)
    batch_s = float(np.median(ts))
    print("synthesis: fused %.2f s/clip (%d frames), batched x%d %.2f "
          "clips/s" % (fused_s, n_frames, n_clips, n_clips / batch_s),
          file=sys.stderr)
    return {
        "synth_fused_clip_s": round(fused_s, 3),
        "synth_frames_per_sec": round(n_frames / fused_s, 1),
        "synth_batch8_clips_per_sec": round(n_clips / batch_s, 2),
        "synth_batch8_frames_per_sec": round(n_clips * n_frames / batch_s,
                                             1),
    }


def _wait_for_backend(deadline_s=None):
    """Preflight for transient tunnel outages.

    The axon-tunneled TPU has multi-minute outages (round 3 observed one
    >2 h) during which EVERY dispatch — even a 128x128 matmul — hangs
    indefinitely.  Probe with a tiny matmul in a SUBPROCESS (a hung
    in-process device_get cannot be cancelled) and wait for recovery
    before starting the measurement, so a driver-invoked bench run that
    lands in an outage waits it out instead of hanging or timing
    garbage.  GG_BENCH_PREFLIGHT_S bounds the wait (default 1800 s);
    on expiry we proceed anyway and let the caller's timeout decide."""
    import subprocess
    if deadline_s is None:
        deadline_s = float(os.environ.get("GG_BENCH_PREFLIGHT_S", "1800"))
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); "
             "print(float(jax.device_get(x @ x)[0, 0]))")
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=120,
                           check=True, capture_output=True)
            if attempt > 1:
                print("backend recovered after %.0f s" % (time.time() - t0),
                      file=sys.stderr)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            waited = time.time() - t0
            if waited > deadline_s:
                print("backend probe still failing after %.0f s; "
                      "proceeding anyway" % waited, file=sys.stderr)
                return False
            print("backend probe failed (attempt %d, %.0f s in); waiting "
                  "for the tunnel" % (attempt, waited), file=sys.stderr)
            time.sleep(60)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", default="true",
                    help="'true': fused no-grad generator/discriminator "
                         "forwards; 'all': ALL generator forwards folded "
                         "into one vjp-captured forward; 'false': faithful "
                         "per-forward path (all exact math)")
    ap.add_argument("--use_pallas", default="false",
                    help="Pallas-fused GRU kernels instead of lax.scan")
    # NOTE: no --steps_per_call here — the slope timing below already
    # cancels fixed per-sync dispatch overhead, so fusing K steps per
    # call (train.py's --steps_per_call) would not change the number
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=2,
                    help="lax.scan unroll factor for the recurrent loops "
                         "(2 measured fastest at the published recipe; 4 "
                         "regresses, >=8 crashes the AOT compile helper)")
    ap.add_argument("--rnn_bf16", default="true",
                    help="bfloat16 compute inside the recurrent loops "
                         "(default on since round 4: gradient error "
                         "20-230x below the minibatch noise floor at "
                         "random init and trained checkpoints, matching "
                         "30-epoch FGD trajectories - PRECISION_r04.json "
                         "+ RESULTS.md; 'false' = exact fp32 math)")
    cli = ap.parse_args()
    fused = cli.fused.lower() in ("1", "true", "yes", "all")
    fold_all = cli.fused.lower() == "all"
    use_pallas = cli.use_pallas.lower() in ("1", "true", "yes")

    import jax
    # persistent compilation cache: BENCH_r02 spent 741 s in
    # compile+warmup; caching the serialized executables across bench
    # runs makes warm starts measure steady state, not the compiler
    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache, platforms)
    compile_cache.enable()
    platforms.enable_host_cpu()  # eager init runs locally, not tunneled
    _wait_for_backend()
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.parallel import (
        mesh as mesh_lib)

    batch = cli.batch
    n_chips = len(jax.devices())
    print("devices: %s" % jax.devices(), file=sys.stderr)

    if use_pallas:
        from gesture_generation_from_trimodal_context_tpu.ops.recurrent import (
            set_gru_impl)
        set_gru_impl("pallas")
    if cli.unroll != 1:
        from gesture_generation_from_trimodal_context_tpu.ops.recurrent import (
            set_scan_unroll)
        set_scan_unroll(cli.unroll)
    if cli.rnn_bf16.lower() in ("1", "true", "yes"):
        import jax.numpy as jnp
        from gesture_generation_from_trimodal_context_tpu.ops.recurrent import (
            set_rnn_dtype)
        set_rnn_dtype(jnp.bfloat16)

    args, bundle, lang, spk = ge._flagship(
        hidden_size=300, n_layers=4, n_words=20000, wordembed_dim=300,
        n_speakers=1400)
    args.fused_gen_forwards = fused
    args.fold_all_forwards = fold_all
    key = jax.random.PRNGKey(0)
    # init on the host cpu (one bulk upload via replicate below) instead
    # of eager op-by-op dispatch over the tunnel (utils/platforms.py)
    with platforms.host_init_context():
        init_key = jax.random.PRNGKey(0)
        gvars = factory.generator_init_variables(bundle, args, init_key,
                                                 batch)
        dvars = factory.discriminator_init_variables(bundle, args,
                                                     init_key, batch)
        step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
        gen_state = make_net_state(gvars, gen_tx)
        dis_state = make_net_state(dvars, dis_tx)

    mesh = mesh_lib.get_mesh(-1)
    rs = np.random.RandomState(0)
    host_batch = {
        "in_text": rs.randint(0, 20000, (batch, N_POSES)).astype(np.int32),
        "in_audio": rs.randn(batch, 36267).astype(np.float32),
        "target_vec": (0.1 * rs.randn(batch, N_POSES, 27)).astype(
            np.float32),
        "vid_indices": rs.randint(0, 1400, (batch,)).astype(np.int32),
    }

    with mesh:
        gen_state = mesh_lib.replicate(gen_state, mesh)
        dis_state = mesh_lib.replicate(dis_state, mesh)
        dbatch = mesh_lib.shard_batch(host_batch, mesh)

        # analytic FLOPs for MFU accounting (VERDICT r4 item 4): XLA's
        # HLO cost analysis over the lowered (pre-compile) train-step
        # module, which counts matmuls as 2*M*N*K.  The axon plugin's
        # lowering returns None from cost_analysis (measured round 5),
        # so lower a CPU-targeted copy of the SAME traced program via
        # abstract avals under jax.default_device(cpu) — the HLO (and
        # its flop count) is platform-independent at this level.
        train_flops = None
        try:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (gen_state, dis_state, dbatch, key))
            cpu = platforms.host_cpu_device()
            with jax.default_device(cpu):
                ca = step.lower(*abstract, train_d=True,
                                add_gan=True).cost_analysis()
            train_flops = float(ca["flops"])
        except Exception as e:  # pragma: no cover - backend-specific
            print("cost_analysis unavailable: %r" % e, file=sys.stderr)

        def run(n):
            nonlocal gen_state, dis_state
            for i in range(n):
                gen_state, dis_state, metrics = step(
                    gen_state, dis_state, dbatch,
                    jax.random.fold_in(key, i), train_d=True, add_gan=True)
            # HARD sync: device_get drains the execution queue.  On the
            # axon-tunneled TPU, jax.block_until_ready returns before the
            # remote queue has drained (measured), so timings synced with
            # it reflect dispatch throughput, not compute.  BENCH_r01 was
            # recorded with block_until_ready and is therefore inflated;
            # see RESULTS.md "measurement correction".
            return float(jax.device_get(metrics["loss"]))

        t0 = time.time()
        loss = run(3)  # warmup + compile
        print("compile+warmup: %.1fs" % (time.time() - t0), file=sys.stderr)

        # slope timing: the difference between a 40-step run and a 10-step
        # run cancels the fixed per-sync dispatch+transfer overhead of the
        # tunnel (~30-45 ms) and leaves pure on-device step time
        def timed(n):
            t0 = time.time()
            run(n)
            return time.time() - t0

        run(5)  # steady state
        slopes = []
        for _ in range(5):
            t_small, t_big = timed(10), timed(40)
            slopes.append((t_big - t_small) / 30.0)
        if max(slopes) > 1.5 * min(slopes):
            # pathological window (the axon tunnel has transient
            # multi-minute degradations); sample 5 more and let the
            # median of 10 reject the bad half
            print("slope spread >1.5x; resampling", file=sys.stderr)
            for _ in range(5):
                t_small, t_big = timed(10), timed(40)
                slopes.append((t_big - t_small) / 30.0)
        # median of >=5 (VERDICT r2 item 6): tunnel load adds ~10%
        # run-to-run noise; the median rejects both the LOW-biased
        # slopes (a slow 10-step sample) and the high outliers, and 5
        # samples tighten run-to-run agreement over the previous 3
        dt_step = float(np.median(slopes))
        print("slopes: %s ms" % [round(s * 1e3, 2) for s in slopes],
              file=sys.stderr)

    samples_per_sec = batch / dt_step
    frames_per_sec = samples_per_sec * N_POSES
    frames_per_sec_per_chip = frames_per_sec / max(1, n_chips)
    print("step time: %.2f ms, loss %.3f" % (dt_step * 1000, loss),
          file=sys.stderr)

    record = {
        "metric": "multimodal_context train throughput",
        "value": round(frames_per_sec_per_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec_per_chip
                             / BASELINE_FRAMES_PER_SEC, 3),
        "step_ms": round(dt_step * 1e3, 2),
        "spread_ms": [round(min(slopes) * 1e3, 2),
                      round(max(slopes) * 1e3, 2)],
    }
    if train_flops is not None:
        record["train_gflops_per_step"] = round(train_flops / 1e9, 2)
        record["achieved_tflops"] = round(train_flops / dt_step / 1e12, 3)
        record["mfu_pct"] = round(
            100.0 * train_flops / dt_step / PEAK_FLOPS, 3)

    # generation throughput in the same driver-visible artifact
    # (GG_BENCH_SYNTH=0 skips it; failures degrade to the train-only
    # record rather than killing the bench)
    if os.environ.get("GG_BENCH_SYNTH", "1").lower() not in (
            "0", "false", "no"):
        try:
            record.update(_bench_synthesis(args, bundle, gvars, lang))
        except Exception as e:  # pragma: no cover
            print("synthesis bench failed: %r" % e, file=sys.stderr)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
