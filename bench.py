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


def main():
    import jax
    import __graft_entry__ as ge
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.parallel import (
        mesh as mesh_lib)

    batch = 128
    n_chips = len(jax.devices())
    print("devices: %s" % jax.devices(), file=sys.stderr)

    args, bundle, lang, spk = ge._flagship(
        hidden_size=300, n_layers=4, n_words=20000, wordembed_dim=300,
        n_speakers=1400)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, batch)
    dvars = factory.discriminator_init_variables(bundle, args, key, batch)
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

        def run(n):
            nonlocal gen_state, dis_state
            for i in range(n):
                gen_state, dis_state, metrics = step(
                    gen_state, dis_state, dbatch,
                    jax.random.fold_in(key, i), train_d=True, add_gan=True)
            jax.block_until_ready(metrics)
            return metrics

        t0 = time.time()
        run(3)  # warmup + compile
        print("compile+warmup: %.1fs" % (time.time() - t0), file=sys.stderr)

        n_steps = 20
        t0 = time.time()
        metrics = run(n_steps)
        dt = time.time() - t0

    samples_per_sec = batch * n_steps / dt
    frames_per_sec = samples_per_sec * N_POSES
    frames_per_sec_per_chip = frames_per_sec / max(1, n_chips)
    print("step time: %.2f ms, loss %.3f" % (
        dt / n_steps * 1000, float(metrics["loss"])), file=sys.stderr)

    print(json.dumps({
        "metric": "multimodal_context train throughput",
        "value": round(frames_per_sec_per_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec_per_chip
                             / BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
