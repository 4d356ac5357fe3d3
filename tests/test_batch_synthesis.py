"""Batched multi-clip synthesis (`generate_gestures_batch`) must return,
for every clip, exactly what that clip's own single-clip run produces:
same per-clip rng streams (per-lane fold_in under vmap), same seed
chaining, same crossfade/smoothing post-passes — across mixed window
buckets and padded clip lanes."""

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.synthesis.engine import (
    generate_gestures, generate_gestures_batch)

from test_fused_synthesis import _setup, _words


def _clip(duration, seed, vid=None, seed_seq=None, rng_seed=11):
    audio = np.random.RandomState(seed).randn(
        int(16000 * duration)).astype(np.float32)
    return {
        "audio": audio, "words": _words(duration), "vid": vid,
        "seed_seq": seed_seq, "rng": jax.random.PRNGKey(rng_seed),
    }


def _single(args, bundle, gen_vars, lang, clip):
    return generate_gestures(
        args, bundle, gen_vars, lang, clip["audio"], clip["words"],
        vid=clip["vid"], seed_seq=clip["seed_seq"], rng=clip["rng"],
        fused=True)


# vid must be non-falsy where given: vid=0/None draws a RANDOM speaker
# (faithful to reference synthesize.py:71 `if not vid:`), which cannot
# reproduce across the batch run and its single-clip comparison
@pytest.mark.parametrize("yml,vids", [
    ("multimodal_context.yml", (1, 3, 2)),
    ("speech2gesture.yml", (None, None, None)),
])
def test_batch_matches_single(yml, vids):
    """Three clips with DIFFERENT durations: 8 s and 6 s share the
    4-window bucket (6 s pads one window), 12 s lands in the 8-window
    bucket — and the 2-clip group pads no lane while a 1-clip group
    exercises c_pad == 1."""
    args, bundle, gen_vars, lang = _setup(yml)
    seed = 0.25 * np.ones((4, 27), np.float32)
    clips = [
        _clip(8.0, 7, vid=vids[0], rng_seed=11),
        _clip(12.0, 8, vid=vids[1], rng_seed=22),
        _clip(6.0, 9, vid=vids[2], seed_seq=seed, rng_seed=33),
    ]
    outs = generate_gestures_batch(args, bundle, gen_vars, lang, clips)
    assert len(outs) == 3
    for clip, out in zip(clips, outs):
        ref = _single(args, bundle, gen_vars, lang, clip)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
        assert np.isfinite(out).all()


def test_batch_padded_clip_lane():
    """Three same-bucket clips pad the clip axis to 4: the padded lane
    must not leak into any real clip's output."""
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    clips = [_clip(8.0, s, vid=v, rng_seed=40 + s)
             for s, v in ((1, 3), (2, 1), (3, 2))]
    outs = generate_gestures_batch(args, bundle, gen_vars, lang, clips)
    for clip, out in zip(clips, outs):
        ref = _single(args, bundle, gen_vars, lang, clip)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
    # distinct inputs produce distinct outputs (no cross-lane mixing)
    assert not np.allclose(outs[0], outs[1])


def test_batch_seq2seq_smoothing():
    """seq2seq's cubic join smoothing is a host post-pass; it must run
    per clip on the batched outputs too."""
    args, bundle, gen_vars, lang = _setup("seq2seq.yml")
    clips = [_clip(8.0, 7, rng_seed=11), _clip(8.0, 8, rng_seed=12)]
    outs = generate_gestures_batch(args, bundle, gen_vars, lang, clips)
    for clip, out in zip(clips, outs):
        ref = _single(args, bundle, gen_vars, lang, clip)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_batch_single_clip():
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    clip = _clip(8.0, 7, vid=1)
    (out,) = generate_gestures_batch(args, bundle, gen_vars, lang, [clip])
    ref = _single(args, bundle, gen_vars, lang, clip)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_batch_clip_parallel_mesh():
    """Clip-axis data parallelism over the 8-virtual-device mesh: 5
    clips pad to 8 lanes (one per device); every real clip must equal
    its single-device single-clip run.  Mixed buckets exercise the
    per-group padding-to-mesh-multiple path (the 1-clip group pads 1
    -> 8)."""
    from gesture_generation_from_trimodal_context_tpu.parallel import (
        mesh as mesh_lib)
    args, bundle, gen_vars, lang = _setup("multimodal_context.yml")
    mesh = mesh_lib.get_mesh()
    assert mesh_lib.data_parallel_size(mesh) == 8
    clips = [_clip(8.0, s, vid=1 + (s % 3), rng_seed=60 + s)
             for s in range(4)] + [_clip(12.0, 9, vid=2, rng_seed=70)]
    outs = generate_gestures_batch(args, bundle, gen_vars, lang, clips,
                                   mesh=mesh)
    for clip, out in zip(clips, outs):
        ref = _single(args, bundle, gen_vars, lang, clip)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
