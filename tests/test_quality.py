"""Complementary quality metrics (VERDICT r4 item 5).

- ops/quality.beat_alignment_score: in-graph audio-beat ->
  motion-beat agreement; aligned motion must outscore misaligned,
  masking must drop padded rows exactly, and the op must be jittable
  with static shapes.
- models/evaluator.get_diversity: feature-space mean pairwise L2;
  a collapsed (constant) generator scores ~0 while varied output
  scores > 0 — the mode-collapse axis FGD can miss.
- eval-step plumbing: make_eval_body returns beat for audio-carrying
  models and NaN for audio-less ones (skipped by callers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.ops.quality import (
    beat_alignment_score)
from gesture_generation_from_trimodal_context_tpu.models.evaluator import (
    EmbeddingSpaceEvaluator)


FPS_FRAME = 1067  # samples per pose frame (16000 Hz / 15 fps)


def _clicky_audio(beat_frames, t=34, rs=None):
    """Audio whose energy onsets sit exactly at the given pose frames."""
    rs = rs or np.random.RandomState(0)
    audio = 0.01 * rs.randn(t * FPS_FRAME).astype(np.float32)
    for f in beat_frames:
        audio[f * FPS_FRAME:(f * FPS_FRAME) + 200] += 0.8
    return audio


def _motion_with_beats(beat_frames, t=34, d=27, drift=0.02, rs=None):
    """Direction-vector motion whose speed minima land on beat_frames:
    constant drift elsewhere, a dead-stop (repeat frame) at each beat."""
    rs = rs or np.random.RandomState(1)
    step = drift * rs.randn(d).astype(np.float32)
    pose = np.cumsum(np.tile(step, (t, 1)), axis=0).astype(np.float32)
    for f in beat_frames:
        pose[f] = pose[f - 1]  # zero velocity at the beat
    return pose


def test_aligned_beats_outscore_misaligned():
    beats = [5, 12, 19, 26]
    audio = _clicky_audio(beats)[None]
    good = _motion_with_beats(beats)[None]
    bad = _motion_with_beats([9, 16, 23, 30])[None]
    s_good = float(beat_alignment_score(jnp.asarray(audio),
                                        jnp.asarray(good)))
    s_bad = float(beat_alignment_score(jnp.asarray(audio),
                                       jnp.asarray(bad)))
    assert 0.0 <= s_bad < s_good <= 1.0
    assert s_good > 0.6


def test_beat_mask_drops_padded_rows():
    beats = [5, 12, 19, 26]
    audio = np.stack([_clicky_audio(beats),
                      _clicky_audio([7], rs=np.random.RandomState(9))])
    pose = np.stack([_motion_with_beats(beats),
                     np.zeros((34, 27), np.float32)])
    masked = float(beat_alignment_score(
        jnp.asarray(audio), jnp.asarray(pose),
        mask=jnp.asarray([1.0, 0.0])))
    solo = float(beat_alignment_score(jnp.asarray(audio[:1]),
                                      jnp.asarray(pose[:1])))
    np.testing.assert_allclose(masked, solo, rtol=1e-5)


def test_beat_score_jittable_static():
    audio = jnp.zeros((2, 34 * FPS_FRAME))
    pose = jnp.zeros((2, 34, 27))
    fn = jax.jit(beat_alignment_score)
    out = fn(audio, pose)
    assert np.isfinite(float(out))


def test_diversity_detects_collapse():
    ev = EmbeddingSpaceEvaluator.__new__(EmbeddingSpaceEvaluator)
    ev.reset()
    rs = np.random.RandomState(0)
    real = rs.randn(64, 32).astype(np.float32)
    varied = rs.randn(64, 32).astype(np.float32)
    collapsed = np.tile(rs.randn(1, 32).astype(np.float32), (64, 1))

    ev.generated_feat_list = [varied]
    ev.real_feat_list = [real]
    ev.recon_err_diff = []
    ev.mask_list = [None]
    div_varied, div_real = ev.get_diversity()
    assert div_varied > 1.0 and div_real > 1.0

    ev.reset()
    ev.generated_feat_list = [collapsed]
    ev.real_feat_list = [real]
    ev.recon_err_diff = []
    ev.mask_list = [None]
    div_collapsed, _ = ev.get_diversity()
    assert div_collapsed == pytest.approx(0.0, abs=1e-5)
    assert div_collapsed < 0.01 * div_varied


def test_diversity_cap_is_deterministic():
    ev = EmbeddingSpaceEvaluator.__new__(EmbeddingSpaceEvaluator)
    ev.reset()
    feats = np.random.RandomState(3).randn(700, 8).astype(np.float32)
    ev.generated_feat_list = [feats]
    ev.real_feat_list = [feats]
    ev.recon_err_diff = []
    ev.mask_list = [None]
    a = ev.get_diversity(cap=128)
    b = ev.get_diversity(cap=128)
    assert a == b


def test_eval_body_beat_plumbing():
    """multimodal_context eval returns a finite beat score; seq2seq
    (no raw audio in its eval batch) returns NaN."""
    from gesture_generation_from_trimodal_context_tpu.train.eval_steps \
        import make_eval_step
    from tests.test_fused_eval import _tiny_mmc

    args, bundle, gvars, _ = _tiny_mmc()
    step = make_eval_step(bundle, args, np.zeros(27, np.float32))
    rs = np.random.RandomState(0)
    batch = {
        "target_vec": jnp.asarray(0.1 * rs.randn(4, 34, 27),
                                  jnp.float32),
        "in_text": jnp.asarray(rs.randint(0, 5, (4, 34)), jnp.int32),
        "in_audio": jnp.asarray(0.1 * rs.randn(4, 36267), jnp.float32),
    }
    vids = jnp.zeros((4,), jnp.int32)
    *_, beat = step(gvars, batch, vids, jax.random.PRNGKey(1))
    assert np.isfinite(float(beat))
    assert 0.0 <= float(beat) <= 1.0
