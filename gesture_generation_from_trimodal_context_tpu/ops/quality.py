"""In-graph motion-quality metrics beyond FGD.

VERDICT r4 item 5: on the synthetic hard fixture FGD stops
discriminating after ~epoch 8, so late-run quality regressions were
invisible.  These metrics track complementary axes:

- ``beat_alignment_score``: audio-beat -> nearest-motion-beat agreement,
  the beat-align score family used by gesture/dance papers (AIST++ /
  Bailando style: mean over audio beats of exp(-d^2 / 2 sigma^2) with d
  the distance to the nearest kinematic beat).  The reference repo has
  no such metric (its evaluator is FGD-only,
  reference scripts/model/embedding_space_evaluator.py:74-101); this is
  an intentional superset, computed fully in-graph (static shapes, no
  host sync) so it rides the existing eval dispatch for free.

The audio-beat detector here is deliberately simple (frame-energy onset
peaks, not a spectral-flux tracker): the score is a RELATIVE regression
signal over training, not a cross-paper-comparable absolute number.
Diversity (feature-space) lives in models/evaluator.py, computed from
the FGD feature stacks the evaluator already accumulates.
"""

import jax.numpy as jnp


def beat_alignment_score(audio, pose_dir, mask=None, sigma=1.0):
    """Beat-alignment between raw audio and generated motion.

    audio: (B, S) f32 raw PCM covering the same time span as the pose
        window; pose_dir: (B, T, D) direction vectors; mask: optional
        (B,) f32 validity weights (--eval_full_set padded tails);
        sigma: gaussian tolerance in FRAMES (1 frame @15 fps ~ 67 ms).

    Audio beats: per-frame mean |amplitude| -> positive first
    difference (onset strength) -> strict local maxima above the
    per-sample mean onset.  Motion beats: local minima of the
    dir-vector speed ||x_{t+1} - x_t|| (direction-change instants).
    Score: mean over audio beats of exp(-d^2 / 2 sigma^2), d = frames
    to the nearest motion beat; samples with no audio beat contribute
    via the max(count, 1) guard (score 0 — silent windows are rare at
    TED window sizes).  All shapes static; safe under jit/scan.
    """
    b, s = audio.shape
    t = pose_dir.shape[1]
    frame_len = s // t
    env = jnp.mean(jnp.abs(audio[:, :t * frame_len]).reshape(
        b, t, frame_len), axis=-1)
    onset = jnp.maximum(env[:, 1:] - env[:, :-1], 0.0)  # (B, T-1)

    prev = jnp.pad(onset[:, :-1], ((0, 0), (1, 0)))
    nxt = jnp.pad(onset[:, 1:], ((0, 0), (0, 1)))
    abeat = ((onset >= prev) & (onset > nxt)
             & (onset > jnp.mean(onset, axis=1, keepdims=True)))

    vel = pose_dir[:, 1:] - pose_dir[:, :-1]  # (B, T-1, D)
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1) + 1e-12)  # (B, T-1)
    sp_prev = jnp.pad(speed[:, :-1], ((0, 0), (1, 0)),
                      constant_values=jnp.inf)
    sp_next = jnp.pad(speed[:, 1:], ((0, 0), (0, 1)),
                      constant_values=jnp.inf)
    mbeat = (speed <= sp_prev) & (speed < sp_next)  # (B, T-1)

    frames = jnp.arange(t - 1, dtype=jnp.float32)
    dist = jnp.abs(frames[:, None] - frames[None, :])  # (Ta, Tm)
    # distance from every frame to its nearest motion beat; masked
    # motion frames are inf -> score exp(-inf) = 0
    dmin = jnp.min(jnp.where(mbeat[:, None, :], dist[None], jnp.inf),
                   axis=-1)  # (B, T-1)
    score = jnp.exp(-(dmin * dmin) / (2.0 * sigma * sigma))

    w = abeat.astype(jnp.float32)
    per_sample = jnp.sum(score * w, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0)  # (B,)
    if mask is None:
        return jnp.mean(per_sample)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
