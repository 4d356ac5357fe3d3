#!/usr/bin/env python
"""Build a synthetic TED-style dataset tree for end-to-end runs.

Creates, under DEST (default .smoke/):
  data/ted_dataset/lmdb_train | lmdb_val | lmdb_test   (raw clip stores)
  data/h36m/data_3d_h36m.npz                           (FGD-AE training data)

The raw stores carry the exact schema of the published TED database
(reference data_preprocessor.py:70-75), with motion tuned to pass the
motion filter, so the full train/synthesize CLIs run on them unchanged.

Scale: --videos N gives ~N * clips * ~(dur*fps-34)/10 training windows.
The published TED cache holds ~150k windows; --videos 2200 --dur 25
reproduces that order of magnitude for full-recipe wall-clock runs
(VERDICT.md item 7).  Clip generation is parallelized over processes;
the LMDB write stays on the main process.

Usage:
  python tools/make_smoke_data.py [DEST] [--videos N] [--clips N]
      [--dur SECONDS] [--val_videos N] [--test_videos N] [--h36m_frames N]
      [--workers N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _gen_video(task):
    """Worker: build one video's clip list (runs in a subprocess)."""
    from gesture_generation_from_trimodal_context_tpu.data import synthetic
    v, clips_per_video, dur_range, fps, seed, style_name = task
    rng = np.random.RandomState(seed)
    style = synthetic.speaker_style(seed) if style_name == "hard" else None
    clips = []
    t0 = 0.0
    lo, hi = dur_range
    for c in range(clips_per_video):
        # per-clip duration draw (real TED clips vary; a range like
        # 8-25 makes the store exercise synthesize.py's 5-12 s
        # from_db_clip duration filter at any fixture scale)
        clip_duration_s = lo if hi <= lo else float(rng.uniform(lo, hi))
        if style is not None:
            clips.append(synthetic.hard_clip(
                clip_duration_s, fps, rng, style, start_time=t0,
                start_frame=int(t0 * fps)))
        else:
            clips.append(synthetic.synthetic_clip(
                clip_duration_s, fps, rng, start_time=t0,
                start_frame=int(t0 * fps), phase=v * 2.1 + c * 0.7))
        t0 += clip_duration_s + 1.0
    return v, {"vid": "video_%05d" % v, "clips": clips}


def make_store(path, n_videos, clips_per_video, dur_range, fps, seed,
               workers, style="hard"):
    from gesture_generation_from_trimodal_context_tpu.data.storage import (
        GGRawStoreWriter)
    if not isinstance(dur_range, (tuple, list)):
        dur_range = (float(dur_range), float(dur_range))
    tasks = [(v, clips_per_video, tuple(dur_range), fps,
              seed * 100003 + v, style)
             for v in range(n_videos)]
    with GGRawStoreWriter(path) as w:
        if workers <= 1 or n_videos < 8:
            results = map(_gen_video, tasks)
            for i, (v, rec) in enumerate(results):
                w.add("{:010}".format(v), rec)
        else:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")  # JAX-safe (no fork of threads)
            with ctx.Pool(workers) as pool:
                for i, (v, rec) in enumerate(
                        pool.imap(_gen_video, tasks, chunksize=4)):
                    w.add("{:010}".format(v), rec)
                    if (i + 1) % 200 == 0:
                        print("  %s: %d/%d videos" % (path, i + 1, n_videos),
                              flush=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dest", nargs="?", default=".smoke")
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--val_videos", type=int, default=0,
                    help="default: max(2, videos//10)")
    ap.add_argument("--test_videos", type=int, default=0,
                    help="default: max(2, videos//10)")
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--dur", default="8",
                    help="clip duration in seconds; 'MIN-MAX' (e.g. "
                         "'8-25') draws per-clip durations uniformly "
                         "so the store carries mixed clip lengths like "
                         "real TED")
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--h36m_frames", type=int, default=300,
                    help="frames per H3.6M action (x14 actions)")
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--style", choices=("easy", "hard"), default="hard",
                    help="'hard' (default): speaker-conditioned style "
                         "mixtures + OU/regime temporal noise + audio/"
                         "text-coupled beats, so FGD stays discriminative "
                         "over a full training run (VERDICT r3 item 3); "
                         "'easy': the round-2 phase-shifted sinusoids")
    args = ap.parse_args()

    from gesture_generation_from_trimodal_context_tpu.data import synthetic

    base = os.path.join(args.dest, "data")
    ted = os.path.join(base, "ted_dataset")
    os.makedirs(ted, exist_ok=True)
    os.makedirs(os.path.join(base, "h36m"), exist_ok=True)

    n_val = args.val_videos or max(2, args.videos // 10)
    n_test = args.test_videos or max(2, args.videos // 10)
    for split, n, seed in (("train", args.videos, 1),
                           ("val", n_val, 2), ("test", n_test, 3)):
        path = os.path.join(ted, "lmdb_" + split)
        dur = str(args.dur)
        dur_range = tuple(float(x) for x in dur.split("-", 1)) \
            if "-" in dur else (float(dur), float(dur))
        print("building %s: %d videos x %d clips x %s s (%s style)"
              % (path, n, args.clips, dur, args.style), flush=True)
        make_store(path, n, args.clips, dur_range, args.fps, seed,
                   args.workers, style=args.style)

    npz = os.path.join(base, "h36m", "data_3d_h36m.npz")
    print("building %s" % npz, flush=True)
    synthetic.make_synthetic_h36m(npz, n_frames_per_action=args.h36m_frames)
    print("done: %s" % args.dest)


if __name__ == "__main__":
    main()
