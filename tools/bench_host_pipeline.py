#!/usr/bin/env python
"""Host batch-assembly throughput (samples/s) vs worker count.

The multi-chip feed budget: a v5e-8 host must assemble ~8x one chip's
consumption.  Builds a synthetic TED-scale cache once, then measures
BatchIterator throughput for 1/2/4/8 assembly workers.

Usage: python tools/bench_host_pipeline.py [n_windows] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.data import synthetic
    from gesture_generation_from_trimodal_context_tpu.data.dataset import (
        BatchIterator, SpeechMotionDataset)
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    base = "/tmp/gg_hostbench/data"
    synthetic.make_synthetic_raw_store(base + "/lmdb_train",
                                       n_videos=n_videos,
                                       clips_per_video=2,
                                       clip_duration_s=25.0, seed=0)
    mean_pose = synthetic.MEAN_POSE
    mean_dir_vec = synthetic.MEAN_DIR_VEC
    ds = SpeechMotionDataset(base + "/lmdb_train", n_poses=34,
                             subdivision_stride=10, pose_resampling_fps=15,
                             mean_pose=mean_pose, mean_dir_vec=mean_dir_vec)
    lang = Vocab("words")
    for words in ds.store.words:
        for w in words:
            lang.index_word(w[0])
    ds.set_lang_model(lang)
    fields = {"in_text", "in_audio", "target_vec"}
    print("windows: %d, batch: %d" % (len(ds), batch))

    for workers in (1, 2, 4, 8):
        it = BatchIterator(ds, batch, shuffle=True, prefetch=4,
                           workers=workers,
                           make_batch=lambda idx: ds.make_batch(idx, fields))
        # warm (page cache, library load)
        for _ in it:
            pass
        t0 = time.time()
        n = 0
        for b in it:
            n += b["target_vec"].shape[0]
        dt = time.time() - t0
        print("workers=%d: %7.0f samples/s  (%.1f ms/batch)"
              % (workers, n / dt, dt / max(1, n // batch) * 1e3))


if __name__ == "__main__":
    main()
