"""Pre-build the resident-assembly disk cache outside a training run.

`--device_resident_data` assembles the whole train+val sets into stacked
host tensors before uploading them to HBM (train/resident.py
assemble_host_data).  At published TED scale that assembly is ~15 min of
one-vCPU decode work; this tool pays it once (writing
``<cache>/resident/<fingerprint>/``) so every later `scripts/train.py`
run starts from the ~1-2 min disk read instead.

Usage (same config/flags as train.py):
    python tools/build_resident_cache.py --config=config/<experiment>.yml
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gesture_generation_from_trimodal_context_tpu.config.parse_args import (
    parse_args)
from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.vocab import (
    Vocab, build_vocab)
from gesture_generation_from_trimodal_context_tpu.train import resident


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    mean_dir_vec = np.array(args.mean_dir_vec).reshape(-1, 3)

    def make_dataset(path, speaker_model=None):
        return SpeechMotionDataset(
            path,
            n_poses=args.n_poses,
            subdivision_stride=args.subdivision_stride,
            pose_resampling_fps=args.motion_resampling_framerate,
            mean_dir_vec=mean_dir_vec,
            mean_pose=args.mean_pose,
            speaker_model=speaker_model,
            remove_word_timing=(args.input_context == "text"),
            cache_workers=args.loader_workers)

    train_dataset = make_dataset(args.train_data_path[0])
    val_dataset = make_dataset(args.val_data_path[0],
                               train_dataset.speaker_model)
    test_dataset = make_dataset(args.test_data_path[0],
                                train_dataset.speaker_model)

    vocab_cache_path = os.path.join(
        os.path.split(args.train_data_path[0])[0], "vocab_cache.pkl")
    lang_model = build_vocab("words",
                             [train_dataset, val_dataset, test_dataset],
                             vocab_cache_path, args.wordembed_path,
                             args.wordembed_dim)
    train_dataset.set_lang_model(lang_model)
    val_dataset.set_lang_model(lang_model)

    fields = resident.MODEL_FIELDS[args.model]
    res_vids = (args.model == "multimodal_context"
                and isinstance(train_dataset.speaker_model, Vocab))
    for label, ds, vids in (("train", train_dataset, res_vids),
                            ("val", val_dataset, False)):
        t0 = time.time()
        host = resident.assemble_host_data(
            ds, train_dataset.speaker_model, include_vids=vids,
            label=label, fields=fields)
        total = sum(v.nbytes for v in host.values())
        logging.info("%s: %d samples, %.2f GB assembled in %.1f s",
                     label, len(ds), total / 1e9, time.time() - t0)


if __name__ == "__main__":
    main(parse_args())
