"""Training entry point.

Behavioral contract: reference scripts/train.py:431-504 — same CLI
(`python scripts/train.py --config=config/<experiment>.yml`), same five
model families, same output layout (output/<name>/..._checkpoint_best.bin,
rotating log, tensorboard_runs/, sample videos).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gesture_generation_from_trimodal_context_tpu.config.parse_args import parse_args
from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    BatchIterator, SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.vocab import build_vocab
from gesture_generation_from_trimodal_context_tpu.train.loops import train_epochs
from gesture_generation_from_trimodal_context_tpu.utils.logging_utils import (
    set_logger, set_random_seed)

POSE_DIM = 27  # 9 bones x 3


def main(args):
    if args.random_seed >= 0:
        set_random_seed(args.random_seed)

    set_logger(args.model_save_path, "train.log")
    logging.info("framework: gesture_generation_from_trimodal_context_tpu")
    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache, platforms)
    compile_cache.enable()  # warm reruns skip the multi-minute compiles
    platforms.enable_host_cpu()  # eager init runs locally, not tunneled
    import jax
    logging.info("jax devices: %s", jax.devices())
    logging.info(vars(args))

    mean_dir_vec = np.array(args.mean_dir_vec).reshape(-1, 3)

    train_dataset = SpeechMotionDataset(
        args.train_data_path[0],
        n_poses=args.n_poses,
        subdivision_stride=args.subdivision_stride,
        pose_resampling_fps=args.motion_resampling_framerate,
        mean_dir_vec=mean_dir_vec,
        mean_pose=args.mean_pose,
        remove_word_timing=(args.input_context == "text"),
        cache_workers=args.loader_workers)
    val_dataset = SpeechMotionDataset(
        args.val_data_path[0],
        n_poses=args.n_poses,
        subdivision_stride=args.subdivision_stride,
        pose_resampling_fps=args.motion_resampling_framerate,
        speaker_model=train_dataset.speaker_model,
        mean_dir_vec=mean_dir_vec,
        mean_pose=args.mean_pose,
        remove_word_timing=(args.input_context == "text"))
    test_dataset = SpeechMotionDataset(
        args.test_data_path[0],
        n_poses=args.n_poses,
        subdivision_stride=args.subdivision_stride,
        pose_resampling_fps=args.motion_resampling_framerate,
        speaker_model=train_dataset.speaker_model,
        mean_dir_vec=mean_dir_vec,
        mean_pose=args.mean_pose)

    # gather only the fields this model family consumes (hot-path win:
    # e.g. the flagship never reads spectrograms, seq2seq reads no audio)
    fields = {
        "multimodal_context": {"in_text", "in_audio", "target_vec"},
        "joint_embedding": {"in_text", "in_audio", "target_vec"},
        "gesture_autoencoder": {"in_text", "in_audio", "target_vec"},
        "seq2seq": {"word_seq", "target_vec"},
        "speech2gesture": {"in_spec", "in_audio", "target_vec"},
    }.get(args.model)

    if getattr(args, "audio_int16_transfer", False):
        # halve host->device audio bytes (int16 PCM; decoded in-graph)
        train_dataset.audio_int16 = True
        val_dataset.audio_int16 = True
        test_dataset.audio_int16 = True

    # loader_workers doubles as the batch-assembly thread-pool size
    # (reference DataLoader num_workers, lmdb_data_loader usage); the
    # native gathers release the GIL so threads scale
    train_loader = BatchIterator(
        train_dataset, args.batch_size, shuffle=True,
        seed=max(args.random_seed, 0), prefetch=args.prefetch_batches,
        workers=max(1, args.loader_workers),
        make_batch=lambda idx: train_dataset.make_batch(idx, fields))
    test_loader = BatchIterator(
        val_dataset, args.batch_size, shuffle=False,
        prefetch=args.prefetch_batches,
        make_batch=lambda idx: val_dataset.make_batch(idx, fields),
        include_tail=getattr(args, "eval_full_set", False))

    vocab_cache_path = os.path.join(
        os.path.split(args.train_data_path[0])[0], "vocab_cache.pkl")
    lang_model = build_vocab("words",
                             [train_dataset, val_dataset, test_dataset],
                             vocab_cache_path, args.wordembed_path,
                             args.wordembed_dim)
    train_dataset.set_lang_model(lang_model)
    val_dataset.set_lang_model(lang_model)
    test_dataset.set_lang_model(lang_model)

    train_epochs(args, train_loader, test_loader, lang_model,
                 pose_dim=POSE_DIM,
                 speaker_model=train_dataset.speaker_model)


if __name__ == "__main__":
    main(parse_args())
