"""scripts/train.py main() end to end on CPU with synthetic data (the
dataset/vocab assembly the e2e train_epochs tests do not cover)."""

import os

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.config import (
    parse_args_mod as cfg)
from gesture_generation_from_trimodal_context_tpu.data import synthetic

import scripts.train as train_cli


def _cfg(name):
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg
    return os.path.join(os.path.dirname(cfg_pkg.__file__), name)


def test_train_cli_gesture_autoencoder(tmp_path, monkeypatch):
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 97)
    args = cfg.parse_args([
        "--config", _cfg("gesture_autoencoder.yml"),
        "--train_data_path", str(base / "lmdb_train"),
        "--val_data_path", str(base / "lmdb_val"),
        "--test_data_path", str(base / "lmdb_test"),
        "--model_save_path", str(tmp_path / "out"),
        "--wordembed_path", "", "--wordembed_dim", "16",
        "--batch_size", "8", "--epochs", "1",
        "--random_seed", "2", "--save_result_video", "false",
        "--prefetch_batches", "0"])
    train_cli.main(args)
    ckpt = tmp_path / "out" / "gesture_autoencoder_checkpoint_best.bin"
    assert ckpt.exists()
    # vocab cache written next to the data (reference train.py:490)
    assert (base / "vocab_cache.pkl").exists()
