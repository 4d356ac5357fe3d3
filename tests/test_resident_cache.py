"""Resident-assembly disk cache (train/resident.py assemble_host_data):
the assembled host tensors are cached next to the sample cache and
re-loaded bit-exactly; any input that shapes them invalidates the key."""

import os

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.data import synthetic
from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab
from gesture_generation_from_trimodal_context_tpu.train import resident


def _make_dataset(path):
    ds = SpeechMotionDataset(
        path, n_poses=34, subdivision_stride=10, pose_resampling_fps=15,
        mean_pose=synthetic.MEAN_POSE,
        mean_dir_vec=synthetic.MEAN_DIR_VEC.flatten())
    lang = Vocab("words")
    for v in ds.raw_store().iter_videos():
        for clip in v["clips"]:
            for w in clip["words"]:
                lang.index_word(w[0])
    ds.set_lang_model(lang)
    return ds


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("ted") / "lmdb_train"
    synthetic.make_synthetic_raw_store(str(path), n_videos=2,
                                       clips_per_video=2,
                                       clip_duration_s=8.0)
    return str(path)


def test_assembly_cache_roundtrip(store_dir):
    ds = _make_dataset(store_dir)
    spk = ds.speaker_model
    first = resident.assemble_host_data(ds, spk, include_vids=True)
    cache_root = os.path.join(ds.store.path, "resident")
    subdirs = os.listdir(cache_root)
    assert len(subdirs) == 1
    assert os.path.exists(os.path.join(cache_root, subdirs[0],
                                       "index.json"))

    # a FRESH dataset over the same store loads the cache bit-exactly
    ds2 = _make_dataset(store_dir)
    second = resident.assemble_host_data(ds2, ds2.speaker_model,
                                         include_vids=True)
    assert isinstance(second["target_vec"], np.memmap)
    assert sorted(second) == sorted(first)
    for k in first:
        assert first[k].dtype == second[k].dtype
        np.testing.assert_array_equal(np.asarray(first[k]),
                                      np.asarray(second[k]))


def test_assembly_cache_key_sensitivity(store_dir):
    ds = _make_dataset(store_dir)
    spk = ds.speaker_model
    base = resident._assembly_fingerprint(ds, spk, True,
                                          resident.TRAIN_FIELDS)
    # different field set / vids flag / geometry -> different key
    assert resident._assembly_fingerprint(
        ds, spk, False, resident.TRAIN_FIELDS) != base
    assert resident._assembly_fingerprint(
        ds, spk, True, ("target_vec",)) != base
    # tokenization identity: remapping one vocabulary word changes the
    # key (tokenization is lazy; the fingerprint hashes word2index)
    word = next(w for w in ds.lang_model.word2index
                if ds.lang_model.word2index[w] > 3)
    old = ds.lang_model.word2index[word]
    ds.lang_model.word2index[word] = old + 1000
    assert resident._assembly_fingerprint(
        ds, spk, True, resident.TRAIN_FIELDS) != base
    ds.lang_model.word2index[word] = old
    assert resident._assembly_fingerprint(
        ds, spk, True, resident.TRAIN_FIELDS) == base
    # and the lazy arrays are untouched by fingerprinting
    assert ds._tok_ids is None
    # touching a source .bin invalidates
    vec_bin = os.path.join(ds.store.path, "vec_seq.bin")
    st = os.stat(vec_bin)
    os.utime(vec_bin, (st.st_atime, st.st_mtime + 7))
    assert resident._assembly_fingerprint(
        ds, spk, True, resident.TRAIN_FIELDS) != base


def test_assembly_cache_disabled(store_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("GG_RESIDENT_CACHE", "0")
    import shutil
    iso = str(tmp_path / "lmdb_train")
    shutil.copytree(store_dir, iso)
    ds = _make_dataset(iso)
    host = resident.assemble_host_data(ds, ds.speaker_model,
                                       include_vids=False)
    assert not os.path.exists(os.path.join(ds.store.path, "resident"))
    assert host["target_vec"].shape[0] == len(ds)


def test_prebuild_tool_then_train_hits_cache(tmp_path):
    """tools/build_resident_cache.py pre-builds the exact fingerprint the
    training driver later looks up (same dataset+vocab construction)."""
    import scripts.train as train_cli
    import tools.build_resident_cache as prebuild
    from gesture_generation_from_trimodal_context_tpu.config import (
        parse_args_mod as cfg)
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg

    base = tmp_path / "data" / "ted_dataset"
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(str(base / split), n_videos=2,
                                           clips_per_video=1,
                                           clip_duration_s=8.0,
                                           seed=hash(split) % 73)
    argv = [
        "--config", os.path.join(os.path.dirname(cfg_pkg.__file__),
                                 "multimodal_context.yml"),
        "--train_data_path", str(base / "lmdb_train"),
        "--val_data_path", str(base / "lmdb_val"),
        "--test_data_path", str(base / "lmdb_test"),
        "--model_save_path", str(tmp_path / "out"),
        "--wordembed_path", "", "--wordembed_dim", "16",
        "--hidden_size", "32", "--n_layers", "2",
        "--batch_size", "8", "--epochs", "1", "--loss_warmup", "-1",
        "--random_seed", "5", "--save_result_video", "false",
        "--prefetch_batches", "0", "--eval_net_path", "",
        "--device_resident_data", "true", "--steps_per_call", "2"]
    prebuild.main(cfg.parse_args(argv))
    root = str(base / "lmdb_train_ggpack_cache" / "resident")
    (fp,) = os.listdir(root)

    # the train CLI's set_logger replaces all root handlers, so capture
    # via the train.log file it writes rather than an injected handler
    train_cli.main(cfg.parse_args(argv))
    with open(tmp_path / "out" / "train.log") as f:
        log = f.read()
    assert "resident train assembly: cache hit" in log
    assert os.listdir(root) == [fp]  # same fingerprint, no rebuild
    assert (tmp_path / "out" /
            "multimodal_context_checkpoint_best.bin").exists()
