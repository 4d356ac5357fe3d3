"""scripts/synthesize.py eval-mode CLI on CPU with synthetic data."""

import os
import pickle

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.config import (
    parse_args_mod as cfg)
from gesture_generation_from_trimodal_context_tpu.data import synthetic
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib

import scripts.synthesize as synth_cli


def _cfg(name):
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg
    return os.path.join(os.path.dirname(cfg_pkg.__file__), name)


def test_synthesize_eval_mode(tmp_path):
    base = tmp_path / "ted"
    synthetic.make_synthetic_raw_store(str(base / "lmdb_val"), n_videos=2,
                                       clips_per_video=1,
                                       clip_duration_s=8.0, seed=3)

    lang = Vocab("words")
    for v in __import__(
            "gesture_generation_from_trimodal_context_tpu.data.storage",
            fromlist=["open_raw_store"]).open_raw_store(
                str(base / "lmdb_val")).iter_videos():
        for clip in v["clips"]:
            for w in clip["words"]:
                lang.index_word(w[0])
    lang.load_word_vectors("", 16)
    with open(base / "vocab_cache.pkl", "wb") as f:
        pickle.dump(lang, f)

    spk = Vocab("vid", insert_default_tokens=False)
    for i in range(3):
        spk.index_word("video_%03d" % i)

    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(tmp_path / "out"),
        "--hidden_size", "32", "--n_layers", "2",
        "--wordembed_dim", "16", "--eval_net_path", ""])
    bundle = factory.init_model(args, lang, spk, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 1)
    ckpt = tmp_path / "ckpt.bin"
    ckpt_lib.save_checkpoint({
        "args": args, "epoch": 0, "lang_model": lang, "speaker_model": spk,
        "pose_dim": 27, "gen_vars": jax.device_get(gvars), "dis_vars": None,
    }, str(ckpt))

    # must run the full evaluate_testset path without error — default is
    # the device-resident val path; "host" covers the reference-style
    # per-batch host pipeline
    synth_cli.main("eval", str(ckpt), None, data_base=str(base))
    synth_cli.main("eval", str(ckpt), "host", data_base=str(base))


def test_synthesize_from_text_noninteractive(tmp_path, monkeypatch):
    """--text mode: stdin-free scripted synthesis through the offline
    TTS voice + offline aligner, down to the PKL artifact."""
    monkeypatch.chdir(tmp_path)
    base = tmp_path / "ted"
    base.mkdir()

    lang = Vocab("words")
    for w in ("a", "robot", "waves", "hello", "to", "everyone"):
        lang.index_word(w)
    lang.load_word_vectors("", 16)
    spk = Vocab("vid", insert_default_tokens=False)
    for i in range(3):
        spk.index_word("video_%03d" % i)

    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(tmp_path / "out"),
        "--hidden_size", "32", "--n_layers", "2",
        "--wordembed_dim", "16", "--eval_net_path", "",
        "--save_result_video", "false"])
    bundle = factory.init_model(args, lang, spk, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 1)
    ckpt = tmp_path / "ckpt.bin"
    ckpt_lib.save_checkpoint({
        "args": args, "epoch": 0, "lang_model": lang, "speaker_model": spk,
        "pose_dim": 27, "gen_vars": jax.device_get(gvars), "dis_vars": None,
    }, str(ckpt))

    synth_cli.main("from_text", str(ckpt), None, data_base=str(base),
                   text="a robot waves hello to everyone")

    results = tmp_path / "output" / "generation_results"
    pkls = list(results.glob("*.pkl"))
    assert len(pkls) == 1, list(results.iterdir())
    with open(pkls[0], "rb") as f:
        d = pickle.load(f)
    assert set(d) >= {"sentence", "audio", "out_dir_vec", "out_poses",
                      "aux_info"}
    assert np.isfinite(d["out_dir_vec"]).all()
    assert d["out_dir_vec"].shape[1] == 27
    # the offline aligner timestamps every word
    assert [w[0] for w in d["sentence"]] == \
        ["a", "robot", "waves", "hello", "to", "everyone"]
