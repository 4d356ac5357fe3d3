"""Export to reference torch format: exact inversion of the importer.

For every family: reference torch module state_dict -> import (flax
vars) -> export -> the result must equal the ORIGINAL state_dict
bit-for-bit (same keys including BN counters and the TCN's aliased
Sequential registrations) and load into a fresh reference module with
``strict=True``.  Equality of state_dicts implies identical reference
forwards, so this subsumes output parity.  Plus one end-to-end file
test through export_checkpoint (vocab re-pickling under
``model.vocab.Vocab``).
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax

from gesture_generation_from_trimodal_context_tpu.interop import (
    torch_export, torch_import)

REF = "/root/reference/scripts"


@pytest.fixture(scope="module")
def ref_mods():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "fasttext" not in sys.modules:
        sys.modules["fasttext"] = types.ModuleType("fasttext")
    import model.embedding_net as ref_embed
    import model.multimodal_context_net as ref_mmc
    import model.vocab as ref_vocab
    return ref_mmc, ref_embed, ref_vocab


def _make_vocab(ref_vocab, words, insert_default_tokens=True, dim=16):
    v = ref_vocab.Vocab("test", insert_default_tokens=insert_default_tokens)
    for w in words:
        v.index_word(w)
    rng = np.random.RandomState(0)
    v.word_embedding_weights = rng.randn(v.n_words, dim).astype(np.float32)
    return v


def _roundtrip(tmp_path, args, ref_module, what="generator",
               lang=None, spk=None, dis_module=None):
    """torch sd -> import -> export; assert exact sd equality and a
    strict load into a fresh module of the same construction."""
    sd0 = ref_module.state_dict()
    path = os.path.join(str(tmp_path), "ref.bin")
    blob = {"args": args, "epoch": 1, "lang_model": lang,
            "speaker_model": spk, "pose_dim": 27,
            "gen_dict": sd0 if what == "generator" else None,
            "dis_dict": (dis_module.state_dict()
                         if dis_module is not None else None)}
    if what == "discriminator":
        blob["gen_dict"], blob["dis_dict"] = blob["dis_dict"], sd0
    torch.save(blob, path)
    state = torch_import.load_torch_checkpoint(path)
    variables = state["gen_vars"] if what == "generator" \
        else state["dis_vars"]
    sd1 = torch_export.export_variables(args.model, variables, what)
    _assert_sd_equal(sd0, sd1)
    return state, sd1


def _assert_sd_equal(sd0, sd1):
    k0 = set(sd0.keys())
    k1 = set(sd1.keys())
    assert k0 == k1, ("missing=%s extra=%s"
                      % (sorted(k0 - k1), sorted(k1 - k0)))
    for k in sd0:
        a = sd0[k].detach().cpu().numpy()
        b = np.asarray(sd1[k])
        assert a.shape == tuple(b.shape), (k, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=k)


def _strict_load(module, sd):
    module.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)


def _mmc_args(z_type="none"):
    return SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=24, n_layers=2, dropout_prob=0.3,
        input_context="both", freeze_wordembed=False, wordembed_dim=16,
        motion_resampling_framerate=15, z_type=z_type, mean_dir_vec=[[0.0]])


def test_export_pose_generator_speaker(ref_mods, tmp_path):
    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args(z_type="speaker")
    lang = _make_vocab(ref_vocab, ["a", "b", "c"])
    spk = _make_vocab(ref_vocab, ["v1", "v2", "v3"],
                      insert_default_tokens=False)
    gen = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=spk)
    _, sd1 = _roundtrip(tmp_path, args, gen, lang=lang, spk=spk)
    fresh = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                  word_embed_size=16, word_embeddings=None,
                                  z_obj=spk)
    _strict_load(fresh, sd1)


def test_export_conv_discriminator(ref_mods, tmp_path):
    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args()
    lang = _make_vocab(ref_vocab, ["x", "y"])
    gen = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=None)
    dis = ref_mmc.ConvDiscriminator(27)
    _, sd1 = _roundtrip(tmp_path, args, dis, what="discriminator",
                        lang=lang, dis_module=gen)
    _strict_load(ref_mmc.ConvDiscriminator(27), sd1)


def test_export_fgd_autoencoder(ref_mods, tmp_path):
    _, ref_embed, _ = ref_mods
    args = SimpleNamespace(
        model="gesture_autoencoder", n_poses=34, n_pre_poses=4,
        hidden_size=200, n_layers=2, dropout_prob=0.3,
        input_context="both", freeze_wordembed=False, wordembed_dim=0,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    ref = ref_embed.EmbeddingNet(None, 27, 34, None, None, None, mode="pose")
    _, sd1 = _roundtrip(tmp_path, args, ref)
    fresh = ref_embed.EmbeddingNet(None, 27, 34, None, None, None,
                                   mode="pose")
    _strict_load(fresh, sd1)


def test_export_joint_embedding(ref_mods, tmp_path):
    _, ref_embed, ref_vocab = ref_mods
    lang = _make_vocab(ref_vocab, ["m%d" % i for i in range(10)], dim=16)
    args = SimpleNamespace(
        model="joint_embedding", n_poses=34, n_pre_poses=4, hidden_size=24,
        n_layers=2, dropout_prob=0.3, wordembed_dim=16,
        input_context="both", freeze_wordembed=False,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    ref = ref_embed.EmbeddingNet(args, 27, 34, lang.n_words, 16, None,
                                 mode="random")
    _, sd1 = _roundtrip(tmp_path, args, ref, lang=lang)
    fresh = ref_embed.EmbeddingNet(args, 27, 34, lang.n_words, 16, None,
                                   mode="random")
    _strict_load(fresh, sd1)


def test_export_seq2seq(ref_mods, tmp_path):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.seq2seq_net as ref_s2s
    _, _, ref_vocab = ref_mods
    lang = _make_vocab(ref_vocab, ["w%d" % i for i in range(20)], dim=12)
    args = SimpleNamespace(
        model="seq2seq", n_poses=34, n_pre_poses=4, hidden_size=20,
        n_layers=2, dropout_prob=0.1, GAN_noise_size=0, wordembed_dim=12,
        input_context="text", freeze_wordembed=False,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    ref = ref_s2s.Seq2SeqNet(args, 27, 34, lang.n_words, 12, None)
    _, sd1 = _roundtrip(tmp_path, args, ref, lang=lang)
    fresh = ref_s2s.Seq2SeqNet(args, 27, 34, lang.n_words, 12, None)
    _strict_load(fresh, sd1)


def test_export_speech2gesture(ref_mods, tmp_path):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from test_reference_parity import _SanitizedConvInit
    import model.speech2gesture as ref_s2g
    _, _, ref_vocab = ref_mods
    lang = _make_vocab(ref_vocab, ["p", "q"])
    args = SimpleNamespace(
        model="speech2gesture", n_poses=34, n_pre_poses=4, hidden_size=16,
        n_layers=2, dropout_prob=0.1, wordembed_dim=16,
        input_context="audio", freeze_wordembed=False,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    with _SanitizedConvInit():
        gen = ref_s2g.Generator(34, 27, 4)
        dis = ref_s2g.Discriminator(27)
    state, gen_sd1 = _roundtrip(tmp_path, args, gen, lang=lang,
                                dis_module=dis)
    dis_sd1 = torch_export.export_variables(args.model, state["dis_vars"],
                                            "discriminator")
    _assert_sd_equal(dis.state_dict(), dis_sd1)
    with _SanitizedConvInit():
        fresh_gen = ref_s2g.Generator(34, 27, 4)
        fresh_dis = ref_s2g.Discriminator(27)
    _strict_load(fresh_gen, gen_sd1)
    _strict_load(fresh_dis, dis_sd1)


def test_export_checkpoint_file_roundtrip(ref_mods, tmp_path):
    """Full file path: reference blob -> import_checkpoint (msgpack) ->
    export_checkpoint (torch) -> torch.load in a reference-like env.
    The regenerated gen_dict/dis_dict match the original bit-for-bit
    and the vocab unpickles as model.vocab.Vocab."""
    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args(z_type="speaker")
    lang = _make_vocab(ref_vocab, ["hello", "world"])
    spk = _make_vocab(ref_vocab, ["vidA", "vidB"],
                      insert_default_tokens=False)
    gen = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=spk)
    dis = ref_mmc.ConvDiscriminator(27)
    src = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 42, "lang_model": lang,
                "speaker_model": spk, "pose_dim": 27,
                "gen_dict": gen.state_dict(),
                "dis_dict": dis.state_dict()}, src)

    ours = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(src, ours)
    back = os.path.join(str(tmp_path), "back.bin")
    torch_export.export_checkpoint(ours, back)
    assert torch_import.is_torch_checkpoint(back)

    blob = torch.load(back, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 42 and blob["pose_dim"] == 27
    assert type(blob["lang_model"]).__module__ == "model.vocab"
    assert blob["lang_model"].word2index == lang.word2index
    assert blob["speaker_model"].n_words == spk.n_words
    assert blob["args"].model == "multimodal_context"
    _assert_sd_equal(gen.state_dict(), blob["gen_dict"])
    _assert_sd_equal(dis.state_dict(), blob["dis_dict"])
    # and the exported dicts drive a fresh reference model, strictly
    fresh = ref_mmc.PoseGenerator(args, pose_dim=27,
                                  n_words=lang.n_words, word_embed_size=16,
                                  word_embeddings=None, z_obj=spk)
    fresh.load_state_dict(blob["gen_dict"], strict=True)


def test_shim_cleanup_restores_preexisting_model_package():
    """_shim_reference_vocab_module must undo EVERYTHING it adds — in
    particular the ``vocab`` attribute it sets on a pre-existing real
    ``model`` package (sys.modules entries alone are not enough: stale
    attributes would shadow the reference class for later attribute
    access)."""
    saved = {k: sys.modules.pop(k, None) for k in ("model", "model.vocab")}
    try:
        fake_pkg = types.ModuleType("model")
        sys.modules["model"] = fake_pkg  # "real" package, vocab not imported
        cleanup = []
        cls = torch_export._shim_reference_vocab_module(cleanup)
        assert sys.modules["model.vocab"].Vocab is cls
        assert fake_pkg.vocab is sys.modules["model.vocab"]
        for undo in reversed(cleanup):
            undo()
        assert "model.vocab" not in sys.modules
        assert not hasattr(fake_pkg, "vocab")
        assert sys.modules["model"] is fake_pkg  # pre-existing pkg kept

        # fully-absent case: both entries are added AND removed
        sys.modules.pop("model", None)
        cleanup = []
        torch_export._shim_reference_vocab_module(cleanup)
        assert "model" in sys.modules and "model.vocab" in sys.modules
        for undo in reversed(cleanup):
            undo()
        assert "model" not in sys.modules
        assert "model.vocab" not in sys.modules
    finally:
        for k in ("model", "model.vocab"):
            sys.modules.pop(k, None)
            if saved[k] is not None:
                sys.modules[k] = saved[k]
