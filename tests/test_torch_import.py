"""Round-trip import of reference torch checkpoints.

Builds the ACTUAL reference torch modules (read-only at /root/reference),
saves a reference-format ``torch.save`` checkpoint, imports it with
interop.torch_import, and requires this framework's outputs to match the
torch model's eval-mode outputs.  This is the inverse direction of
tests/test_reference_parity.py and proves the released reference
checkpoints (generator + FGD autoencoder) are directly consumable.
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.interop import torch_import
from gesture_generation_from_trimodal_context_tpu.train.checkpoint import (
    load_checkpoint_and_model)

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


def _mmc_args(hidden=24, layers=2, embed=16, z_type="none"):
    return SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=hidden, n_layers=layers, dropout_prob=0.3,
        input_context="both", freeze_wordembed=False, wordembed_dim=embed,
        motion_resampling_framerate=15, z_type=z_type, mean_dir_vec=[[0.0]])


def test_import_pose_generator_full_output_match(ref_mods, tmp_path):
    """z_type=none: the whole forward is deterministic in eval mode ->
    full output must match to 1e-4."""
    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args()
    lang = _make_vocab(ref_vocab, ["hello", "world", "gesture", "speech"])

    ref = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=None)
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 7, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": ref.state_dict(), "dis_dict": None}, path)
    assert torch_import.is_torch_checkpoint(path)

    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)
    assert not torch_import.is_torch_checkpoint(out_path)
    loaded_args, bundle, gen_vars, lang2, spk2, pose_dim = \
        load_checkpoint_and_model(out_path, jax.random.PRNGKey(0))
    assert pose_dim == 27 and spk2 is None
    assert lang2.n_words == lang.n_words and lang2.word2index == lang.word2index
    assert loaded_args.use_pallas is None  # TPU defaults filled in (auto)

    rng = np.random.RandomState(1)
    pre_seq = (0.1 * rng.randn(2, 34, 28)).astype(np.float32)
    in_text = rng.randint(0, lang.n_words, (2, 34)).astype(np.int32)
    in_audio = (0.1 * rng.randn(2, 36267)).astype(np.float32)

    out, _, _, _ = bundle.generator.apply(
        gen_vars, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(in_audio), None, train=False)
    ref.eval()
    with torch.no_grad():
        t_out, *_ = ref(torch.tensor(pre_seq),
                        torch.tensor(in_text, dtype=torch.long),
                        torch.tensor(in_audio), None)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)


def test_import_pose_generator_speaker_z(ref_mods, tmp_path):
    """z_type=speaker: mu/logvar of the speaker latent are deterministic
    and must match (the sampled z itself uses independent RNGs)."""
    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args(z_type="speaker")
    lang = _make_vocab(ref_vocab, ["a", "b", "c"])
    spk = _make_vocab(ref_vocab, ["vid1", "vid2", "vid3", "vid4"],
                      insert_default_tokens=False)

    ref = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=spk)
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 1, "lang_model": lang,
                "speaker_model": spk, "pose_dim": 27,
                "gen_dict": ref.state_dict(), "dis_dict": None}, path)
    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)
    _, bundle, gen_vars, _, spk2, _ = load_checkpoint_and_model(
        out_path, jax.random.PRNGKey(0))
    assert spk2.n_words == spk.n_words

    rng = np.random.RandomState(2)
    pre_seq = (0.1 * rng.randn(2, 34, 28)).astype(np.float32)
    in_text = rng.randint(0, lang.n_words, (2, 34)).astype(np.int32)
    in_audio = (0.1 * rng.randn(2, 36267)).astype(np.float32)
    vids = np.array([1, 3], np.int32)

    _, _, mu, logvar = bundle.generator.apply(
        gen_vars, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(in_audio), jnp.asarray(vids), train=False,
        rngs={"noise": jax.random.PRNGKey(5)})
    ref.eval()
    with torch.no_grad():
        _, _, t_mu, t_logvar = ref(torch.tensor(pre_seq),
                                   torch.tensor(in_text, dtype=torch.long),
                                   torch.tensor(in_audio),
                                   torch.tensor(vids, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(),
                               atol=1e-5)


def test_import_conv_discriminator(ref_mods, tmp_path):
    ref_mmc, _, ref_vocab = ref_mods
    from gesture_generation_from_trimodal_context_tpu.train.checkpoint import (
        load_checkpoint)
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from flax import serialization

    args = _mmc_args()
    lang = _make_vocab(ref_vocab, ["x", "y"])
    gen = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=None)
    dis = ref_mmc.ConvDiscriminator(27)
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 0, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": gen.state_dict(),
                "dis_dict": dis.state_dict()}, path)
    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)

    ckpt = load_checkpoint(out_path)
    bundle = factory.init_model(ckpt["args"], ckpt["lang_model"],
                                ckpt["speaker_model"], ckpt["pose_dim"])
    template = factory.discriminator_init_variables(
        bundle, ckpt["args"], jax.random.PRNGKey(0), batch_size=1)
    dis_vars = serialization.from_bytes(template, ckpt["dis_vars_bytes"])

    rng = np.random.RandomState(3)
    poses = (0.1 * rng.randn(2, 34, 27)).astype(np.float32)
    ours = bundle.discriminator.apply(dis_vars, jnp.asarray(poses),
                                      train=False)
    dis.eval()
    with torch.no_grad():
        theirs = dis(torch.tensor(poses)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_import_fgd_autoencoder_and_evaluator(ref_mods, tmp_path):
    """The FGD-net checkpoint (train_feature_extractor.py:155-157 format,
    no vocabs) imports, and EmbeddingSpaceEvaluator can consume the TORCH
    file directly — so eval_net_path can point at the released
    train_h36m_gesture_autoencoder checkpoint unchanged."""
    _, ref_embed, _ = ref_mods
    from gesture_generation_from_trimodal_context_tpu.models.evaluator import (
        EmbeddingSpaceEvaluator)

    args = SimpleNamespace(
        model="gesture_autoencoder", n_poses=34, n_pre_poses=4,
        hidden_size=200, n_layers=2, dropout_prob=0.3,
        input_context="both", freeze_wordembed=False, wordembed_dim=0,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    ref = ref_embed.EmbeddingNet(None, 27, 34, None, None, None, mode="pose")
    path = os.path.join(str(tmp_path), "fgd.bin")
    torch.save({"args": args, "epoch": 99, "pose_dim": 27,
                "gen_dict": ref.state_dict()}, path)

    out_path = os.path.join(str(tmp_path), "fgd.mpk")
    torch_import.import_checkpoint(path, out_path)
    _, bundle, gen_vars, _, _, _ = load_checkpoint_and_model(
        out_path, jax.random.PRNGKey(0))

    rng = np.random.RandomState(4)
    poses = (0.2 * rng.randn(3, 34, 27)).astype(np.float32)
    _, _, _, feat, mu, _, recon = bundle.generator.apply(
        gen_vars, None, None, None, jnp.asarray(poses), "pose", train=False)
    ref.eval()
    with torch.no_grad():
        _, _, _, t_feat, _, _, t_recon = ref(
            None, None, None, torch.tensor(poses), "pose",
            variational_encoding=False)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), t_recon.numpy(), atol=1e-3)

    # the evaluator auto-detects and converts the torch file itself
    ev = EmbeddingSpaceEvaluator(args, path)
    ev.push_samples(None, None, jnp.asarray(poses), jnp.asarray(poses))
    frechet, feat_dist = ev.get_scores()
    assert abs(frechet) < 1e-6 and feat_dist < 1e-6


def test_import_seq2seq(ref_mods, tmp_path):
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
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 3, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": ref.state_dict(), "dis_dict": None}, path)
    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)
    _, bundle, gen_vars, _, _, _ = load_checkpoint_and_model(
        out_path, jax.random.PRNGKey(0))

    rng = np.random.RandomState(5)
    words = rng.randint(1, lang.n_words, (2, 9)).astype(np.int32)
    words[1, 6:] = 0
    lengths = np.array([9, 6], np.int32)
    poses = (0.1 * rng.randn(2, 34, 27)).astype(np.float32)
    ours = bundle.generator.apply(gen_vars, jnp.asarray(words),
                                  jnp.asarray(lengths), jnp.asarray(poses),
                                  train=False)
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.tensor(words, dtype=torch.long),
                     torch.tensor(lengths, dtype=torch.long),
                     torch.tensor(poses), None).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)


def test_import_speech2gesture(ref_mods, tmp_path):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from test_reference_parity import _SanitizedConvInit
    import model.speech2gesture as ref_s2g
    _, _, ref_vocab = ref_mods
    from gesture_generation_from_trimodal_context_tpu.train.checkpoint import (
        load_checkpoint)
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from flax import serialization

    lang = _make_vocab(ref_vocab, ["p", "q"])
    args = SimpleNamespace(
        model="speech2gesture", n_poses=34, n_pre_poses=4, hidden_size=16,
        n_layers=2, dropout_prob=0.1, wordembed_dim=16,
        input_context="audio", freeze_wordembed=False,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    with _SanitizedConvInit():
        gen = ref_s2g.Generator(34, 27, 4)
        dis = ref_s2g.Discriminator(27)
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 2, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": gen.state_dict(),
                "dis_dict": dis.state_dict()}, path)
    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)
    _, bundle, gen_vars, _, _, _ = load_checkpoint_and_model(
        out_path, jax.random.PRNGKey(0))

    rng = np.random.RandomState(6)
    spec = rng.randn(2, 128, 70).astype(np.float32)
    pre = (0.1 * rng.randn(2, 4, 27)).astype(np.float32)
    ours = bundle.generator.apply(gen_vars, jnp.asarray(spec),
                                  jnp.asarray(pre), train=False)
    gen.eval()
    with torch.no_grad():
        theirs = gen(torch.tensor(spec), torch.tensor(pre)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)

    ckpt = load_checkpoint(out_path)
    dis_template = factory.discriminator_init_variables(
        bundle, ckpt["args"], jax.random.PRNGKey(0), batch_size=1)
    dis_vars = serialization.from_bytes(dis_template,
                                        ckpt["dis_vars_bytes"])
    d_ours = bundle.discriminator.apply(dis_vars, jnp.asarray(ours),
                                        train=False)
    dis.eval()
    with torch.no_grad():
        d_theirs = dis(torch.tensor(theirs)).numpy()
    np.testing.assert_allclose(np.asarray(d_ours)[:, :, 0],
                               d_theirs[:, 0, :], atol=1e-3)


def test_import_joint_embedding(ref_mods, tmp_path):
    """joint_embed: deterministic branches (pose latent + decoder driven
    by the pose latent via input_mode='pose', context mu/logvar)."""
    _, ref_embed, ref_vocab = ref_mods

    lang = _make_vocab(ref_vocab, ["m%d" % i for i in range(10)], dim=16)
    args = SimpleNamespace(
        model="joint_embedding", n_poses=34, n_pre_poses=4, hidden_size=24,
        n_layers=2, dropout_prob=0.3, wordembed_dim=16,
        input_context="both", freeze_wordembed=False,
        motion_resampling_framerate=15, z_type="none", mean_dir_vec=[[0.0]])
    ref = ref_embed.EmbeddingNet(args, 27, 34, lang.n_words, 16, None,
                                 mode="random")
    path = os.path.join(str(tmp_path), "ref.bin")
    torch.save({"args": args, "epoch": 5, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": ref.state_dict(), "dis_dict": None}, path)
    out_path = os.path.join(str(tmp_path), "ours.mpk")
    torch_import.import_checkpoint(path, out_path)
    _, bundle, gen_vars, _, _, _ = load_checkpoint_and_model(
        out_path, jax.random.PRNGKey(0))

    rng = np.random.RandomState(7)
    in_text = rng.randint(0, lang.n_words, (2, 34)).astype(np.int32)
    in_audio = (0.1 * rng.randn(2, 36267)).astype(np.float32)
    pre = (0.1 * rng.randn(2, 4, 27)).astype(np.float32)
    poses = (0.1 * rng.randn(2, 34, 27)).astype(np.float32)

    (_, c_mu, c_lv, pose_feat, _, _, out) = bundle.generator.apply(
        gen_vars, jnp.asarray(in_text), jnp.asarray(in_audio),
        jnp.asarray(pre), jnp.asarray(poses), "pose", train=False,
        rngs={"noise": jax.random.PRNGKey(9)})
    ref.eval()
    with torch.no_grad():
        (_, t_cmu, t_clv, t_pose_feat, _, _, t_out) = ref(
            torch.tensor(in_text, dtype=torch.long),
            torch.tensor(in_audio), torch.tensor(pre),
            torch.tensor(poses), "pose", variational_encoding=False)
    np.testing.assert_allclose(np.asarray(c_mu), t_cmu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_lv), t_clv.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pose_feat), t_pose_feat.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-3)


def test_synthesize_from_db_clip_with_torch_checkpoint(ref_mods, tmp_path,
                                                       monkeypatch):
    """VERDICT done-criterion: `synthesize.py from_db_clip` runs
    end-to-end directly from a reference-format torch checkpoint
    (auto-detected + converted in memory), down to the PKL/GIF artifacts.
    """
    import pickle
    from gesture_generation_from_trimodal_context_tpu.data import synthetic
    import scripts.synthesize as synth_cli

    ref_mmc, _, ref_vocab = ref_mods
    args = _mmc_args()
    # from_db_clip needs the real recipe statistics in the saved args
    args.mean_dir_vec = synthetic.MEAN_DIR_VEC.ravel().tolist()
    args.mean_pose = synthetic.MEAN_POSE.tolist()

    base = tmp_path / "ted"
    synthetic.make_synthetic_raw_store(str(base / "lmdb_test"), n_videos=2,
                                       clips_per_video=1,
                                       clip_duration_s=8.0, seed=11)
    store_words = []
    from gesture_generation_from_trimodal_context_tpu.data.storage import (
        open_raw_store)
    for v in open_raw_store(str(base / "lmdb_test")).iter_videos():
        for clip in v["clips"]:
            store_words.extend(w[0] for w in clip["words"])
    lang = _make_vocab(ref_vocab, sorted(set(store_words)))

    ref = ref_mmc.PoseGenerator(args, pose_dim=27, n_words=lang.n_words,
                                word_embed_size=16, word_embeddings=None,
                                z_obj=None)
    path = os.path.join(str(tmp_path), "ref_full.bin")
    torch.save({"args": args, "epoch": 3, "lang_model": lang,
                "speaker_model": None, "pose_dim": 27,
                "gen_dict": ref.state_dict(), "dis_dict": None}, path)
    assert torch_import.is_torch_checkpoint(path)

    monkeypatch.chdir(tmp_path)
    synth_cli.main("from_db_clip", path, 1, data_base=str(base))

    results = tmp_path / "output" / "generation_results"
    pkls = list(results.glob("*.pkl"))
    assert len(pkls) == 1, list(results.iterdir())
    with open(pkls[0], "rb") as f:
        d = pickle.load(f)
    assert set(d) >= {"sentence", "audio", "out_dir_vec", "out_poses",
                      "human_dir_vec", "aux_info"}
    assert np.isfinite(d["out_dir_vec"]).all()
