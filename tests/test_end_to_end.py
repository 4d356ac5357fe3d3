"""End-to-end integration: synthetic data -> FGD autoencoder training ->
multimodal_context GAN training with FGD eval -> checkpoint reload.

This is SURVEY.md §7.2's 'minimum end-to-end slice' plus the proposed
model, on an 8-virtual-device CPU mesh."""

import os

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.config import parse_args_mod as cfg
from gesture_generation_from_trimodal_context_tpu.data import synthetic
from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    BatchIterator, SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.vocab import build_vocab
from gesture_generation_from_trimodal_context_tpu.models.evaluator import (
    EmbeddingSpaceEvaluator)
from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib
from gesture_generation_from_trimodal_context_tpu.train.loops import train_epochs

import scripts.train_feature_extractor as tfe


def _cfg(name):
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg
    return os.path.join(os.path.dirname(cfg_pkg.__file__), name)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    for split in ("lmdb_train", "lmdb_val", "lmdb_test"):
        synthetic.make_synthetic_raw_store(
            str(root / split), n_videos=3, clips_per_video=1,
            clip_duration_s=8.0, seed=hash(split) % 1000)
    synthetic.make_synthetic_h36m(str(root / "h36m.npz"),
                                  n_frames_per_action=400)
    return root


@pytest.fixture(scope="module")
def fgd_ckpt(workdir):
    """Train the FGD autoencoder 2 epochs on synthetic H3.6M."""
    args = cfg.parse_args([
        "--config", _cfg("gesture_autoencoder.yml"),
        "--model_save_path", str(workdir / "fgd"),
        "--batch_size", "16", "--random_seed", "5",
        "--save_result_video", "false"])
    best = tfe.main(args, h36m_path=str(workdir / "h36m.npz"),
                    trial_epochs=2)
    assert np.isfinite(best[0])
    path = str(workdir / "fgd" / "gesture_autoencoder_checkpoint_best.bin")
    assert os.path.exists(path)
    return path


def _make_loaders(workdir, args):
    mean_dir_vec = np.array(args.mean_dir_vec).reshape(-1, 3)
    train_ds = SpeechMotionDataset(
        str(workdir / "lmdb_train"), n_poses=args.n_poses,
        subdivision_stride=args.subdivision_stride,
        pose_resampling_fps=args.motion_resampling_framerate,
        mean_dir_vec=mean_dir_vec, mean_pose=args.mean_pose)
    val_ds = SpeechMotionDataset(
        str(workdir / "lmdb_val"), n_poses=args.n_poses,
        subdivision_stride=args.subdivision_stride,
        pose_resampling_fps=args.motion_resampling_framerate,
        speaker_model=train_ds.speaker_model,
        mean_dir_vec=mean_dir_vec, mean_pose=args.mean_pose)
    lang = build_vocab("words", [train_ds, val_ds],
                       str(workdir / "vocab_cache.pkl"), "", 300)
    lang.load_word_vectors("", args.wordembed_dim)
    train_ds.set_lang_model(lang)
    val_ds.set_lang_model(lang)
    return train_ds, val_ds, lang


def test_fgd_autoencoder_trains(fgd_ckpt):
    ckpt = ckpt_lib.load_checkpoint(fgd_ckpt)
    assert ckpt["pose_dim"] == 27
    assert ckpt["args"].model == "gesture_autoencoder"


def test_multimodal_context_end_to_end(workdir, fgd_ckpt):
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(workdir / "mmc"),
        "--batch_size", "8", "--random_seed", "7",
        "--hidden_size", "32", "--n_layers", "2",
        "--wordembed_dim", "16", "--wordembed_path", "",
        "--eval_net_path", fgd_ckpt,
        "--loss_warmup", "0",  # exercise the GAN path in 2 epochs
        "--save_result_video", "false"])
    # the FGD net was trained with its own args; evaluator must rebuild
    # from the checkpoint's embedded args (self-describing property)
    train_ds, val_ds, lang = _make_loaders(workdir, args)
    train_loader = BatchIterator(train_ds, 8, shuffle=True, prefetch=0)
    test_loader = BatchIterator(val_ds, 8, shuffle=False, prefetch=0)

    gen_state, dis_state, best = train_epochs(
        args, train_loader, test_loader, lang, pose_dim=27,
        speaker_model=train_ds.speaker_model, trial_epochs=2)

    assert "frechet" in best
    assert np.isfinite(best["loss"][0])
    ckpt_path = str(workdir / "mmc" / "multimodal_context_checkpoint_best.bin")
    assert os.path.exists(ckpt_path)

    # reload and run a forward from the self-describing checkpoint
    args2, bundle, gen_vars, lang2, spk2, pose_dim = \
        ckpt_lib.load_checkpoint_and_model(ckpt_path, jax.random.PRNGKey(0))
    assert pose_dim == 27
    assert spk2.n_words == train_ds.speaker_model.n_words
    batch = val_ds.make_batch(np.arange(2))
    import jax.numpy as jnp
    from gesture_generation_from_trimodal_context_tpu.train.common import (
        build_pre_seq)
    pre_seq = build_pre_seq(jnp.asarray(batch["target_vec"]), args2.n_pre_poses)
    out, z, mu, lv = bundle.generator.apply(
        gen_vars, pre_seq, jnp.asarray(batch["in_text"]),
        jnp.asarray(batch["in_audio"]), jnp.zeros((2,), jnp.int32),
        train=False, rngs={"noise": jax.random.PRNGKey(1)})
    assert out.shape == (2, 34, 27)
    assert np.isfinite(np.asarray(out)).all()


def test_evaluator_standalone(workdir, fgd_ckpt):
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(workdir / "ev")])
    ev = EmbeddingSpaceEvaluator(args, fgd_ckpt)
    rng = np.random.RandomState(0)
    real = rng.randn(16, 34, 27).astype(np.float32) * 0.1
    fake = real + 0.05 * rng.randn(16, 34, 27).astype(np.float32)
    ev.push_samples(None, None, fake, real)
    ev.push_samples(None, None, fake + 0.01, real)
    fgd, feat = ev.get_scores()
    assert np.isfinite(fgd) and fgd >= 0
    # identical distributions give ~0 FGD
    ev.reset()
    ev.push_samples(None, None, real, real)
    ev.push_samples(None, None, real + 1e-6, real)
    fgd_same, _ = ev.get_scores()
    assert fgd_same < fgd


def test_resume_training(workdir, fgd_ckpt):
    """Resume (beyond-reference feature): restart from a checkpoint with
    optimizer state and continue at the right epoch."""
    args = cfg.parse_args([
        "--config", _cfg("gesture_autoencoder.yml"),
        "--model_save_path", str(workdir / "resume"),
        "--batch_size", "8", "--random_seed", "3",
        "--save_result_video", "false"])
    train_ds, val_ds, lang = _make_loaders(workdir, args)
    train_loader = BatchIterator(train_ds, 8, shuffle=True, prefetch=0)
    test_loader = BatchIterator(val_ds, 8, shuffle=False, prefetch=0)

    train_epochs(args, train_loader, test_loader, lang, pose_dim=27,
                 speaker_model=train_ds.speaker_model, trial_epochs=1)
    ckpt_path = str(workdir / "resume" /
                    "gesture_autoencoder_checkpoint_best.bin")
    assert os.path.exists(ckpt_path)
    ckpt0 = ckpt_lib.load_checkpoint(ckpt_path)
    assert ckpt0["epoch"] == 0
    assert len(ckpt0["gen_opt_bytes"]) > 0

    args.resume_checkpoint = ckpt_path
    _, _, best = train_epochs(args, train_loader, test_loader, lang,
                              pose_dim=27,
                              speaker_model=train_ds.speaker_model,
                              trial_epochs=2)
    # epoch 0 was skipped; the loop ran epoch 1 only
    assert all(ep == 1 for _, ep in best.values())


@pytest.mark.parametrize("model_cfg,overrides", [
    ("seq2seq.yml", ["--hidden_size", "32", "--wordembed_dim", "16"]),
    ("joint_embed.yml", ["--hidden_size", "24", "--n_layers", "2",
                         "--wordembed_dim", "16"]),
    ("speech2gesture.yml", []),
])
def test_baseline_models_train_one_epoch(workdir, model_cfg, overrides):
    """Every baseline family runs one epoch end to end through the same
    driver (reference train.py dispatches all five the same way)."""
    name = model_cfg.split(".")[0]
    args = cfg.parse_args([
        "--config", _cfg(model_cfg),
        "--model_save_path", str(workdir / name),
        "--batch_size", "8", "--random_seed", "11",
        "--eval_net_path", "",      # skip FGD for speed
        "--wordembed_path", "",
        "--save_result_video", "false"] + overrides)
    train_ds, val_ds, lang = _make_loaders(workdir, args)
    if args.wordembed_dim and lang.word_embedding_weights is not None and \
            lang.word_embedding_weights.shape[1] != args.wordembed_dim:
        lang.load_word_vectors("", args.wordembed_dim)
    train_loader = BatchIterator(train_ds, 8, shuffle=True, prefetch=0)
    test_loader = BatchIterator(val_ds, 8, shuffle=False, prefetch=0)

    _, _, best = train_epochs(args, train_loader, test_loader, lang,
                              pose_dim=27,
                              speaker_model=train_ds.speaker_model,
                              trial_epochs=1)
    assert np.isfinite(best["loss"][0])


def test_multimodal_fused_steps_per_call(workdir, fgd_ckpt):
    """steps_per_call>1 runs the fused multi-step path through the driver."""
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(workdir / "mmc_fused"),
        "--batch_size", "8", "--random_seed", "7",
        "--hidden_size", "32", "--n_layers", "2",
        "--wordembed_dim", "16", "--wordembed_path", "",
        "--eval_net_path", "", "--loss_warmup", "0",
        "--steps_per_call", "2",
        "--save_result_video", "false"])
    train_ds, val_ds, lang = _make_loaders(workdir, args)
    if lang.word_embedding_weights is not None and \
            lang.word_embedding_weights.shape[1] != args.wordembed_dim:
        lang.load_word_vectors("", args.wordembed_dim)
    train_loader = BatchIterator(train_ds, 8, shuffle=True, prefetch=0)
    test_loader = BatchIterator(val_ds, 8, shuffle=False, prefetch=0)
    _, _, best = train_epochs(args, train_loader, test_loader, lang,
                              pose_dim=27,
                              speaker_model=train_ds.speaker_model,
                              trial_epochs=1)
    assert np.isfinite(best["loss"][0])


def test_multimodal_fused_eval_pass_with_fgd(workdir, fgd_ckpt):
    """Resident mode on a 1-device data mesh activates the fused
    one-dispatch validation pass (train/loops.py
    evaluate_testset_resident_fused) with the REAL FGD embedding net
    running inside the scan; FGD must come out finite and the run must
    checkpoint.  --eval_full_set exercises the masked tail row through
    the real embed path too."""
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", str(workdir / "mmc_fused_eval"),
        "--batch_size", "8", "--random_seed", "7",
        "--hidden_size", "32", "--n_layers", "2",
        "--wordembed_dim", "16", "--wordembed_path", "",
        "--eval_net_path", fgd_ckpt, "--loss_warmup", "0",
        "--device_resident_data", "true", "--dp_devices", "1",
        "--eval_full_set", "true",
        "--save_result_video", "false"])
    train_ds, val_ds, lang = _make_loaders(workdir, args)
    if lang.word_embedding_weights is not None and \
            lang.word_embedding_weights.shape[1] != args.wordembed_dim:
        lang.load_word_vectors("", args.wordembed_dim)
    train_loader = BatchIterator(train_ds, 8, shuffle=True, prefetch=0)
    test_loader = BatchIterator(val_ds, 8, shuffle=False, prefetch=0)
    _, _, best = train_epochs(args, train_loader, test_loader, lang,
                              pose_dim=27,
                              speaker_model=train_ds.speaker_model,
                              trial_epochs=1)
    assert np.isfinite(best["loss"][0])
    assert "frechet" in best and np.isfinite(best["frechet"][0])


def test_feature_extractor_steps_per_call(workdir):
    """--steps_per_call fuses K FGD-AE iterations per dispatch via the
    same scan fusion the main driver uses; an epoch count not divisible
    by K exercises the singleton tail path too."""
    args = cfg.parse_args([
        "--config", _cfg("gesture_autoencoder.yml"),
        "--model_save_path", str(workdir / "fgd_spc"),
        "--batch_size", "16", "--random_seed", "5",
        "--steps_per_call", "3",
        "--save_result_video", "false"])
    best = tfe.main(args, h36m_path=str(workdir / "h36m.npz"),
                    trial_epochs=2)
    assert np.isfinite(best[0])
    assert os.path.exists(
        str(workdir / "fgd_spc" /
            "gesture_autoencoder_checkpoint_best.bin"))


def test_feature_extractor_h36m_augment(workdir):
    """--h36m_augment: the reference's implemented-but-unused gaussian
    joint-noise path (reference h36m_loader.py:44-56) trains when opted
    in and still converges to a finite best loss."""
    args = cfg.parse_args([
        "--config", _cfg("gesture_autoencoder.yml"),
        "--model_save_path", str(workdir / "fgd_aug"),
        "--batch_size", "16", "--random_seed", "5",
        "--h36m_augment", "true",
        "--save_result_video", "false"])
    best = tfe.main(args, h36m_path=str(workdir / "h36m.npz"),
                    trial_epochs=1)
    assert np.isfinite(best[0])
