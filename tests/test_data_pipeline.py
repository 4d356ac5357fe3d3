"""End-to-end data pipeline tests on synthetic fixtures: raw store ->
cache builder -> dataset batches (SURVEY.md §4 plan (c))."""

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.data import synthetic
from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    BatchIterator, SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.ggpack import GGPackStore
from gesture_generation_from_trimodal_context_tpu.data.motion_filter import MotionFilter
from gesture_generation_from_trimodal_context_tpu.data.motion_stats import (
    calculate_data_mean)
from gesture_generation_from_trimodal_context_tpu.data.preprocessor import (
    DataPreprocessor, get_words_in_time_range)
from gesture_generation_from_trimodal_context_tpu.data.storage import (
    GGRawStore, open_raw_store)
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab, build_vocab
from gesture_generation_from_trimodal_context_tpu.data.h36m import Human36M

N_POSES = 34
FPS = 15


@pytest.fixture(scope="module")
def raw_store_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("ted") / "lmdb_train"
    synthetic.make_synthetic_raw_store(str(path), n_videos=3,
                                       clips_per_video=2, clip_duration_s=8.0)
    return str(path)


@pytest.fixture(scope="module")
def dataset(raw_store_dir):
    ds = SpeechMotionDataset(
        raw_store_dir, n_poses=N_POSES, subdivision_stride=10,
        pose_resampling_fps=FPS,
        mean_pose=synthetic.MEAN_POSE,
        mean_dir_vec=synthetic.MEAN_DIR_VEC.flatten())
    lang = Vocab("words")
    for v in ds.raw_store().iter_videos():
        for clip in v["clips"]:
            for w in clip["words"]:
                lang.index_word(w[0])
    ds.set_lang_model(lang)
    return ds


def test_raw_store_roundtrip(raw_store_dir):
    store = open_raw_store(raw_store_dir)
    assert isinstance(store, GGRawStore)
    videos = list(store.iter_videos())
    assert len(videos) == 3
    clip = videos[0]["clips"][0]
    assert clip["skeletons_3d"].shape[1:] == (10, 3)
    assert clip["audio_feat"].shape[0] == 128
    assert len(clip["words"]) > 5
    # audio/spectrogram length consistency (the cache builder asserts this)
    assert clip["audio_raw"].shape[0] == 8 * 16000


def test_words_in_time_range():
    words = [["a", 0.0, 0.5], ["b", 0.6, 1.0], ["c", 1.5, 2.0]]
    assert [w[0] for w in get_words_in_time_range(words, 0.4, 1.6)] == ["a", "b", "c"]
    assert [w[0] for w in get_words_in_time_range(words, 1.0, 1.4)] == []
    assert [w[0] for w in get_words_in_time_range(words, 0.5, 0.7)] == ["b"]


def test_motion_filter_rejects_static():
    static = np.tile(synthetic.MEAN_POSE.reshape(1, 10, 3) + 0.05,
                     (N_POSES, 1, 1))
    out, msg = MotionFilter(static, synthetic.MEAN_POSE).get()
    assert out == [] and msg == "motion"


def test_motion_filter_rejects_near_mean():
    near = np.tile(synthetic.MEAN_POSE.reshape(1, 10, 3), (N_POSES, 1, 1))
    near += np.random.RandomState(0).randn(N_POSES, 10, 3) * 0.001
    out, msg = MotionFilter(near, synthetic.MEAN_POSE).get()
    assert out == [] and msg == "pose"


def test_motion_filter_passes_synthetic_motion():
    rng = np.random.RandomState(0)
    poses = synthetic.synthetic_pose_sequence(N_POSES, FPS, rng)
    out, msg = MotionFilter(poses, synthetic.MEAN_POSE).get()
    assert msg == "PASS" and len(out) == N_POSES


def test_cache_builder_and_store(dataset):
    store = dataset.store
    assert len(store) > 10
    # extended window: 42 poses (round(34 * 1.25))
    assert store.arrays["vec_seq"].shape[1:] == (42, 9, 3)
    assert store.arrays["pose_seq"].shape[1:] == (42, 10, 3)
    assert store.arrays["audio"].shape[1] == int(42 / FPS * 16000)
    assert store.arrays["spectrogram"].shape[1] == 128
    # mean-centered dir-vecs: adding the mean back gives unit vectors
    vec = store.gather("vec_seq", np.arange(4)) + synthetic.MEAN_DIR_VEC
    np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-4)


def test_speaker_model(dataset):
    assert dataset.speaker_model.n_words == 4  # 3 vids + UNK
    assert "video_000" in dataset.speaker_model.word2index


def test_batch_shapes_and_content(dataset):
    batch = dataset.make_batch(np.arange(6))
    assert batch["target_vec"].shape == (6, N_POSES, 27)
    assert batch["pose_seq"].shape == (6, N_POSES, 30)
    assert batch["in_audio"].shape == (6, 36267)
    assert batch["in_spec"].shape == (6, 128, 70)
    assert batch["in_text"].shape == (6, N_POSES)
    assert batch["word_seq"].shape[0] == 6
    assert batch["word_seq"].shape[1] % 8 == 0
    # word ids start with SOS and contain EOS at length-1
    for j in range(6):
        assert batch["word_seq"][j, 0] == Vocab.SOS_token
        ln = batch["word_lengths"][j]
        assert batch["word_seq"][j, ln - 1] == Vocab.EOS_token
        assert (batch["word_seq"][j, ln:] == 0).all()
    # frame-aligned words: some nonzero entries, all valid indices
    assert batch["in_text"].max() > 3
    assert batch["in_text"].min() >= 0


def test_batch_iterator_drops_remainder(dataset):
    it = BatchIterator(dataset, batch_size=4, shuffle=True, seed=1)
    batches = list(it)
    assert len(batches) == len(dataset) // 4
    assert all(b["target_vec"].shape[0] == 4 for b in batches)


def test_build_vocab_and_embedding(dataset, tmp_path):
    cache = tmp_path / "vocab_cache.pkl"
    lang = build_vocab("words", [dataset], str(cache), None, 8)
    assert lang.n_words > 10
    lang.load_word_vectors("", 8)
    assert lang.word_embedding_weights.shape == (lang.n_words, 8)


def test_motion_stats(raw_store_dir):
    stats = calculate_data_mean(raw_store_dir)
    assert stats["mean_pose"].shape == (30,)
    assert stats["mean_dir_vec"].shape == (27,)
    assert len(stats["mean_bone_lengths"]) == 9
    # FK-generated poses have exact canonical bone lengths
    np.testing.assert_allclose(
        stats["mean_bone_lengths"],
        [p[2] for p in
         __import__("gesture_generation_from_trimodal_context_tpu.ops.skeleton",
                    fromlist=["x"]).DIR_VEC_PAIRS], atol=1e-5)


def test_h36m_loader(tmp_path):
    path = tmp_path / "h36m.npz"
    synthetic.make_synthetic_h36m(str(path), n_frames_per_action=200)
    train = Human36M(str(path), synthetic.MEAN_DIR_VEC.flatten(),
                     is_train=True)
    test = Human36M(str(path), synthetic.MEAN_DIR_VEC.flatten(),
                    is_train=False)
    assert len(train) > len(test) > 0
    batch = train.make_batch(np.arange(3))
    assert batch["target_vec"].shape == (3, 34, 27)
    assert batch["pose_seq"].shape == (3, 34, 10, 3)


def test_parallel_cache_build_matches_sequential(raw_store_dir, tmp_path):
    """Worker-pool cache builds must produce identical caches."""
    from gesture_generation_from_trimodal_context_tpu.data.ggpack import (
        GGPackStore)
    mdv = synthetic.MEAN_DIR_VEC
    outs = []
    for workers, name in ((0, "seq"), (3, "par")):
        out = str(tmp_path / name)
        DataPreprocessor(raw_store_dir, out, 42, 10, FPS,
                         synthetic.MEAN_POSE, mdv).run(n_workers=workers)
        outs.append(GGPackStore(out))
    seq, par = outs
    assert len(seq) == len(par)
    for field in ("vec_seq", "pose_seq", "audio", "spectrogram", "aux_num"):
        np.testing.assert_array_equal(
            np.asarray(seq.arrays[field]), np.asarray(par.arrays[field]))
    assert seq.words == par.words
    assert seq.vids == par.vids


def test_batch_iterator_worker_pool_deterministic(tmp_path):
    """Multi-worker batch assembly yields the SAME batches in the SAME
    order as the single-thread path, and worker errors surface."""
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.data.dataset import (
        BatchIterator)

    class _DS:
        def __len__(self):
            return 64

        def make_batch(self, idx):
            return {"target_vec": np.asarray(idx, np.int64)[:, None]}

    ds = _DS()
    ref = [b["target_vec"].ravel().tolist()
           for b in BatchIterator(ds, 8, shuffle=True, seed=3, prefetch=2,
                                  workers=1)]
    got = [b["target_vec"].ravel().tolist()
           for b in BatchIterator(ds, 8, shuffle=True, seed=3, prefetch=2,
                                  workers=4)]
    assert got == ref
    assert len(got) == 8

    class _Boom(_DS):
        def make_batch(self, idx):
            if int(idx[0]) >= 32:
                raise RuntimeError("boom")
            return super().make_batch(idx)

    with pytest.raises(RuntimeError, match="boom"):
        list(BatchIterator(_Boom(), 8, shuffle=False, prefetch=2,
                           workers=4))

    # abandoning the iterator mid-epoch must not deadlock
    it = iter(BatchIterator(ds, 8, shuffle=False, prefetch=2, workers=4))
    next(it)
    it.close()


def test_audio_int16_transfer_roundtrip(tmp_path):
    """--audio_int16_transfer: make_batch emits int16 PCM whose in-graph
    decode (train/common.decode_audio) matches the fp32 batch to PCM
    quantization precision (0.5/32767)."""
    import jax.numpy as jnp
    from gesture_generation_from_trimodal_context_tpu.data import synthetic
    from gesture_generation_from_trimodal_context_tpu.data.dataset import (
        SpeechMotionDataset)
    from gesture_generation_from_trimodal_context_tpu.train.common import (
        decode_audio)

    base = str(tmp_path / "lmdb_train")
    synthetic.make_synthetic_raw_store(base, n_videos=2, clips_per_video=1,
                                       clip_duration_s=8.0, seed=0)
    ds = SpeechMotionDataset(
        base, n_poses=34, subdivision_stride=10, pose_resampling_fps=15,
        mean_pose=synthetic.MEAN_POSE,
        mean_dir_vec=synthetic.MEAN_DIR_VEC)
    idx = np.arange(min(4, len(ds)))
    f32 = ds.make_batch(idx, {"in_audio"})["in_audio"]
    ds.audio_int16 = True
    i16 = ds.make_batch(idx, {"in_audio"})["in_audio"]
    assert i16.dtype == np.int16
    dec = np.asarray(decode_audio(jnp.asarray(i16)))
    assert np.abs(dec - f32).max() <= 0.5 / 32767.0 + 1e-7
    # fp32 batches pass through decode_audio untouched
    same = decode_audio(jnp.asarray(f32))
    np.testing.assert_array_equal(np.asarray(same), f32)
