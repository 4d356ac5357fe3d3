"""Golden tests for skeleton math against independently-computed values
(formulas from reference scripts/utils/data_utils.py:46-120)."""

import numpy as np
import pytest
import scipy.interpolate

from gesture_generation_from_trimodal_context_tpu.ops import skeleton


def _random_poses(rng, shape):
    return rng.randn(*shape).astype(np.float32)


def test_dir_vec_unit_norm(rng):
    poses = _random_poses(rng, (5, 10, 3))
    vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
    assert vec.shape == (5, 9, 3)
    norms = np.linalg.norm(vec, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_dir_vec_matches_reference_formula(rng):
    # reference: dir_vec[:, i] = normalize(pose[:, child] - pose[:, parent])
    poses = _random_poses(rng, (7, 10, 3)).astype(np.float64)
    vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
    for i, (parent, child, _) in enumerate(skeleton.DIR_VEC_PAIRS):
        d = poses[:, child] - poses[:, parent]
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        np.testing.assert_allclose(vec[:, i], d, atol=1e-12)


def test_dir_vec_zero_bone_stays_zero():
    poses = np.zeros((2, 10, 3))
    vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
    assert np.all(vec == 0)


def test_pose_roundtrip(rng):
    # random unit dir vecs -> pose -> dir vec must round trip
    raw = rng.randn(4, 9, 3)
    raw /= np.linalg.norm(raw, axis=-1, keepdims=True)
    pose = skeleton.convert_dir_vec_to_pose_np(raw)
    assert pose.shape == (4, 10, 3)
    back = skeleton.convert_pose_seq_to_dir_vec_np(pose)
    np.testing.assert_allclose(back, raw, atol=1e-9)


def test_pose_chain_lengths(rng):
    raw = rng.randn(9, 3)
    raw /= np.linalg.norm(raw, axis=-1, keepdims=True)
    pose = skeleton.convert_dir_vec_to_pose_np(raw)
    for parent, child, length in skeleton.DIR_VEC_PAIRS:
        np.testing.assert_allclose(
            np.linalg.norm(pose[child] - pose[parent]), length, atol=1e-9)


def test_flat_input_accepted(rng):
    poses = _random_poses(rng, (3, 30))
    vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
    assert vec.shape == (3, 9, 3)
    vec_flat = skeleton.convert_dir_vec_to_pose_np(vec.reshape(3, 27))
    assert vec_flat.shape == (3, 10, 3)


def test_jnp_matches_np(rng):
    poses = _random_poses(rng, (6, 10, 3))
    np.testing.assert_allclose(
        np.asarray(skeleton.convert_pose_seq_to_dir_vec(poses)),
        skeleton.convert_pose_seq_to_dir_vec_np(poses), atol=1e-5)
    vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
    np.testing.assert_allclose(
        np.asarray(skeleton.convert_dir_vec_to_pose(vec.astype(np.float32))),
        skeleton.convert_dir_vec_to_pose_np(vec), atol=1e-5)


@pytest.mark.parametrize("n,duration,fps", [(100, 4.0, 15), (77, 5.13, 15),
                                            (34, 2.2667, 15), (50, 2.0, 24)])
def test_resample_matches_scipy_interp1d(rng, n, duration, fps):
    poses = rng.randn(n, 10, 3)
    ours = skeleton.resample_pose_seq(poses, duration, fps)
    f = scipy.interpolate.interp1d(np.arange(n), poses, axis=0, kind="linear",
                                   fill_value="extrapolate")
    x_new = np.arange(0, n, n / (duration * fps))
    expected = f(x_new)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=1e-9)
