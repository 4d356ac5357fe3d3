"""Skeleton math: 10-joint / 9-bone upper-body model.

Behavioral contract (reference scripts/utils/data_utils.py:12-120):
- ``DIR_VEC_PAIRS``: bone adjacency (parent, child) with fixed bone lengths,
- pose sequence -> unit direction vectors (``convert_pose_seq_to_dir_vec``),
- direction vectors -> joint positions via forward kinematics along the
  chain (``convert_dir_vec_to_pose``),
- linear pose resampling with extrapolation (``resample_pose_seq``,
  matching scipy.interp1d(kind='linear', fill_value='extrapolate')).

Everything is implemented twice with identical semantics:
- ``*_np``: vectorized numpy for the host-side data pipeline,
- jnp versions (same names, arrays in -> arrays out) that are jit/vmap
  friendly (static unrolled loop over the 9 bones) for in-graph eval
  metrics and Pallas-free device-side postprocessing.
"""

import numpy as np
import jax.numpy as jnp

# (parent, child, bone_length) — 9 bones over 10 joints
# (reference scripts/utils/data_utils.py:14-15)
DIR_VEC_PAIRS = (
    (0, 1, 0.26), (1, 2, 0.18), (2, 3, 0.14),
    (1, 4, 0.22), (4, 5, 0.36), (5, 6, 0.33),
    (1, 7, 0.22), (7, 8, 0.36), (8, 9, 0.33),
)

# Matplotlib colors used by the video writer for each bone
# (reference scripts/utils/data_utils.py:12-13)
SKELETON_LINE_PAIRS = (
    (0, 1, "b"), (1, 2, "darkred"), (2, 3, "r"), (3, 4, "orange"),
    (1, 5, "darkgreen"), (5, 6, "limegreen"), (6, 7, "darkseagreen"),
)

N_JOINTS = 10
N_BONES = len(DIR_VEC_PAIRS)  # 9
POSE_DIM = N_BONES * 3        # 27 — the model's output dimensionality

_PARENTS = np.array([p[0] for p in DIR_VEC_PAIRS])
_CHILDREN = np.array([p[1] for p in DIR_VEC_PAIRS])
_LENGTHS = np.array([p[2] for p in DIR_VEC_PAIRS])


def _as_joints(x, xp):
    """Reshape trailing flat dim to (..., J, 3) if needed."""
    if x.shape[-1] != 3:
        x = x.reshape(x.shape[:-1] + (-1, 3))
    return x


def convert_pose_seq_to_dir_vec_np(pose):
    """Poses (..., 10, 3) or (..., 30) -> unit bone vectors (..., 9, 3).

    Zero-length bones stay zero vectors (sklearn.preprocessing.normalize
    semantics used by the reference, data_utils.py:109).
    """
    pose = _as_joints(np.asarray(pose), np)
    diff = pose[..., _CHILDREN, :] - pose[..., _PARENTS, :]
    norm = np.linalg.norm(diff, axis=-1, keepdims=True)
    safe = np.where(norm == 0, 1.0, norm)
    return diff / safe


def convert_dir_vec_to_pose_np(vec):
    """Unit bone vectors (..., 9, 3) or (..., 27) -> joint positions (..., 10, 3).

    Root joint 0 at origin; child = parent + bone_length * vec (forward
    kinematics along DIR_VEC_PAIRS order, reference data_utils.py:77-98).
    """
    vec = _as_joints(np.asarray(vec), np)
    out = np.zeros(vec.shape[:-2] + (N_JOINTS, 3), dtype=np.float64)
    for b, (parent, child, length) in enumerate(DIR_VEC_PAIRS):
        out[..., child, :] = out[..., parent, :] + length * vec[..., b, :]
    return out


def convert_pose_seq_to_dir_vec(pose):
    """jnp twin of convert_pose_seq_to_dir_vec_np (jit/vmap friendly)."""
    if pose.shape[-1] != 3:
        pose = pose.reshape(pose.shape[:-1] + (-1, 3))
    diff = pose[..., _CHILDREN, :] - pose[..., _PARENTS, :]
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    safe = jnp.where(norm == 0, 1.0, norm)
    return diff / safe


def convert_dir_vec_to_pose(vec):
    """jnp twin of convert_dir_vec_to_pose_np.

    The 9-bone chain is statically unrolled; XLA fuses this into a handful
    of adds, so there is no scatter/dynamic-update cost on TPU.
    """
    if vec.shape[-1] != 3:
        vec = vec.reshape(vec.shape[:-1] + (-1, 3))
    zeros = jnp.zeros(vec.shape[:-2] + (3,), dtype=vec.dtype)
    joints = [zeros] * N_JOINTS
    for b, (parent, child, length) in enumerate(DIR_VEC_PAIRS):
        joints[child] = joints[parent] + length * vec[..., b, :]
    return jnp.stack(joints, axis=-2)


def resample_pose_seq(poses, duration_in_sec, fps):
    """Linear-resample a pose sequence to ``duration * fps`` frames.

    Matches reference data_utils.py:46-56 exactly: sample positions are
    ``np.arange(0, n, n / (duration * fps))`` against knots 0..n-1, with
    linear extrapolation beyond the last knot (scipy interp1d
    fill_value='extrapolate' semantics).
    """
    poses = np.asarray(poses)
    n = len(poses)
    expected_n = duration_in_sec * fps
    x_new = np.arange(0, n, n / expected_n)

    flat = poses.reshape(n, -1).astype(np.float64)
    idx = np.clip(np.floor(x_new).astype(np.int64), 0, n - 2)
    frac = x_new - idx
    out = flat[idx] * (1.0 - frac[:, None]) + flat[idx + 1] * frac[:, None]
    out = out.reshape((len(x_new),) + poses.shape[1:])
    if hasattr(poses, "dtype"):
        out = out.astype(poses.dtype)
    return out
