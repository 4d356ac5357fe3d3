"""Human3.6M windows for FGD-autoencoder training.

Behavioral contract: reference scripts/data_loader/h36m_loader.py:14-107.
12 upper-body joints from data_3d_h36m.npz, hip-centering, y/z axis swap
with y inversion, hip-based frontalization on the XZ plane, 34-frame
windows with stride 10 and frame-stride 2; windows are converted
pose -> dir-vec -> pose -> dir-vec (the reference's double round trip,
which snaps bones to canonical lengths) and mean-centered.
"""

import math
import numpy as np

from ..ops import skeleton

TRAIN_SUBJECTS = ("S1", "S5", "S6", "S7", "S8", "S9", "S11")
TEST_SUBJECTS = ("S11",)
TARGET_JOINTS = (1, 6, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27)
N_POSES = 34
FRAME_STRIDE = 2
WINDOW_STRIDE = 10


def rotation_matrix(axis, theta):
    """Counterclockwise rotation about ``axis`` by ``theta`` radians
    (reference h36m_loader.py:92-106)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / math.sqrt(np.dot(axis, axis))
    a = math.cos(theta / 2.0)
    b, c, d = -axis * math.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array([[aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
                     [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
                     [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc]])


def normalize_h36m(data):
    """Hip-center, swap axes, frontalize, drop hip joints
    (reference h36m_loader.py:69-90)."""
    data = np.array(data, dtype=np.float64)
    data = data - data[:, 2:3]
    data = data[:, :, (0, 2, 1)]     # xy exchange
    data[:, :, 1] = -data[:, :, 1]   # invert y

    for f in range(data.shape[0]):
        hip_vec = data[f, 1] - data[f, 0]
        angle = np.pi - math.atan2(hip_vec[2], hip_vec[0])
        if 180 < np.rad2deg(angle) < 360:
            angle = angle - np.deg2rad(360)
        data[f] = data[f] @ rotation_matrix([0, 1, 0], angle)

    return data[:, 2:]


class Human36M:
    def __init__(self, path, mean_data, is_train=True, augment=False):
        self.augment = augment
        self.mean_data = np.asarray(mean_data)
        self.data = []
        subjects = TRAIN_SUBJECTS if is_train else TEST_SUBJECTS

        npz = np.load(path, allow_pickle=True)
        positions_3d = npz["positions_3d"].item()
        for subject, actions in positions_3d.items():
            if subject not in subjects:
                continue
            for positions in actions.values():
                positions = positions[:, TARGET_JOINTS]
                positions = normalize_h36m(positions)
                for f in range(0, len(positions), WINDOW_STRIDE):
                    if f + N_POSES * FRAME_STRIDE > len(positions):
                        break
                    self.data.append(
                        positions[f:f + N_POSES * FRAME_STRIDE:FRAME_STRIDE])

    def __len__(self):
        return len(self.data)

    def get_sample(self, index, rng=None):
        poses = self.data[index]
        dir_vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
        poses = skeleton.convert_dir_vec_to_pose_np(dir_vec)

        if self.augment and rng is not None:
            # gaussian joint noise (reference h36m_loader.py:49-56)
            if rng.rand() < 0.2:
                poses = poses + rng.normal(0, 0.002 ** 0.5, poses.shape)
            else:
                poses = poses + rng.normal(0, 0.0001 ** 0.5, poses.shape)

        dir_vec = skeleton.convert_pose_seq_to_dir_vec_np(poses)
        dir_vec = dir_vec.reshape(dir_vec.shape[0], -1)
        dir_vec = dir_vec - self.mean_data
        return poses.astype(np.float32), dir_vec.astype(np.float32)

    def make_batch(self, indices, rng=None):
        poses, vecs = zip(*(self.get_sample(int(i), rng) for i in indices))
        return {"pose_seq": np.stack(poses),
                "target_vec": np.stack(vecs)}
