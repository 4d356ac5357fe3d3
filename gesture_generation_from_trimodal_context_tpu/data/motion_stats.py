"""Dataset motion statistics: source of the config mean_pose /
mean_dir_vec constants.

Behavioral contract: reference
scripts/data_loader/calculate_motion_stats.py:10-58 — mean pose, mean
direction vector, and mean bone lengths over every clip skeleton in the
training raw store.
"""

import numpy as np

from ..ops import skeleton
from .storage import open_raw_store


def calculate_data_mean(raw_store_dir):
    store = open_raw_store(raw_store_dir)
    pose_seq_list = []
    total_duration = 0.0
    for video in store.iter_videos():
        for clip in video["clips"]:
            pose_seq_list.append(np.asarray(clip["skeletons_3d"]))
            total_duration += clip["end_time"] - clip["start_time"]
    store.close()

    all_poses = np.vstack(pose_seq_list)
    mean_pose = np.mean(all_poses, axis=0)

    dir_vec = skeleton.convert_pose_seq_to_dir_vec_np(all_poses)
    mean_dir_vec = np.mean(dir_vec, axis=0)

    bone_lengths = []
    for parent, child, _ in skeleton.DIR_VEC_PAIRS:
        vec = all_poses[:, child] - all_poses[:, parent]
        bone_lengths.append(float(np.mean(np.linalg.norm(vec, axis=1))))

    return {
        "mean_pose": mean_pose.flatten(),
        "mean_dir_vec": mean_dir_vec.flatten(),
        "mean_bone_lengths": bone_lengths,
        "total_duration_h": total_duration / 3600.0,
    }
