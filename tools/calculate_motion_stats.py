"""CLI for dataset motion statistics (reference
scripts/data_loader/calculate_motion_stats.py:10-58).

Usage: python tools/calculate_motion_stats.py <ted_base_path>
(expects <base>/lmdb_train in GGRaw or LMDB format)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gesture_generation_from_trimodal_context_tpu.data.motion_stats import (
    calculate_data_mean)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "data/ted_dataset"
    np.set_printoptions(precision=7, suppress=True)
    stats = calculate_data_mean(os.path.join(base, "lmdb_train"))
    print("mean pose", repr(stats["mean_pose"]))
    print("mean directional vector", repr(stats["mean_dir_vec"]))
    print("mean bone lengths", repr(stats["mean_bone_lengths"]))
    print("total duration of the valid clips: {:.1f} h".format(
        stats["total_duration_h"]))


if __name__ == "__main__":
    main()
