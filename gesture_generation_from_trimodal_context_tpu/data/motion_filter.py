"""Motion-window quality filter.

Behavioral contract: reference scripts/data_loader/motion_preprocessor.py:4-87.
A candidate window is rejected (in this order) when:
- "pose":        mean |pose - mean_pose| < 0.02 (too close to the mean),
- "spine angle": max spine-vs-(0,-1,0) angle > 30 deg or mean > 20 deg,
- "motion":      both wrist position variances < 0.0014 (static).

Vectorized numpy (no per-frame python loops); returns the same
(skeletons-or-empty, message) contract as the reference.
"""

import numpy as np

POSE_DIFF_THRESHOLD = 0.02
SPINE_MAX_DEG = 30.0
SPINE_MEAN_DEG = 20.0
WRIST_VAR_THRESHOLD = 0.0014
LEFT_WRIST, RIGHT_WRIST = 6, 9


class MotionFilter:
    def __init__(self, skeletons, mean_pose):
        self.skeletons = np.array(skeletons)
        self.mean_pose = np.array(mean_pose).reshape(-1, 3)
        self.filtering_message = "PASS"

    def get(self):
        if self.skeletons.size > 0:
            if self.check_pose_diff():
                self.skeletons = []
                self.filtering_message = "pose"
            elif self.check_spine_angle():
                self.skeletons = []
                self.filtering_message = "spine angle"
            elif self.check_static_motion():
                self.skeletons = []
                self.filtering_message = "motion"

        if isinstance(self.skeletons, np.ndarray) and self.skeletons.size > 0:
            if np.isnan(self.skeletons).any():
                raise ValueError("missing joints (NaN) in motion window")
            self.skeletons = self.skeletons.tolist()

        return self.skeletons, self.filtering_message

    def check_pose_diff(self):
        diff = np.mean(np.abs(self.skeletons - self.mean_pose))
        return diff < POSE_DIFF_THRESHOLD

    def check_spine_angle(self):
        spine_vec = self.skeletons[:, 1] - self.skeletons[:, 0]  # (T, 3)
        norms = np.linalg.norm(spine_vec, axis=1)
        down = np.array([0.0, -1.0, 0.0])
        cos = np.clip(spine_vec @ down / np.maximum(norms, 1e-12), -1.0, 1.0)
        angles = np.rad2deg(np.arccos(cos))
        return angles.max() > SPINE_MAX_DEG or angles.mean() > SPINE_MEAN_DEG

    def check_static_motion(self):
        def wrist_var(j):
            return np.sum(np.var(self.skeletons[:, j], axis=0))

        return (wrist_var(LEFT_WRIST) < WRIST_VAR_THRESHOLD and
                wrist_var(RIGHT_WRIST) < WRIST_VAR_THRESHOLD)
