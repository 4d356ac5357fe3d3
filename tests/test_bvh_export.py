"""BVH export correctness (interop/bvh_export.py, C33 replacement).

The strong pin: an INDEPENDENT BVH interpreter written here from the
format spec (recursive hierarchy parse, channel-order euler composition,
forward kinematics) reconstructs joint positions from the emitted file
and must match ``skeleton.convert_dir_vec_to_pose_np`` on the normalized
direction vectors.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.interop import bvh_export
from gesture_generation_from_trimodal_context_tpu.ops import skeleton

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# independent BVH reader (spec-derived, shares no code with the exporter)


class _Node:
    def __init__(self, name):
        self.name = name
        self.offset = np.zeros(3)
        self.channels = []
        self.children = []


def _parse_bvh(path):
    with open(path) as f:
        tokens = f.read().split()
    pos = [0]

    def tok():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    assert tok() == "HIERARCHY"
    kind = tok()
    assert kind == "ROOT"

    def parse_node(name):
        node = _Node(name)
        assert tok() == "{"
        while True:
            t = tok()
            if t == "OFFSET":
                node.offset = np.array([float(tok()) for _ in range(3)])
            elif t == "CHANNELS":
                n = int(tok())
                node.channels = [tok() for _ in range(n)]
            elif t == "JOINT":
                node.children.append(parse_node(tok()))
            elif t == "End":
                assert tok() == "Site"
                node.children.append(parse_node(name + "_end"))
            elif t == "}":
                return node
            else:
                raise ValueError("unexpected token %r" % t)

    root = parse_node(tok())
    assert tok() == "MOTION"
    assert tok() == "Frames:"
    n_frames = int(tok())
    assert tok() == "Frame"
    assert tok() == "Time:"
    frame_time = float(tok())
    values = np.array([float(t) for t in tokens[pos[0]:]])
    return root, n_frames, frame_time, values


def _rot(axis, deg):
    a = np.radians(deg)
    c, s = np.cos(a), np.sin(a)
    if axis == "X":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "Y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _fk(root, frame_values):
    """One frame of channel values -> {node name: world position}."""
    idx = [0]
    out = {}

    def walk(node, parent_pos, parent_rot):
        pos = parent_pos + parent_rot @ node.offset
        rot = np.eye(3)
        for ch in node.channels:
            v = frame_values[idx[0]]
            idx[0] += 1
            if ch.endswith("position"):
                pos = pos + np.eye(3)[:, "XYZ".index(ch[0])] * v
            else:
                rot = rot @ _rot(ch[0], v)
        world_rot = parent_rot @ rot
        out[node.name] = pos
        for child in node.children:
            walk(child, pos, world_rot)

    walk(root, np.zeros(3), np.eye(3))
    return out


# ---------------------------------------------------------------------------


def _random_dir_vec(t=12, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.randn(skeleton.N_BONES, 3)
    vec = base[None] + 0.35 * rs.randn(t, skeleton.N_BONES, 3)
    # non-unit on purpose: the exporter must renormalize
    return vec


def test_rotation_between_maps_u_to_v():
    rs = np.random.RandomState(1)
    for _ in range(50):
        u, v = rs.randn(2, 3)
        u, v = u / np.linalg.norm(u), v / np.linalg.norm(v)
        r = bvh_export._rotation_between(u, v)
        np.testing.assert_allclose(r @ u, v, atol=1e-10)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(r) > 0.999
    # antiparallel edge case
    r = bvh_export._rotation_between(np.array([0.0, 0.0, 1.0]),
                                     np.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(r @ [0, 0, 1.0], [0, 0, -1.0], atol=1e-10)


def test_euler_zxy_round_trip():
    rs = np.random.RandomState(2)
    for _ in range(100):
        u = rs.randn(3)
        m = bvh_export._rodrigues(u / np.linalg.norm(u),
                                  rs.uniform(-np.pi, np.pi))
        z, x, y = bvh_export._euler_zxy_deg(m)
        rebuilt = _rot("Z", z) @ _rot("X", x) @ _rot("Y", y)
        np.testing.assert_allclose(rebuilt, m, atol=1e-8)


def test_fk_round_trip_matches_skeleton(tmp_path):
    vec = _random_dir_vec()
    path = str(tmp_path / "clip.bvh")
    bvh_export.export_bvh(vec, path, fps=15)
    root, n_frames, frame_time, values = _parse_bvh(path)
    assert n_frames == len(vec)
    assert abs(frame_time - 1.0 / 15) < 1e-6

    unit = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
    expected = skeleton.convert_dir_vec_to_pose_np(unit)

    values = values.reshape(n_frames, -1)
    # root 6ch + 12 joint nodes * 3ch (chest + 3 rotators + 8 chain joints)
    assert values.shape[1] == 6 + 3 * 12
    for f in range(n_frames):
        world = _fk(root, values[f])
        for j, name in enumerate(bvh_export.JOINT_NAMES):
            np.testing.assert_allclose(
                world[name], expected[f, j], atol=1e-5,
                err_msg="frame %d joint %s" % (f, name))


def test_explicit_rest_pose_and_scale(tmp_path):
    vec = _random_dir_vec(t=5, seed=3)
    rest = _random_dir_vec(t=1, seed=4)[0]
    path = str(tmp_path / "scaled.bvh")
    bvh_export.export_bvh(vec, path, fps=20, rest_dir_vec=rest, scale=100.0)
    root, n_frames, _, values = _parse_bvh(path)
    unit = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
    expected = 100.0 * skeleton.convert_dir_vec_to_pose_np(unit)
    values = values.reshape(n_frames, -1)
    world = _fk(root, values[2])
    for j, name in enumerate(bvh_export.JOINT_NAMES):
        np.testing.assert_allclose(world[name], expected[2, j], atol=1e-3)


def test_cli_exports_from_pkl(tmp_path):
    vec = _random_dir_vec(t=8, seed=5)
    pkl = tmp_path / "gen_0.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"out_dir_vec": vec, "out_poses": None,
                     "aux_info": {}, "sentence": "hi"}, f)
    env = dict(os.environ, PYTHONPATH=os.environ.get("PYTHONPATH", ""))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_bvh.py"),
         str(pkl), "--fps", "15"],
        capture_output=True, text=True, env=env, timeout=120)
    assert res.returncode == 0, res.stderr
    out = tmp_path / "gen_0.bvh"
    assert out.exists()
    _, n_frames, _, _ = _parse_bvh(str(out))
    assert n_frames == 8


def test_cli_skips_missing_key(tmp_path):
    pkl = tmp_path / "gen_1.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"out_dir_vec": _random_dir_vec(t=3)}, f)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_bvh.py"),
         str(pkl), "--key", "human_dir_vec"],
        capture_output=True, text=True, timeout=120)
    assert res.returncode != 0  # nothing written -> non-zero exit
    assert "no BVH written" in res.stderr or "no BVH written" in res.stdout
