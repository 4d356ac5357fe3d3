"""BVH export: drive character animation from generated gestures.

Functional replacement for the reference's Blender render rig
(``blender/poseRender.blend``, reference README.md:103-117): the rig is a
binary Blender-2.79 asset whose embedded ``renderAnim.py`` retargets the
synthesized 10-joint skeleton onto a rigged character.  Instead of a
binary asset, this module writes the generated motion as a standard BVH
(Biovision Hierarchy) file that Blender (any version), Maya, MotionBuilder
etc. import natively, so the same retargeting workflow works without the
unpublishable .blend.

Math
----
The generator outputs per-frame unit bone *directions* (9 bones over the
10-joint upper body, ``ops.skeleton.DIR_VEC_PAIRS``).  Skeletal animation
formats carry *rotations* over a fixed rest pose, so we solve, walking the
tree root->leaves, the minimal rotation (Rodrigues, axis = rest x actual)
that brings each bone's rest direction onto its actual direction; the
twist degree of freedom is left at zero — the reference README itself
notes its rig "refined rotations for some joints" because direction
vectors underdetermine twist.

Skeleton joints 3/6/9 (head, wrists) are leaves -> BVH End Sites.  Joint 1
(chest) has three children (neck + both shoulder chains), but a BVH
joint's single rotation acts on ALL its children's offsets; three
zero-offset rotator joints (``*_r``) are inserted under it so each chain
gets an independent rotation.  Every other joint has exactly one child,
so its own channels carry that bone's rotation.

Bone lengths are rigid in BVH (as in any rig), so positions reproduce
``convert_dir_vec_to_pose`` exactly when the direction vectors are unit;
non-unit model outputs are renormalized (positions then differ from the
stretchy-bone FK by the deviation from unit norm, typically <1e-2).
"""

import numpy as np

from ..ops import skeleton

# Joint naming for the 10-joint TED upper body (reference
# scripts/utils/data_utils.py:14-15 adjacency; chains: 0-1 spine,
# 1-2-3 head, 1-4-5-6 and 1-7-8-9 arms).
JOINT_NAMES = (
    "Root", "Chest", "Neck", "Head",
    "RShoulder", "RElbow", "RWrist",
    "LShoulder", "LElbow", "LWrist",
)

# bone index in DIR_VEC_PAIRS -> child joint
_BONES = skeleton.DIR_VEC_PAIRS
_CHILDREN = {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 7, 9: 8}


def _rotation_between(u, v):
    """Minimal rotation matrix taking unit vector u onto unit vector v."""
    axis = np.cross(u, v)
    s = np.linalg.norm(axis)
    c = float(np.dot(u, v))
    if s < 1e-12:
        if c > 0.0:
            return np.eye(3)
        # antiparallel: rotate pi about any axis perpendicular to u
        perp = np.cross(u, [1.0, 0.0, 0.0])
        if np.linalg.norm(perp) < 1e-6:
            perp = np.cross(u, [0.0, 1.0, 0.0])
        perp /= np.linalg.norm(perp)
        return _rodrigues(perp, np.pi)
    axis = axis / s
    return _rodrigues(axis, np.arctan2(s, c))


def _rodrigues(axis, angle):
    x, y, z = axis
    k = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return np.eye(3) + np.sin(angle) * k + (1.0 - np.cos(angle)) * (k @ k)


def _euler_zxy_deg(m):
    """Decompose m = Rz @ Rx @ Ry -> (z, x, y) degrees (BVH 'Zrotation
    Xrotation Yrotation' channel order)."""
    sx = np.clip(m[2, 1], -1.0, 1.0)
    x = np.arcsin(sx)
    if abs(sx) < 0.9999999:
        y = np.arctan2(-m[2, 0], m[2, 2])
        z = np.arctan2(-m[0, 1], m[1, 1])
    else:  # gimbal lock: cx ~ 0, fold y into z
        y = 0.0
        z = np.arctan2(m[1, 0], m[0, 0])
    return np.degrees([z, x, y])


def _normalize(vec):
    n = np.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / np.where(n < 1e-12, 1.0, n)


def _rest_directions(dir_vec, rest_dir_vec):
    if rest_dir_vec is None:
        rest = _normalize(dir_vec.mean(axis=0))
    else:
        rest = np.asarray(rest_dir_vec, dtype=np.float64)
        if rest.shape[-1] != 3:
            rest = rest.reshape(-1, 3)
        rest = _normalize(rest)
    # a degenerate mean (opposing directions cancelling) falls back to
    # the first frame's direction for that bone
    bad = np.linalg.norm(dir_vec.mean(axis=0), axis=-1) < 1e-6
    if rest_dir_vec is None and bad.any():
        rest = np.where(bad[:, None], _normalize(dir_vec[0]), rest)
    return rest


def solve_motion(dir_vec, rest_dirs):
    """Per-frame local ZXY eulers (degrees) for the motion-bearing nodes.

    Returns (T, 9, 3): one rotation per bone, in bone order — node order
    in the BVH maps each bone's rotation onto exactly one channel triple
    (the root's for bone 0, a rotator's for bones 1/3/6, the parent
    joint's otherwise).
    """
    t = dir_vec.shape[0]
    out = np.zeros((t, skeleton.N_BONES, 3))
    # traversal is DIR_VEC_PAIRS order: parents always precede children
    for f in range(t):
        glob = {0: np.eye(3)}  # joint -> accumulated global rotation
        for b, (parent, child, _length) in enumerate(_BONES):
            g = glob[parent]
            a = _rotation_between(g @ rest_dirs[b], dir_vec[f, b])
            g_new = a @ g
            out[f, b] = _euler_zxy_deg(g.T @ g_new)
            glob[child] = g_new
    return out


def _fmt(values):
    return " ".join("%.6f" % v for v in values)


def _hierarchy_lines(rest_dirs, scale):
    """BVH HIERARCHY block + the channel-column -> bone map."""
    off = {b: _BONES[b][2] * rest_dirs[b] * scale
           for b in range(skeleton.N_BONES)}
    lines = []
    order = []  # bone index whose rotation occupies each channel triple

    def joint(depth, name, offset, bone, body):
        pad = "  " * depth
        lines.append("%sJOINT %s" % (pad, name))
        lines.append("%s{" % pad)
        lines.append("%s  OFFSET %s" % (pad, _fmt(offset)))
        lines.append("%s  CHANNELS 3 Zrotation Xrotation Yrotation" % pad)
        order.append(bone)
        body(depth + 1)
        lines.append("%s}" % pad)

    def end_site(depth):
        pad = "  " * depth
        lines.extend(["%sEnd Site" % pad, "%s{" % pad,
                      "%s  OFFSET 0.000000 0.000000 0.000000" % pad,
                      "%s}" % pad])

    def chain(depth, bones):
        """Single-child chain: bones[0]'s offset node carries bones[1]'s
        rotation, and so on; the last node is a leaf."""
        b = bones[0]
        name = JOINT_NAMES[_BONES[b][1]]
        if len(bones) == 1:
            joint(depth, name, off[b], None, end_site)
        else:
            joint(depth, name, off[b], bones[1],
                  lambda d: chain(d, bones[1:]))

    lines.append("HIERARCHY")
    lines.append("ROOT %s" % JOINT_NAMES[0])
    lines.append("{")
    lines.append("  OFFSET 0.000000 0.000000 0.000000")
    lines.append("  CHANNELS 6 Xposition Yposition Zposition "
                 "Zrotation Xrotation Yrotation")
    order.append(0)  # root rotation drives bone 0 (Root->Chest)

    def chest_body(depth):
        # three independent chains need their own rotators: a joint's one
        # rotation would otherwise move all three children's offsets
        for rot_name, bones in (("Neck_r", [1, 2]),
                                ("RShoulder_r", [3, 4, 5]),
                                ("LShoulder_r", [6, 7, 8])):
            joint(depth, rot_name, np.zeros(3), bones[0],
                  lambda d, bones=bones: chain(d, bones))

    # Chest joint: offset = bone 0; its channels stay zero (rotators
    # below carry the per-chain rotations)
    joint(1, JOINT_NAMES[1], off[0], None, chest_body)
    lines.append("}")
    return lines, order


def bvh_string(dir_vec, fps=15, rest_dir_vec=None, scale=1.0,
               root_positions=None):
    """Render a BVH document from per-frame bone direction vectors.

    dir_vec: (T, 9, 3) or (T, 27) bone directions WITH the dataset mean
        already added back (the PKL's ``out_dir_vec``); renormalized here.
    fps: frame rate (reference motion is 15 fps, config *.yml motion_resampling_framerate).
    rest_dir_vec: optional (9,3)/(27,) rest pose; default = the clip's
        temporal mean direction per bone (a natural rest stance).
    scale: multiplies offsets and root positions (BVH consumers often
        expect cm; the skeleton's units are ~meters).
    root_positions: optional (T, 3) world root translation; default 0.
    """
    dir_vec = np.asarray(dir_vec, dtype=np.float64)
    if dir_vec.shape[-1] != 3:
        dir_vec = dir_vec.reshape(dir_vec.shape[0], -1, 3)
    dir_vec = _normalize(dir_vec)
    rest = _rest_directions(dir_vec, rest_dir_vec)

    lines, order = _hierarchy_lines(rest, scale)
    motion = solve_motion(dir_vec, rest)
    t = dir_vec.shape[0]
    if root_positions is None:
        root_positions = np.zeros((t, 3))
    root_positions = np.asarray(root_positions, dtype=np.float64) * scale

    lines.append("MOTION")
    lines.append("Frames: %d" % t)
    lines.append("Frame Time: %.7f" % (1.0 / fps))
    zero3 = np.zeros(3)
    for f in range(t):
        row = list(root_positions[f])
        for bone in order:
            row.extend(motion[f, bone] if bone is not None else zero3)
        lines.append(_fmt(row))
    return "\n".join(lines) + "\n"


def export_bvh(dir_vec, path, fps=15, rest_dir_vec=None, scale=1.0,
               root_positions=None):
    """Write `bvh_string` output to a file (see its docstring)."""
    doc = bvh_string(dir_vec, fps=fps, rest_dir_vec=rest_dir_vec,
                     scale=scale, root_positions=root_positions)
    with open(path, "w") as fh:
        fh.write(doc)
    return path
