"""BVH export: structure, channel ordering, and FK round-trip.

The exporter derives a rig from triangulated keypoints (reference BvhSaver is
Adam-gated; see openpose_tpu/io/bvh.py docstring).  The FK evaluator here
re-plays the written file: with constant bone lengths in the input, joint
positions must reconstruct exactly.
"""

import numpy as np
import pytest

from openpose_tpu.io.bvh import BvhSaver, rotation_zxy_deg, save_bvh
from openpose_tpu.params import PoseModel


def _make_motion(num_frames=4, seed=0):
    """Synthetic BODY_25 3-D keypoints with CONSTANT bone lengths: start from
    a rest pose and rotate the whole skeleton rigidly per frame + translate."""
    from openpose_tpu.io.bvh import _BODY_25_TREE, _BODY_25_ROOT

    rng = np.random.RandomState(seed)
    rest = np.zeros((26, 3))
    for child, parent in _BODY_25_TREE.items():
        rest[child] = rest[parent] + rng.uniform(-1, 1, 3)
    frames = []
    for t in range(num_frames):
        rot = rotation_zxy_deg(10.0 * t, 5.0 * t, -7.0 * t)
        trans = np.array([0.1 * t, 0.2 * t, -0.05 * t])
        pts = rest @ rot.T + trans
        kp = np.concatenate([pts, np.ones((26, 1))], axis=1)
        frames.append(kp[None].astype(np.float32))  # [1 person, parts, 4]
    return frames


def _parse_bvh(path):
    """Minimal BVH parser -> (joints, tree, offsets, channel order, motion)."""
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    i = lines.index("HIERARCHY") + 1
    joints, tree, offsets = [], {}, {}
    stack = []
    while lines[i] != "MOTION":
        tok = lines[i].split()
        if tok[0] in ("ROOT", "JOINT"):
            name = tok[1]
            if stack:
                tree[name] = stack[-1]
            joints.append(name)
            stack.append(name)
        elif tok[0] == "OFFSET" and stack and lines[i - 1] != "{":
            pass
        elif tok[0] == "End":
            stack.append(None)
        elif tok[0] == "OFFSET":
            pass
        elif tok[0] == "}":
            stack.pop()
        i += 1
    # second pass for offsets (attribute OFFSET to the enclosing joint)
    stack = []
    for ln in lines[:i]:
        tok = ln.split()
        if tok[0] in ("ROOT", "JOINT"):
            stack.append(tok[1])
        elif tok[0] == "End":
            stack.append(None)
        elif tok[0] == "OFFSET" and stack and stack[-1] is not None:
            if stack[-1] not in offsets:
                offsets[stack[-1]] = np.array([float(v) for v in tok[1:]])
        elif tok[0] == "}":
            stack.pop()
    n_frames = int(lines[i + 1].split(":")[1])
    motion = np.array([[float(v) for v in lines[i + 3 + f].split()]
                       for f in range(n_frames)])
    return joints, tree, offsets, motion


def _fk(joints, tree, offsets, row):
    """Forward kinematics for one motion row (root 6ch + 3ch per joint)."""
    pos, glob = {}, {}
    root = joints[0]
    pos[root] = np.array(row[0:3])
    glob[root] = rotation_zxy_deg(row[3], row[4], row[5])
    ch = 6
    for j in joints[1:]:
        parent = tree[j]
        local = rotation_zxy_deg(row[ch], row[ch + 1], row[ch + 2])
        glob[j] = glob[parent] @ local
        pos[j] = pos[parent] + glob[parent] @ offsets[j]
        ch += 3
    return pos


def test_bvh_fk_roundtrip(tmp_path):
    frames = _make_motion()
    path = str(tmp_path / "out.bvh")
    save_bvh(path, frames, PoseModel.BODY_25, fps=25.0)

    joints, tree, offsets, motion = _parse_bvh(path)
    assert len(joints) == 25  # BODY_25 minus Background
    assert motion.shape == (4, 6 + 3 * (len(joints) - 1))

    from openpose_tpu.params import BODY_25_PARTS
    name_to_idx = {v: k for k, v in BODY_25_PARTS.items()}
    for f, kp in enumerate(frames):
        pos = _fk(joints, tree, offsets, motion[f])
        for name, p in pos.items():
            expected = kp[0, name_to_idx[name], :3]
            np.testing.assert_allclose(p, expected, atol=1e-3)


def test_bvh_handles_missing_joints(tmp_path):
    frames = _make_motion()
    frames[2][0, 4, 3] = 0.0   # RWrist unobserved in frame 2
    frames[2][0, 3, 3] = 0.0   # RElbow too
    path = str(tmp_path / "partial.bvh")
    save_bvh(path, frames, PoseModel.BODY_25)
    joints, tree, offsets, motion = _parse_bvh(path)
    assert motion.shape[0] == 4
    assert np.isfinite(motion).all()


def test_bvh_empty_frames(tmp_path):
    saver = BvhSaver(str(tmp_path / "empty.bvh"), PoseModel.COCO_18, fps=30)
    saver.add_frame(None)
    saver.add_frame(np.zeros((0, 18, 4), np.float32))
    saver.save()
    joints, tree, offsets, motion = _parse_bvh(str(tmp_path / "empty.bvh"))
    assert len(joints) == 18
    assert motion.shape[0] == 2


def test_bvh_rejects_unknown_model(tmp_path):
    class Fake:
        pass
    with pytest.raises(ValueError):
        BvhSaver(str(tmp_path / "x.bvh"), model=Fake())
