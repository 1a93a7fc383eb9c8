"""3-D skeleton viewer (Gui3D equivalent, headless-friendly).

The reference uses OpenGL/FreeGLUT (src/openpose/gui/gui3D.cpp, compiled
only WITH_3D_RENDERER).  Here: matplotlib 3-D rendering that works headless
(render to image / file) or interactively, which fits TPU pods (no display).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from openpose_tpu.params import PoseModel, POSE_MODEL_INFO


def render_skeleton_3d(keypoints_3d: np.ndarray, model: PoseModel,
                       score_threshold: float = 0.0,
                       elev: float = 15.0, azim: float = -70.0,
                       out_path: Optional[str] = None) -> np.ndarray:
    """keypoints_3d [people, parts, 4] (x, y, z, score) -> RGB image array.

    Saves to out_path when given; always returns the rendered RGB array.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    info = POSE_MODEL_INFO[model]
    fig = plt.figure(figsize=(6, 6), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    for person in range(keypoints_3d.shape[0]):
        kp = keypoints_3d[person]
        valid = kp[:, 3] > score_threshold
        pairs = info.render_pairs
        for i in range(0, len(pairs), 2):
            a, b = pairs[i], pairs[i + 1]
            if valid[a] and valid[b]:
                r, g, bl = info.colors[b % len(info.colors)]
                ax.plot([kp[a, 0], kp[b, 0]], [kp[a, 2], kp[b, 2]],
                        [-kp[a, 1], -kp[b, 1]],
                        color=(r / 255, g / 255, bl / 255), linewidth=2)
        if valid.any():
            ax.scatter(kp[valid, 0], kp[valid, 2], -kp[valid, 1], s=8)
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_zlabel("-y")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if out_path:
        fig.savefig(out_path)
    plt.close(fig)
    return buf
