"""Temporal pose-graph smoothing over keyframe windows.

The north-star reformulation of the reference's single-person tracker: treat
a window of T keyframes as a pose graph — per-keypoint trajectories x_t tied
to their detections by confidence-weighted data terms and to each other by a
constant-velocity (acceleration-penalty) smoothness prior:

    min_x  sum_t  c_t ||x_t - z_t||^2  +  lam * sum_t ||x_{t-1} - 2 x_t + x_{t+1}||^2

Each keypoint dimension is an independent T-variable banded linear system;
we batch-solve all (people x parts x 2) systems with one vmapped dense solve
(T <= 128, tiny on the MXU).  Low-confidence detections (c=0) are inpainted
by the prior — the LK-fill role of PersonTracker, but globally optimal over
the window instead of frame-chained.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("smoothness",))
def smooth_trajectories(keypoints: jax.Array,
                        smoothness: float = 4.0) -> jax.Array:
    """keypoints [T, people, parts, 3] (x, y, score) -> smoothed same shape.

    Scores act as data weights; output scores are the input scores.
    """
    t = keypoints.shape[0]
    z = keypoints[..., :2]                             # [T, P, K, 2]
    c = jnp.maximum(keypoints[..., 2], 0.0)            # [T, P, K]

    # Second-difference operator D [T-2, T]; prior = lam * D^T D
    eye = jnp.eye(t)
    d = eye[:-2] - 2.0 * eye[1:-1] + eye[2:]
    prior = smoothness * (d.T @ d)                     # [T, T]

    def solve_one(zs, cs):
        # zs [T, 2], cs [T]
        a = prior + jnp.diag(cs) + 1e-6 * jnp.eye(t)
        return jnp.linalg.solve(a, cs[:, None] * zs)

    flat_z = z.transpose(1, 2, 0, 3).reshape(-1, t, 2)
    flat_c = c.transpose(1, 2, 0).reshape(-1, t)
    smoothed = jax.vmap(solve_one)(flat_z, flat_c)
    out_xy = smoothed.reshape(z.shape[1], z.shape[2], t, 2) \
                     .transpose(2, 0, 1, 3)
    return jnp.concatenate([out_xy, keypoints[..., 2:]], axis=-1)


def smooth_window(window_keypoints: np.ndarray,
                  smoothness: float = 4.0) -> np.ndarray:
    """NumPy wrapper: [T, people, parts, 3] -> smoothed."""
    if window_keypoints.shape[0] < 3:
        return window_keypoints
    return np.asarray(smooth_trajectories(
        jnp.asarray(window_keypoints, jnp.float32), smoothness))
