"""Batched two-view triangulation (DLT), replacing cv::triangulatePoints.

The reference triangulates matched rectified stereo pairs every keyframe
(`/root/reference/src/feature-tracker.cpp:367,489`). cv::triangulatePoints
solves, per point, the 4x4 homogeneous DLT system via SVD; here the whole
batch is solved at once with an eigendecomposition of A^T A (4x4, symmetric),
which XLA batches cleanly on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate(
    p1: jnp.ndarray,   # [3,4] projection matrix, camera 1
    p2: jnp.ndarray,   # [3,4] projection matrix, camera 2
    px1: jnp.ndarray,  # [N,2] pixels in camera 1
    px2: jnp.ndarray,  # [N,2] pixels in camera 2
) -> jnp.ndarray:
    """Returns homogeneous-normalized 3D points [N, 3] (camera-1 frame of the
    projection matrices' common frame)."""
    # DLT rows: x*P3 - P1, y*P3 - P2 for each view
    a = jnp.stack(
        [
            px1[:, 0:1] * p1[2] - p1[0],
            px1[:, 1:2] * p1[2] - p1[1],
            px2[:, 0:1] * p2[2] - p2[0],
            px2[:, 1:2] * p2[2] - p2[1],
        ],
        axis=1,
    )  # [N, 4, 4]
    # smallest eigenvector of A^T A
    ata = jnp.einsum("nij,nik->njk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    x = vecs[..., 0]  # eigenvector of smallest eigenvalue
    wcomp = x[:, 3]
    safe_w = jnp.where(jnp.abs(wcomp) < 1e-12, 1e-12, wcomp)
    return x[:, :3] / safe_w[:, None]


def triangulate_rectified(
    fx: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray, fy: jnp.ndarray,
    baseline: jnp.ndarray,
    px_l: jnp.ndarray, px_r: jnp.ndarray,
) -> jnp.ndarray:
    """Closed form for rectified stereo (disparity depth); cheaper fast path
    when P1/P2 are the CALIB_ZERO_DISPARITY pair. [N,3] in left-rect frame."""
    disp = px_l[:, 0] - px_r[:, 0]
    safe_disp = jnp.where(jnp.abs(disp) < 1e-6, 1e-6, disp)
    z = fx * baseline / safe_disp
    x = (px_l[:, 0] - cx) / fx * z
    y = (px_l[:, 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)
