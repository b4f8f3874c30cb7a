"""Batched two-view triangulation (DLT), replacing cv::triangulatePoints.

The reference triangulates matched rectified stereo pairs every keyframe
(`/root/reference/src/feature-tracker.cpp:367,489`). cv::triangulatePoints
solves, per point, the 4x4 homogeneous DLT system via SVD; here the whole
batch is solved at once with an eigendecomposition of A^T A (4x4, symmetric),
which XLA batches cleanly on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from pose_estimation_tpu.utils.precision import full_precision


def _adjugate4(m: jnp.ndarray) -> jnp.ndarray:
    """adj(M) for [..., 4, 4]: transpose of the cofactor matrix, written out
    as 16 3x3 determinants of elementwise products — no solver, no iteration,
    batches as pure VPU work."""

    def det3(r: int, c: int):
        rows = [i for i in range(4) if i != r]
        cols = [j for j in range(4) if j != c]
        a = m[..., rows[0], cols[0]]
        b = m[..., rows[0], cols[1]]
        cc = m[..., rows[0], cols[2]]
        d = m[..., rows[1], cols[0]]
        e = m[..., rows[1], cols[1]]
        f = m[..., rows[1], cols[2]]
        g = m[..., rows[2], cols[0]]
        h = m[..., rows[2], cols[1]]
        i = m[..., rows[2], cols[2]]
        return a * (e * i - f * h) - b * (d * i - f * g) + cc * (d * h - e * g)

    cof = jnp.stack(
        [
            jnp.stack(
                [(-1.0) ** (i + j) * det3(i, j) for j in range(4)], axis=-1
            )
            for i in range(4)
        ],
        axis=-2,
    )
    return jnp.swapaxes(cof, -1, -2)


@full_precision
def triangulate(
    p1: jnp.ndarray,   # [3,4] projection matrix, camera 1
    p2: jnp.ndarray,   # [3,4] projection matrix, camera 2
    px1: jnp.ndarray,  # [N,2] pixels in camera 1
    px2: jnp.ndarray,  # [N,2] pixels in camera 2
) -> jnp.ndarray:
    """Returns homogeneous-normalized 3D points [N, 3] (camera-1 frame of the
    projection matrices' common frame).

    Validity assumption: the adjugate null-vector equals eigh's smallest
    eigenvector only when lambda_4 << lambda_3 (A^T A genuinely rank-3).
    For near-degenerate pairs — near-zero disparity, far/duplicate points —
    adj(A^T A) returns a blend of the two smallest eigenvectors, unlike
    eigh, which still returns the true minimizer. Such points come out with
    wrong (often huge or negative) depth, so the REQUIRED companions are the
    callers' depth gates (`0 < z < max_depth`, `tracker.triangulate_current`
    / `vio.sfm_step`), which drop exactly this population the same way the
    reference drops them (`feature-tracker.cpp:369-380`)."""
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
    # Null vector (= smallest eigenvector) of the rank-3 symmetric A^T A,
    # closed form: adj(S) = (prod of the 3 nonzero eigenvalues) * v0 v0^T,
    # so the adjugate column with the largest diagonal entry IS v0 (the
    # diagonal holds lambda-product * v0_j^2 >= 0). Replaces jnp.linalg.eigh,
    # whose iterative batched lowering measured 1.24 ms/frame at B=32 —
    # ~8x the rest of pool_update combined.
    ata = jnp.einsum("nij,nik->njk", a, a)
    adj = _adjugate4(ata)
    diag = jnp.abs(jnp.diagonal(adj, axis1=-2, axis2=-1))   # [N, 4]
    hot = diag == jnp.max(diag, axis=-1, keepdims=True)
    # first max wins (ties are fp-exact duplicates of the same v0 direction)
    hot = hot & (jnp.cumsum(hot, axis=-1) == 1)
    x = jnp.sum(adj * hot[..., None, :].astype(adj.dtype), axis=-1)  # [N, 4]
    wcomp = x[:, 3]
    safe_w = jnp.where(jnp.abs(wcomp) < 1e-12, 1e-12, wcomp)
    return x[:, :3] / safe_w[:, None]


@full_precision
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
