"""Batched-hypothesis PnP RANSAC + Gauss-Newton refinement.

Replaces `cv::solvePnPRansac` in the SfM bootstrap
(`/root/reference/src/feature-tracker.cpp:513-531`; OpenCV params there:
100 iterations, 8px threshold, 0.99 confidence). Fixed-shape design:

1. sample B 6-point subsets, solve all with a batched DLT (12x12
   eigenproblem) -> candidate (R, t);
2. score every hypothesis against every correspondence in one shot;
3. Gauss-Newton-polish the best hypothesis on its inliers (the reference's
   SOLVEPNP_ITERATIVE refinement step), a fixed-iteration `fori_loop`.

Convention matches cv::solvePnP: the returned (rvec, t) transform OBJECT
points into the CAMERA frame: x_cam = R(rvec) X + t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.utils import lie


class PnPResult(NamedTuple):
    rvec: jnp.ndarray      # [3]
    tvec: jnp.ndarray      # [3]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _dlt_pose(obj: jnp.ndarray, img_n: jnp.ndarray):
    """Batched DLT pose from >=6 points in normalized image coords.

    obj [B, M, 3], img_n [B, M, 2] -> R [B,3,3], t [B,3].
    """
    b, m, _ = obj.shape
    zeros = jnp.zeros((b, m, 4), obj.dtype)
    xh = jnp.concatenate([obj, jnp.ones((b, m, 1), obj.dtype)], axis=-1)
    u = img_n[..., 0:1]
    v = img_n[..., 1:2]
    row_u = jnp.concatenate([xh, zeros[..., :4], -u * xh], axis=-1)  # [B,M,12]
    row_v = jnp.concatenate([zeros[..., :4], xh, -v * xh], axis=-1)
    a = jnp.concatenate([row_u, row_v], axis=1)                      # [B,2M,12]
    ata = jnp.einsum("bij,bik->bjk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    p = vecs[..., 0].reshape(b, 3, 4)
    mmat = p[:, :, :3]
    # orthogonalize: R = U V^T with proper sign; scale from singular values
    uu, ss, vt = jnp.linalg.svd(mmat)
    det = jnp.linalg.det(uu @ vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = uu @ (d[..., None] * vt)
    scale = jnp.sum(ss * d, axis=-1) / 3.0
    safe = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = p[:, :, 3] / safe[:, None]
    # enforce cheirality on the centroid: flip if it lands behind the camera
    centroid = jnp.mean(obj, axis=1)
    z = (jnp.einsum("bij,bj->bi", r, centroid) + t)[:, 2]
    flip = z < 0
    # proper flip: rotate 180deg is wrong; instead negate p (scale sign)
    t = jnp.where(flip[:, None], -t, t)
    r = jnp.where(flip[:, None, None], -r, r)
    # -R is not a rotation (det=-1); repair by re-orthogonalizing with det +1
    uu2, _, vt2 = jnp.linalg.svd(r)
    det2 = jnp.linalg.det(uu2 @ vt2)
    d2 = jnp.stack([jnp.ones_like(det2), jnp.ones_like(det2), det2], axis=-1)
    r = uu2 @ (d2[..., None] * vt2)
    return r, t


def _reproj_err2(r, t, obj, img_n):
    """Squared reprojection error in normalized coords.
    r [B,3,3], t [B,3], obj [N,3], img_n [N,2] -> [B,N]."""
    xc = jnp.einsum("bij,nj->bni", r, obj) + t[:, None, :]
    z = jnp.where(xc[..., 2] < 1e-6, 1e-6, xc[..., 2])
    proj = xc[..., :2] / z[..., None]
    behind = xc[..., 2] <= 0
    err = jnp.sum((proj - img_n[None]) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def gauss_newton_pose(
    obj: jnp.ndarray, img_n: jnp.ndarray, weights: jnp.ndarray,
    rvec0: jnp.ndarray, tvec0: jnp.ndarray, iters: int = 10,
):
    """Weighted GN on (rvec, t); residual in normalized image coords."""
    def body(_, carry):
        rvec, t = carry
        r = lie.so3_exp(rvec)
        xc = jnp.einsum("ij,nj->ni", r, obj) + t
        z = jnp.where(xc[:, 2] < 1e-6, 1e-6, xc[:, 2])
        proj = xc[:, :2] / z[:, None]
        res = (proj - img_n)                                     # [N,2]
        # d proj / d xc
        zero = jnp.zeros_like(z)
        j_proj = jnp.stack(
            [
                jnp.stack([1.0 / z, zero, -xc[:, 0] / (z * z)], axis=-1),
                jnp.stack([zero, 1.0 / z, -xc[:, 1] / (z * z)], axis=-1),
            ],
            axis=1,
        )                                                         # [N,2,3]
        # d xc / d rvec = -R hat(X) Jr ~ left-multiplicative: use d xc/d w
        # with perturbation R exp(hat(w)): dxc = R hat(w) X = -R hat(X) w
        j_r = -jnp.einsum("ij,njk->nik", r, lie.hat(obj))         # [N,3,3]
        j_rw = jnp.einsum("nij,njk->nik", j_proj, j_r)            # [N,2,3]
        j_t = j_proj                                              # [N,2,3]
        jfull = jnp.concatenate([j_rw, j_t], axis=-1)             # [N,2,6]
        wvec = weights[:, None]
        h = jnp.einsum("nia,nib->ab", jfull * wvec[..., None], jfull)
        g = jnp.einsum("nia,ni->a", jfull * wvec[..., None], res)
        h = h + 1e-9 * jnp.eye(6, dtype=h.dtype)
        step = -jnp.linalg.solve(h, g)
        r_new = r @ lie.so3_exp(step[:3])
        return lie.so3_log(r_new), t + step[3:]

    rvec, t = jax.lax.fori_loop(0, iters, body, (rvec0, tvec0))
    return rvec, t


def pnp_ransac(
    obj: jnp.ndarray,     # [N, 3] object points
    px: jnp.ndarray,      # [N, 2] pixels
    mask: jnp.ndarray,    # [N] validity
    k_mat: jnp.ndarray,   # [3, 3] camera matrix
    key: jax.Array,
    n_hypotheses: int = 512,
    threshold_px: float = 8.0,
    gn_iters: int = 10,
) -> PnPResult:
    n = obj.shape[0]
    dtype = obj.dtype
    fx, fy = k_mat[0, 0], k_mat[1, 1]
    cx, cy = k_mat[0, 2], k_mat[1, 2]
    img_n = jnp.stack([(px[:, 0] - cx) / fx, (px[:, 1] - cy) / fy], axis=-1)
    # threshold in normalized coords (approx: scale by mean focal)
    thr_n2 = (threshold_px / ((fx + fy) * 0.5)) ** 2

    probs = mask.astype(dtype)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-9)
    idx = jax.random.choice(key, n, shape=(n_hypotheses, 6), p=probs)
    r_h, t_h = _dlt_pose(obj[idx], img_n[idx])

    err2 = _reproj_err2(r_h, t_h, obj, img_n)        # [B, N]
    inl = (err2 < thr_n2) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    inliers = inl[best]

    rvec0 = lie.so3_log(r_h[best])
    tvec0 = t_h[best]
    # local optimization (LO-RANSAC style): two rounds of GN on the current
    # inlier set, re-deciding inliers in between — recovers from marginal
    # minimal-sample hypotheses
    rvec, tvec = rvec0, tvec0
    for _ in range(2):
        w = inliers.astype(dtype)
        rvec, tvec = gauss_newton_pose(obj, img_n, w, rvec, tvec, gn_iters)
        err2f = _reproj_err2(
            lie.so3_exp(rvec)[None], tvec[None], obj, img_n
        )[0]
        inliers = (err2f < thr_n2) & mask
    return PnPResult(
        rvec=rvec, tvec=tvec, inliers=inliers, n_inliers=jnp.sum(inliers)
    )
