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

from pose_estimation_tpu.utils.precision import full_precision


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


def _procrustes(src: jnp.ndarray, dst: jnp.ndarray):
    """Batched rigid alignment dst ~= R src + t (Horn/Kabsch).
    src, dst [B, M, 3] -> R [B,3,3], t [B,3]."""
    mu_s = jnp.mean(src, axis=1, keepdims=True)
    mu_d = jnp.mean(dst, axis=1, keepdims=True)
    h = jnp.einsum("bmi,bmj->bij", dst - mu_d, src - mu_s)
    uu, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", uu, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = jnp.einsum("bij,bj,bjk->bik", uu, d, vt)
    t = mu_d[:, 0] - jnp.einsum("bij,bj->bi", r, mu_s[:, 0])
    return r, t


def _epnp_pose(obj: jnp.ndarray, img_n: jnp.ndarray):
    """Batched EPnP (Lepetit et al.) pose hypothesis from M >= 4 points.

    The TPU-native analog of cv::SOLVEPNP_EPNP (`feature-tracker.cpp:518`):
    4 control points (centroid + principal axes), barycentric expansion,
    nullspace of the 2Mx12 projection system via symmetric eigh (MXU/VPU
    friendly — no nonsymmetric eig on TPU), case N=1 beta with scale/sign
    from control-point distances + cheirality, closed-form Procrustes for
    (R, t). obj [B, M, 3], img_n [B, M, 2] -> R [B,3,3], t [B,3]."""
    b, m, _ = obj.shape
    dtype = obj.dtype
    c0 = jnp.mean(obj, axis=1, keepdims=True)                     # [B,1,3]
    centered = obj - c0
    cov = jnp.einsum("bmi,bmj->bij", centered, centered) / m
    _, axes = jnp.linalg.eigh(cov)                                # [B,3,3]
    # control points: c0 + eigenaxes (unit length is fine — barycentric
    # coords absorb scale); guard degenerate (near-planar) samples with a
    # small ridge so the basis inverse stays finite
    cw = jnp.concatenate([c0, c0 + jnp.swapaxes(axes, -1, -2)], axis=1)  # [B,4,3]
    basis = jnp.swapaxes(axes, -1, -2)                            # rows = axes
    basis_inv = jnp.linalg.inv(
        basis + 1e-9 * jnp.eye(3, dtype=dtype)
    )
    a123 = jnp.einsum("bij,bmj->bmi", jnp.swapaxes(basis_inv, -1, -2), centered)
    alpha = jnp.concatenate(
        [1.0 - jnp.sum(a123, axis=-1, keepdims=True), a123], axis=-1
    )                                                             # [B,M,4]

    u = img_n[..., 0]
    v = img_n[..., 1]
    # rows: sum_j alpha_j * (xc_j) - u * sum_j alpha_j * zc_j = 0 (normalized
    # f=1, c=0 coords); unknowns = 4 control points in camera frame [12]
    zeros = jnp.zeros((b, m, 4), dtype)
    row_u = jnp.stack([alpha, zeros, -u[..., None] * alpha], axis=-1)  # [B,M,4,3]
    row_v = jnp.stack([zeros, alpha, -v[..., None] * alpha], axis=-1)
    # unknown layout: [ctrl0(x,y,z), ctrl1(x,y,z), ...] (index = 3j + coord)
    mm = jnp.concatenate(
        [row_u.reshape(b, m, 12), row_v.reshape(b, m, 12)], axis=1
    )                                                             # [B,2M,12]
    mtm = jnp.einsum("bri,brj->bij", mm, mm)
    _, vecs = jnp.linalg.eigh(mtm)
    # the 3 smallest eigenvectors span the solution for minimal samples
    # (for M=4 the 8x12 system has a >1-dim nullspace: the N=1 case alone is
    # NOT sufficient — this is why P3P exists; cases N=1/2/3 are all tried
    # and the best by sample reprojection wins, like the standard EPnP)
    v1 = vecs[..., 0].reshape(b, 4, 3)
    v2 = vecs[..., 1].reshape(b, 4, 3)
    v3 = vecs[..., 2].reshape(b, 4, 3)

    pidx = jnp.asarray(
        [(i, j) for i in range(4) for j in range(i + 1, 4)]
    )  # 6 control-point pairs

    def pair_diffs(p):                                            # [B,6,3]
        return p[:, pidx[:, 0]] - p[:, pidx[:, 1]]

    dw2 = jnp.sum(pair_diffs(cw) ** 2, axis=-1)                   # [B,6]
    d1 = pair_diffs(v1)
    d2 = pair_diffs(v2)
    d3 = pair_diffs(v3)

    def finish(cc):
        """Scale by distance ratio + cheirality flip + Procrustes."""
        dc2 = jnp.sum(pair_diffs(cc) ** 2, axis=-1)
        dc = jnp.sqrt(dc2 + 1e-18)
        dwr = jnp.sqrt(dw2 + 1e-18)
        beta = jnp.sum(dc * dwr, axis=1) / jnp.maximum(
            jnp.sum(dc * dc, axis=1), 1e-18
        )
        cc = cc * beta[:, None, None]
        pts_cam = jnp.einsum("bmj,bji->bmi", alpha, cc)
        flip = jnp.mean(pts_cam[..., 2], axis=1) < 0
        cc = jnp.where(flip[:, None, None], -cc, cc)
        return _procrustes(cw, cc)

    def lstsq(a, y):
        ata = jnp.einsum("bki,bkj->bij", a, a)
        aty = jnp.einsum("bki,bk->bi", a, y)
        ata = ata + 1e-12 * jnp.eye(a.shape[-1], dtype=dtype)
        return jnp.linalg.solve(ata, aty[..., None])[..., 0]

    # case N=1: cc ~ v1
    cand = [finish(v1)]

    # case N=2: solve [b11, b12, b22] from the 6 distance constraints
    l2 = jnp.stack(
        [
            jnp.sum(d1 * d1, axis=-1),
            2.0 * jnp.sum(d1 * d2, axis=-1),
            jnp.sum(d2 * d2, axis=-1),
        ],
        axis=-1,
    )                                                             # [B,6,3]
    bb = lstsq(l2, dw2)
    b1 = jnp.sqrt(jnp.abs(bb[:, 0]) + 1e-18)
    b2 = jnp.sign(bb[:, 1]) * jnp.sqrt(jnp.abs(bb[:, 2]) + 1e-18)
    cand.append(finish(b1[:, None, None] * v1 + b2[:, None, None] * v2))

    # case N=3: 6 unknowns from 6 constraints
    l3 = jnp.stack(
        [
            jnp.sum(d1 * d1, axis=-1),
            2.0 * jnp.sum(d1 * d2, axis=-1),
            2.0 * jnp.sum(d1 * d3, axis=-1),
            jnp.sum(d2 * d2, axis=-1),
            2.0 * jnp.sum(d2 * d3, axis=-1),
            jnp.sum(d3 * d3, axis=-1),
        ],
        axis=-1,
    )                                                             # [B,6,6]
    b6 = lstsq(l3, dw2)
    c1 = jnp.sqrt(jnp.abs(b6[:, 0]) + 1e-18)
    safe_c1 = jnp.where(c1 < 1e-9, 1e-9, c1)
    c2 = b6[:, 1] / safe_c1
    c3 = b6[:, 2] / safe_c1
    cand.append(
        finish(
            c1[:, None, None] * v1
            + c2[:, None, None] * v2
            + c3[:, None, None] * v3
        )
    )

    # pick the case with the lowest reprojection error on the SAMPLE points
    best_r, best_t = cand[0]
    best_err = jnp.full((b,), jnp.inf, dtype)
    for r_c, t_c in cand:
        xc = jnp.einsum("bij,bmj->bmi", r_c, obj) + t_c[:, None, :]
        z = jnp.where(xc[..., 2] < 1e-6, 1e-6, xc[..., 2])
        proj = xc[..., :2] / z[..., None]
        err = jnp.sum((proj - img_n) ** 2, axis=(1, 2)) + jnp.where(
            jnp.any(xc[..., 2] <= 0, axis=1), 1e12, 0.0
        )
        take = err < best_err
        best_err = jnp.where(take, err, best_err)
        best_r = jnp.where(take[:, None, None], r_c, best_r)
        best_t = jnp.where(take[:, None], t_c, best_t)
    return best_r, best_t


def _reproj_err2(r, t, obj, img_n):
    """Squared reprojection error in normalized coords.
    r [B,3,3], t [B,3], obj [N,3], img_n [N,2] -> [B,N]."""
    xc = jnp.einsum("bij,nj->bni", r, obj) + t[:, None, :]
    z = jnp.where(xc[..., 2] < 1e-6, 1e-6, xc[..., 2])
    proj = xc[..., :2] / z[..., None]
    behind = xc[..., 2] <= 0
    err = jnp.sum((proj - img_n[None]) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


@full_precision
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


SOLVER_SAMPLE_SIZE = {"dlt": 6, "epnp": 6, "epnp_min": 5, "p3p": 3}


@full_precision
def pnp_ransac(
    obj: jnp.ndarray,     # [N, 3] object points
    px: jnp.ndarray,      # [N, 2] pixels
    mask: jnp.ndarray,    # [N] validity
    k_mat: jnp.ndarray,   # [3, 3] camera matrix
    key: jax.Array,
    n_hypotheses: int = 512,
    threshold_px: float = 8.0,
    gn_iters: int = 10,
    solver: str = "dlt",
) -> PnPResult:
    """`solver` mirrors the reference's `solvePnP` config switch
    (`feature-tracker.cpp:513-531`): "dlt" ~ SOLVEPNP_ITERATIVE (6-point DLT
    hypotheses + GN polish), "epnp" ~ SOLVEPNP_EPNP (6-point EPnP
    hypotheses), "p3p" ~ SOLVEPNP_P3P/AP3P (true 3-point Grunert quartic,
    ops/p3p.py — each sample emits its up-to-4 closed-form solutions as
    separate hypotheses and consensus scoring disambiguates), "epnp_min" =
    reduced 5-point EPnP samples (the pre-round-3 stand-in for P3P, kept as
    a robust fallback)."""
    n = obj.shape[0]
    dtype = obj.dtype
    fx, fy = k_mat[0, 0], k_mat[1, 1]
    cx, cy = k_mat[0, 2], k_mat[1, 2]
    img_n = jnp.stack([(px[:, 0] - cx) / fx, (px[:, 1] - cy) / fy], axis=-1)
    # threshold in normalized coords (approx: scale by mean focal)
    thr_n2 = (threshold_px / ((fx + fy) * 0.5)) ** 2

    probs = mask.astype(dtype)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-9)
    sample = SOLVER_SAMPLE_SIZE[solver]
    if solver == "p3p":
        # same hypothesis budget: n/4 triplet samples x 4 quartic roots
        n_samples = max(n_hypotheses // 4, 1)
        idx = jax.random.choice(key, n, shape=(n_samples, sample), p=probs)
        from pose_estimation_tpu.ops.p3p import p3p_solve

        r4, t4 = p3p_solve(obj[idx], img_n[idx])
        r_h = r4.reshape(n_samples * 4, 3, 3)
        t_h = t4.reshape(n_samples * 4, 3)
    else:
        idx = jax.random.choice(key, n, shape=(n_hypotheses, sample), p=probs)
        if solver == "dlt":
            r_h, t_h = _dlt_pose(obj[idx], img_n[idx])
        else:
            r_h, t_h = _epnp_pose(obj[idx], img_n[idx])

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
