"""Stereo camera model: rectification + undistortion map precomputation.

From-scratch implementation of the setup-time geometry the reference gets
from OpenCV (`/root/reference/include/cfsd/camera-model.hpp:49-95`):
`cv::stereoRectify` (Bouguet's algorithm, CALIB_ZERO_DISPARITY, alpha=0) and
`cv::initUndistortRectifyMap`. Runs once on host in numpy float64; the
resulting sampling maps feed the device-side remap kernel
(`pose_estimation_tpu/ops/remap.py`) every frame.

Distortion model: radial k1,k2,k3 + tangential p1,p2 (plumb bob), matching
the [k1, k2, p1, p2, k3] coefficient layout of the config files.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _rodrigues(r_or_R):
    """Rotation vector <-> matrix (numpy, host-side)."""
    a = np.asarray(r_or_R, dtype=np.float64)
    if a.shape == (3,) or a.shape == (3, 1) or a.shape == (1, 3):
        w = a.reshape(3)
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    # matrix -> vector
    R = a
    cos_t = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(cos_t)
    if th < 1e-12:
        return np.zeros(3)
    w = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2 * np.sin(th))
    )
    return w * th


def _distort(x, y, dist):
    """Apply plumb-bob distortion to normalized coords."""
    k1, k2, p1, p2, k3 = (list(dist) + [0.0] * 5)[:5]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


def undistort_points(pts, K, dist, R=None, P=None, iters=5):
    """Normalized/rectified coordinates of distorted pixel points.

    Same iterative compensation as cv::undistortPoints (default 5 iters).
    pts: [N,2] pixels. Returns [N,2] (pixels if P given, else normalized).
    """
    K = np.asarray(K, np.float64)
    k1, k2, p1, p2, k3 = (list(np.ravel(dist)) + [0.0] * 5)[:5]
    x0 = (pts[:, 0] - K[0, 2]) / K[0, 0]
    y0 = (pts[:, 1] - K[1, 2]) / K[1, 1]
    x, y = x0.copy(), y0.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1 + ((k3 * r2 + k2) * r2 + k1) * r2)
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (x0 - dx) * icdist
        y = (y0 - dy) * icdist
    if R is not None:
        v = np.stack([x, y, np.ones_like(x)], axis=0)
        v = np.asarray(R, np.float64) @ v
        x, y = v[0] / v[2], v[1] / v[2]
    if P is not None:
        P = np.asarray(P, np.float64)
        return np.stack([x * P[0, 0] + P[0, 2], y * P[1, 1] + P[1, 2]], axis=1)
    return np.stack([x, y], axis=1)


def _get_rectangles(K, dist, R, P, size):
    """Inner/outer valid-pixel rectangles after rectification (the 9x9 grid
    sampling OpenCV uses for the alpha scaling)."""
    nx, ny = size
    N = 9
    # note: the grid spans [0, nx] x [0, ny] (not nx-1), matching OpenCV
    xs, ys = np.meshgrid(
        np.arange(N) * nx / (N - 1), np.arange(N) * ny / (N - 1)
    )
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
    und = undistort_points(pts, K, dist, R=R, P=P).reshape(N, N, 2)
    ox0, oy0 = und[..., 0].min(), und[..., 1].min()
    ox1, oy1 = und[..., 0].max(), und[..., 1].max()
    ix0 = und[:, 0, 0].max()
    ix1 = und[:, -1, 0].min()
    iy0 = und[0, :, 1].max()
    iy1 = und[-1, :, 1].min()
    inner = (ix0, iy0, ix1 - ix0, iy1 - iy0)
    outer = (ox0, oy0, ox1 - ox0, oy1 - oy0)
    return inner, outer


def stereo_rectify(K1, D1, K2, D2, size, R, T, zero_disparity=True, alpha=0.0):
    """Bouguet stereo rectification. Returns (R1, R2, P1, P2, Q).

    size = (width, height). Matches cv::stereoRectify with
    CALIB_ZERO_DISPARITY and the given alpha (the reference uses alpha=0,
    `camera-model.hpp:73`).
    """
    K1, K2 = np.asarray(K1, np.float64), np.asarray(K2, np.float64)
    R = np.asarray(R, np.float64)
    T = np.asarray(T, np.float64).reshape(3)
    nx, ny = size

    # split the relative rotation between the two cameras
    om = _rodrigues(R)
    r_r = _rodrigues(-om * 0.5)
    t = r_r @ T

    idx = 0 if abs(t[0]) > abs(t[1]) else 1
    uu = np.zeros(3)
    uu[idx] = 1.0 if t[idx] > 0 else -1.0

    # rotation bringing the (half-rotated) baseline onto the x (or y) axis
    ww = np.cross(t, uu)
    nw = np.linalg.norm(ww)
    if nw > 0:
        ww *= np.arccos(abs(t[idx]) / np.linalg.norm(t)) / nw
    wR = _rodrigues(ww)
    R1 = wR @ r_r.T
    R2 = wR @ r_r
    t = R2 @ T

    # shared focal length (min over cameras, shrunk for barrel distortion)
    fc_new = np.inf
    for K, D in ((K1, D1), (K2, D2)):
        dk1 = np.ravel(D)[0] if D is not None else 0.0
        fc = K[idx ^ 1, idx ^ 1]
        if dk1 < 0:
            fc *= 1 + dk1 * (nx * nx + ny * ny) / (4 * fc * fc)
        fc_new = min(fc_new, fc)

    # principal points from the average of the rectified image corners
    cc_new = []
    for K, D, Rk in ((K1, D1, R1), (K2, D2, R2)):
        corners = np.array(
            [[0, 0], [nx - 1, 0], [0, ny - 1], [nx - 1, ny - 1]], np.float64
        )
        und = undistort_points(corners, K, D, R=Rk)
        avg = und.mean(axis=0) * fc_new
        cc_new.append(np.array([(nx - 1) / 2 - avg[0], (ny - 1) / 2 - avg[1]]))

    if zero_disparity:
        cc = (cc_new[0] + cc_new[1]) * 0.5
        cc_new = [cc.copy(), cc.copy()]
    else:
        cc_new[0][idx ^ 1] = cc_new[1][idx ^ 1] = 0.5 * (
            cc_new[0][idx ^ 1] + cc_new[1][idx ^ 1]
        )

    def make_p(cc):
        P = np.zeros((3, 4))
        P[0, 0] = P[1, 1] = fc_new
        P[0, 2], P[1, 2] = cc
        P[2, 2] = 1.0
        return P

    P1 = make_p(cc_new[0])
    P2 = make_p(cc_new[1])
    P2[idx, 3] = t[idx] * fc_new

    # alpha scaling (valid-pixel crop); the reference uses alpha = 0
    if alpha >= 0:
        inner1, outer1 = _get_rectangles(K1, D1, R1, P1, size)
        inner2, outer2 = _get_rectangles(K2, D2, R2, P2, size)

        def s_inner(cc, rect):
            cx, cy = cc
            x, y, w, h = rect
            return max(
                cx / (cx - x), cy / (cy - y),
                (nx - cx) / (x + w - cx), (ny - cy) / (y + h - cy),
            )

        def s_outer(cc, rect):
            cx, cy = cc
            x, y, w, h = rect
            return min(
                cx / (cx - x), cy / (cy - y),
                (nx - cx) / (x + w - cx), (ny - cy) / (y + h - cy),
            )

        s0 = max(s_inner(cc_new[0], inner1), s_inner(cc_new[1], inner2))
        s1 = min(s_outer(cc_new[0], outer1), s_outer(cc_new[1], outer2))
        s = s0 * (1 - alpha) + s1 * alpha
        # only the focal length is rescaled; principal points stay put
        fc_new *= s
        for P in (P1, P2):
            P[0, 0] = P[1, 1] = fc_new
        P2[idx, 3] = t[idx] * fc_new

    # disparity-to-depth matrix
    Q = np.zeros((4, 4))
    Q[0, 0] = Q[1, 1] = 1.0
    Q[0, 3] = -P1[0, 2]
    Q[1, 3] = -P1[1, 2]
    Q[2, 3] = fc_new
    Q[3, 2] = -1.0 / (t[idx] if t[idx] != 0 else 1e-12)
    Q[3, 3] = (P1[idx, 2] - P2[idx, 2]) / (t[idx] if t[idx] != 0 else 1e-12)
    return R1, R2, P1, P2, Q


def undistort_rectify_map(K, dist, R, P, size):
    """Per-pixel source-coordinate map, cv::initUndistortRectifyMap math.

    For each rectified pixel, where to sample the raw image (float coords).
    Returns map [H, W, 2] float32 (x, y).
    """
    K = np.asarray(K, np.float64)
    P = np.asarray(P, np.float64)
    R = np.asarray(R, np.float64)
    nx, ny = size
    u, v = np.meshgrid(np.arange(nx, dtype=np.float64), np.arange(ny, dtype=np.float64))
    x = (u - P[0, 2]) / P[0, 0]
    y = (v - P[1, 2]) / P[1, 1]
    iR = np.linalg.inv(R)
    X = iR[0, 0] * x + iR[0, 1] * y + iR[0, 2]
    Y = iR[1, 0] * x + iR[1, 1] * y + iR[1, 2]
    W = iR[2, 0] * x + iR[2, 1] * y + iR[2, 2]
    xn, yn = X / W, Y / W
    xd, yd = _distort(xn, yn, np.ravel(dist))
    map_x = xd * K[0, 0] + K[0, 2]
    map_y = yd * K[1, 1] + K[1, 2]
    return np.stack([map_x, map_y], axis=-1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """All rectified-camera constants, mirror of `cfsd::CameraModel`."""

    image_size: tuple[int, int]        # (width, height)
    R1: np.ndarray
    R2: np.ndarray
    P1: np.ndarray                     # 3x4 rectified projection, left
    P2: np.ndarray                     # 3x4 rectified projection, right
    Q: np.ndarray
    map_left: np.ndarray               # [H, W, 2] float32 sampling map
    map_right: np.ndarray
    R_cb: np.ndarray                   # body->camera rotation
    p_cb: np.ndarray                   # body->camera translation
    R_bc: np.ndarray                   # camera->body
    p_bc: np.ndarray
    std_x: float
    std_y: float

    @classmethod
    def from_config(cls, cfg) -> "CameraModel":
        size = (cfg.image_width, cfg.image_height)
        R1, R2, P1, P2, Q = stereo_rectify(
            cfg.k_left, cfg.dist_left, cfg.k_right, cfg.dist_right,
            size, cfg.r_lr, cfg.t_lr,
        )
        map_l = undistort_rectify_map(cfg.k_left, cfg.dist_left, R1, P1, size)
        map_r = undistort_rectify_map(cfg.k_right, cfg.dist_right, R2, P2, size)
        R_cb = np.asarray(cfg.r_cb, np.float64)
        p_cb = np.asarray(cfg.t_cb, np.float64)
        # normalize the rotation (configs store it at limited precision; the
        # reference reorthonormalizes via the quaternion ctor,
        # camera-model.hpp:93)
        u, _, vt = np.linalg.svd(R_cb)
        R_cb = u @ vt
        R_bc = R_cb.T
        p_bc = -R_bc @ p_cb
        return cls(
            image_size=size, R1=R1, R2=R2, P1=P1, P2=P2, Q=Q,
            map_left=map_l, map_right=map_r,
            R_cb=R_cb, p_cb=p_cb, R_bc=R_bc, p_bc=p_bc,
            std_x=cfg.std_x, std_y=cfg.std_y,
        )

    @property
    def fx(self):
        return float(self.P1[0, 0])

    @property
    def fy(self):
        return float(self.P1[1, 1])

    @property
    def cx(self):
        return float(self.P1[0, 2])

    @property
    def cy(self):
        return float(self.P1[1, 2])

    @property
    def baseline(self):
        """Rectified stereo baseline (meters, positive)."""
        return float(-self.P2[0, 3] / self.P2[0, 0])
