"""Camera rectification math on the real EuRoC calibration.

Oracle strategy: cv2 in this environment is OpenCV 5.0, whose stereoRectify
changed the (gauge-free) choice of rectified fc/cc vs the 3.x/4.x the
reference was built on. So we check:
  * rectification rotations R1/R2 against cv2 (version-stable geometry);
  * undistort_points against cv2 (exact algorithm);
  * map generation against cv2.initUndistortRectifyMap GIVEN the same R,P;
  * first-principles invariants of the full chain (epipolar alignment and
    disparity = fx*baseline/Z for true 3D points).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pose_estimation_tpu import camera, load_config

CFG = load_config("/root/reference/config/euroc.yml", dataset="euroc")
SIZE = (CFG.image_width, CFG.image_height)


class TestStereoRectify:
    def test_rotations_match_opencv(self):
        R1, R2, P1, P2, Q = camera.stereo_rectify(
            CFG.k_left, CFG.dist_left, CFG.k_right, CFG.dist_right,
            SIZE, CFG.r_lr, CFG.t_lr,
        )
        cR1, cR2, *_ = cv2.stereoRectify(
            CFG.k_left, CFG.dist_left, CFG.k_right, CFG.dist_right,
            SIZE, CFG.r_lr, CFG.t_lr.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        )
        np.testing.assert_allclose(R1, cR1, atol=1e-8)
        np.testing.assert_allclose(R2, cR2, atol=1e-8)

    def test_rectified_epipolar_geometry(self):
        _, _, P1, P2, _ = camera.stereo_rectify(
            CFG.k_left, CFG.dist_left, CFG.k_right, CFG.dist_right,
            SIZE, CFG.r_lr, CFG.t_lr,
        )
        assert P1[0, 0] == P1[1, 1] == P2[0, 0] == P2[1, 1]
        assert P1[1, 2] == P2[1, 2]
        assert P1[0, 2] == P2[0, 2]  # CALIB_ZERO_DISPARITY
        assert P2[0, 3] != 0  # horizontal baseline

    def test_projection_invariants(self):
        """True 3D points: rectified projections are epipolar-aligned and
        disparity encodes inverse depth with the rectified baseline."""
        R1, R2, P1, P2, _ = camera.stereo_rectify(
            CFG.k_left, CFG.dist_left, CFG.k_right, CFG.dist_right,
            SIZE, CFG.r_lr, CFG.t_lr,
        )
        rng = np.random.default_rng(1)
        n = 200
        X_l = np.stack([
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 20, n)
        ], axis=1)  # points in the ORIGINAL left camera frame

        # rectified-left frame coords
        Xr1 = (R1 @ X_l.T).T
        u1 = P1[0, 0] * Xr1[:, 0] / Xr1[:, 2] + P1[0, 2]
        v1 = P1[1, 1] * Xr1[:, 1] / Xr1[:, 2] + P1[1, 2]
        # rectified-right: X_r2 = R2 (R X_l + T)
        # point expressed in the right camera frame, then rectified; P2's Tx
        # term is NOT applied here (it encodes this same translation for
        # points given in the rectified-left frame)
        X_r = (CFG.r_lr @ X_l.T).T + CFG.t_lr
        Xr2 = (R2 @ X_r.T).T
        u2 = P2[0, 0] * Xr2[:, 0] / Xr2[:, 2] + P2[0, 2]
        v2 = P2[1, 1] * Xr2[:, 1] / Xr2[:, 2] + P2[1, 2]

        np.testing.assert_allclose(v1, v2, atol=1e-3)  # horizontal epipolar
        baseline = -P2[0, 3] / P2[0, 0]
        np.testing.assert_allclose(
            u1 - u2, P1[0, 0] * baseline / Xr1[:, 2], rtol=1e-4
        )


class TestUndistortPoints:
    def test_matches_opencv(self):
        rng = np.random.default_rng(0)
        pts = np.stack([
            rng.uniform(0, SIZE[0], 200), rng.uniform(0, SIZE[1], 200)
        ], axis=1)
        ours = camera.undistort_points(pts, CFG.k_left, CFG.dist_left)
        ref = cv2.undistortPoints(
            pts.reshape(-1, 1, 2), CFG.k_left, CFG.dist_left
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-8)


class TestRectifyMap:
    def test_matches_opencv_given_same_rp(self):
        R1, _, P1, _, _ = camera.stereo_rectify(
            CFG.k_left, CFG.dist_left, CFG.k_right, CFG.dist_right,
            SIZE, CFG.r_lr, CFG.t_lr,
        )
        ours = camera.undistort_rectify_map(CFG.k_left, CFG.dist_left, R1, P1, SIZE)
        mx, my = cv2.initUndistortRectifyMap(
            CFG.k_left, CFG.dist_left, R1, P1, SIZE, cv2.CV_32FC1
        )
        np.testing.assert_allclose(ours[..., 0], mx, atol=1e-3)
        np.testing.assert_allclose(ours[..., 1], my, atol=1e-3)

    def test_map_inverts_distortion(self):
        """map(rectified_project(X)) == distorted_project(X) for true points."""
        cm = camera.CameraModel.from_config(CFG)
        rng = np.random.default_rng(2)
        n = 100
        X_l = np.stack([
            rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 15, n)
        ], axis=1)
        # rectified pixel
        Xr = (cm.R1 @ X_l.T).T
        u = cm.fx * Xr[:, 0] / Xr[:, 2] + cm.cx
        v = cm.fy * Xr[:, 1] / Xr[:, 2] + cm.cy
        inb = (u >= 1) & (u < SIZE[0] - 1) & (v >= 1) & (v < SIZE[1] - 1)
        # raw distorted pixel
        xn, yn = X_l[:, 0] / X_l[:, 2], X_l[:, 1] / X_l[:, 2]
        xd, yd = camera._distort(xn, yn, CFG.dist_left)
        u_raw = xd * CFG.k_left[0, 0] + CFG.k_left[0, 2]
        v_raw = yd * CFG.k_left[1, 1] + CFG.k_left[1, 2]
        # bilinear sample of the map at (u, v) should hit (u_raw, v_raw)
        from scipy.ndimage import map_coordinates
        got_x = map_coordinates(cm.map_left[..., 0], [v[inb], u[inb]], order=1)
        got_y = map_coordinates(cm.map_left[..., 1], [v[inb], u[inb]], order=1)
        np.testing.assert_allclose(got_x, u_raw[inb], atol=5e-3)
        np.testing.assert_allclose(got_y, v_raw[inb], atol=5e-3)


class TestCameraModel:
    def test_from_config(self):
        cm = camera.CameraModel.from_config(CFG)
        assert cm.map_left.shape == (SIZE[1], SIZE[0], 2)
        assert 0.10 < cm.baseline < 0.12  # EuRoC baseline ~0.11 m
        np.testing.assert_allclose(cm.R_bc @ cm.R_cb, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(cm.R_bc @ cm.p_cb + cm.p_bc, 0, atol=1e-12)
