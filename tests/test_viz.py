"""Offline visualization: BA reprojection overlay + projection consistency."""

import numpy as np
import pytest

from pose_estimation_tpu import viz


def _random_scene(seed=0, n=40):
    rng = np.random.default_rng(seed)
    pos_w = rng.normal(size=(n, 3)) * 2 + np.array([0, 0, 6.0])
    # modest body pose + body->camera rotation (z-forward camera)
    r_cb = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    p_cb = np.array([0.05, -0.02, 0.01])
    th = 0.1
    R_wb = np.array([
        [np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]
    ])
    p_wb = np.array([0.3, -0.2, 0.1])
    return pos_w, R_wb, p_wb, r_cb, p_cb


class TestProjection:
    def test_matches_residual_module(self):
        """project_points must realize the exact camera chain of the BA
        reprojection residual (`residuals.py:196`): feeding its own
        projections back as observations yields zero error."""
        import jax.numpy as jnp

        from pose_estimation_tpu.backend import residuals as res

        pos_w, R_wb, p_wb, r_cb, p_cb = _random_scene()
        fx, fy, cx, cy = 260.0, 262.0, 320.0, 240.0
        # camera points z-forward; keep only landmarks in front
        px, ok = viz.project_points(pos_w, R_wb, p_wb, r_cb, p_cb, fx, fy, cx, cy)
        assert ok.sum() > 10
        err, _, _ = res.reprojection_error_and_jacobian(
            jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(pos_w),
            jnp.asarray(px), jnp.asarray(r_cb), jnp.asarray(p_cb),
            fx, fy, cx, cy, jnp.asarray([1.0, 1.0]),
        )
        np.testing.assert_allclose(np.asarray(err)[ok], 0.0, atol=1e-3)


class TestOverlay:
    def test_overlay_written_and_errors_reported(self, tmp_path):
        pytest.importorskip("matplotlib")
        pos_w, R_wb, p_wb, r_cb, p_cb = _random_scene()
        fx, fy, cx, cy = 260.0, 262.0, 320.0, 240.0
        after, ok = viz.project_points(pos_w, R_wb, p_wb, r_cb, p_cb, fx, fy, cx, cy)
        rng = np.random.default_rng(1)
        obs = after + rng.normal(0, 0.5, after.shape)       # measured pixels
        before = after + rng.normal(0, 6.0, after.shape)    # pre-solve guess
        img = rng.uniform(0, 255, (480, 640))
        out = viz.plot_ba_overlay(
            img, obs, before, after, ok, str(tmp_path / "ovl.png")
        )
        import os

        assert os.path.exists(out) and os.path.getsize(out) > 10_000
