"""Full BA (Schur landmark elimination): recovers poses AND landmarks."""

import jax
import jax.numpy as jnp
import numpy as np

from test_backend import GRAVITY, build_synthetic_window

from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend import full_ba
from pose_estimation_tpu.models import window as win_mod
from pose_estimation_tpu.utils import lie

import pytest

pytestmark = pytest.mark.slow  # long jit compiles; excluded from the fast tier


def make_window(seed=40, n_landmarks=60):
    wsize = 4
    R, p, v, ics, obs, calib = build_synthetic_window(
        seed=seed, n_landmarks=n_landmarks
    )
    dtype = jnp.float64
    win = win_mod.WindowState(
        R=R, v=v, p=p,
        dbg=jnp.zeros((wsize + 1, 3), dtype),
        dba=jnp.zeros((wsize + 1, 3), dtype),
        ics=ics, is_keyframe=jnp.asarray(True),
        need_reinit=jnp.asarray(False), sum_imu_time=jnp.zeros((), dtype),
        n_act=jnp.asarray(wsize, jnp.int32),
    )
    return win, obs, calib, R, p


class TestFullBA:
    def test_recovers_poses_and_landmarks(self):
        win, obs, calib, R_true, p_true = make_window()
        wsize = 4
        rng = np.random.default_rng(51)
        # perturb poses AND landmarks
        pert_R = win.R.at[1:].set(
            win.R[1:] @ lie.so3_exp(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.01))
        )
        pert_p = win.p.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.03))
        win_pert = win._replace(R=pert_R, p=pert_p)
        lm_noise = jnp.asarray(rng.normal(size=obs.pos.shape) * 0.05)
        obs_pert = obs._replace(pos=obs.pos + lm_noise)

        dpose, dvdbga, dlm, info = full_ba.full_ba(
            win_pert, obs_pert, calib, GRAVITY, prior_factor=1e-5,
            max_iterations=25,
        )
        assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-2

        win_opt = win_mod.apply_deltas(win_pert, dpose, dvdbga, 0.1, 0.6)
        for k in range(1, wsize + 1):
            dr = lie.so3_log(win_opt.R[k].T @ R_true[k])
            assert np.linalg.norm(np.asarray(dr)) < 5e-3, k
            assert np.linalg.norm(np.asarray(win_opt.p[k] - p_true[k])) < 2e-2, k
        # landmarks observed >= 2x must move back toward the truth
        mask = np.asarray(jnp.sum(obs.mask, axis=1) >= 2)
        lm_opt = np.asarray(obs_pert.pos + dlm)
        err_before = np.linalg.norm(np.asarray(lm_noise)[mask], axis=1)
        err_after = np.linalg.norm(lm_opt[mask] - np.asarray(obs.pos)[mask], axis=1)
        assert err_after.mean() < err_before.mean() * 0.8

    def test_agrees_with_motion_only_when_landmarks_frozen_clean(self):
        """With exact landmarks, the pose solution should be close to the
        motion-only solution."""
        win, obs, calib, R_true, p_true = make_window(seed=41)
        wsize = 4
        rng = np.random.default_rng(52)
        pert_R = win.R.at[1:].set(
            win.R[1:] @ lie.so3_exp(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.01))
        )
        win_pert = win._replace(R=pert_R)

        dp1, dv1, _ = ba_mod.motion_only_ba(
            win_pert, obs, calib, GRAVITY, 1e-5, 30
        )
        dp2, dv2, dlm, _ = full_ba.full_ba(
            win_pert, obs, calib, GRAVITY, 1e-5, 25
        )
        w1 = win_mod.apply_deltas(win_pert, dp1, dv1, 0.1, 0.6)
        w2 = win_mod.apply_deltas(win_pert, dp2, dv2, 0.1, 0.6)
        for k in range(1, wsize + 1):
            dr = lie.so3_log(w1.R[k].T @ w2.R[k])
            assert np.linalg.norm(np.asarray(dr)) < 2e-3
            assert np.linalg.norm(np.asarray(w1.p[k] - w2.p[k])) < 5e-3
