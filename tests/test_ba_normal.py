"""Normal-equations motion-BA path == dense-Jacobian path.

`ba.build_normal_problem` + `lm.lm_solve_normal` (the hot path: constant
Gram blocks, linear reprojection, per-landmark Huber sums) must solve the
SAME problem as `ba.build_problem` + `lm.lm_solve` (the oracle surface
validated against scipy in test_lm_oracle.py). H/g/cost agree at arbitrary
iterates and the full solves land on the same deltas.
"""

import jax
import jax.numpy as jnp
import numpy as np

from test_backend import GRAVITY, build_synthetic_window

from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.models import window as win_mod


def make_window(seed=50, n_landmarks=80, perturb=True):
    wsize = 4
    R, p, v, ics, obs, calib = build_synthetic_window(
        seed=seed, n_landmarks=n_landmarks
    )
    dtype = jnp.float64
    win = win_mod.WindowState(
        R=R, v=v, p=p,
        dbg=jnp.zeros((wsize + 1, 3), dtype),
        dba=jnp.zeros((wsize + 1, 3), dtype),
        ics=ics,
        is_keyframe=jnp.asarray(True),
        need_reinit=jnp.asarray(False),
        sum_imu_time=jnp.zeros((), dtype),
        n_act=jnp.asarray(wsize, jnp.int32),
    )
    if perturb:
        from pose_estimation_tpu.utils import lie

        rng = np.random.default_rng(seed + 1)
        win = win._replace(
            R=win.R.at[1:].set(
                win.R[1:]
                @ lie.so3_exp(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.02))
            ),
            p=win.p.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.05)),
            v=win.v.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.1)),
        )
    return win, obs, calib


class TestNormalEquationsPath:
    def test_normal_fn_matches_dense(self):
        """H, g, cost from build_normal_problem == J^T W J, J^T W r,
        0.5 r^T W r from the dense problem, at several iterates."""
        win, obs, calib = make_window()
        residual_fn, jac, weight_fn, x0, aux = ba_mod.build_problem(
            win, obs, calib, GRAVITY, 1e-5
        )
        normal_fn, x0n, _ = ba_mod.build_normal_problem(
            win, obs, calib, GRAVITY, 1e-5
        )
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x0n))

        rng = np.random.default_rng(7)
        for trial in range(3):
            x = (
                x0
                if trial == 0
                else jnp.asarray(rng.normal(size=x0.shape) * 0.02)
            )
            r = residual_fn(x)
            w = weight_fn(r)
            h_d = (jac.T * w[None, :]) @ jac
            g_d = (jac.T * w[None, :]) @ r
            # TRUE robustified cost (Ceres convention) on both paths
            c_d = aux["cost_fn"](r)
            h_n, g_n, c_n = normal_fn(x)
            np.testing.assert_allclose(
                np.asarray(h_n), np.asarray(h_d), rtol=1e-9, atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(g_n), np.asarray(g_d), rtol=1e-9, atol=1e-9
            )
            np.testing.assert_allclose(
                float(c_n), float(c_d), rtol=1e-10
            )

    def test_solutions_agree(self):
        """Full LM solves land on the same deltas (fp-order differences
        only; the problem is well-conditioned so both converge tightly)."""
        win, obs, calib = make_window()
        residual_fn, jac, weight_fn, x0, aux_d = ba_mod.build_problem(
            win, obs, calib, GRAVITY, 1e-5
        )
        x_dense, info_d = lm_mod.lm_solve(
            residual_fn, jac, x0, weight_fn,
            lm_mod.LMOptions(max_iterations=30),
            cost_fn=aux_d["cost_fn"],
        )
        normal_fn, x0n, _ = ba_mod.build_normal_problem(
            win, obs, calib, GRAVITY, 1e-5
        )
        x_norm, info_n = lm_mod.lm_solve_normal(
            normal_fn, x0n, lm_mod.LMOptions(max_iterations=30)
        )
        assert float(info_n["final_cost"]) <= float(info_d["initial_cost"])
        np.testing.assert_allclose(
            np.asarray(x_norm), np.asarray(x_dense), atol=5e-8
        )
        np.testing.assert_allclose(
            float(info_n["final_cost"]), float(info_d["final_cost"]),
            rtol=1e-6,
        )

    def test_jit_and_growth_window(self):
        """Jits cleanly and honors the n_act growth masking (anchor pair as
        prior, inactive pairs zero) like the dense path."""
        win, obs, calib = make_window()
        win = win._replace(n_act=jnp.asarray(2, jnp.int32))

        @jax.jit
        def run(win):
            return ba_mod.motion_only_ba(
                win, obs, calib, GRAVITY, 1e-5, max_iterations=15
            )

        dpose, dvdbga, info = run(win)
        assert np.all(np.isfinite(np.asarray(dpose)))
        assert np.all(np.isfinite(np.asarray(dvdbga)))
        assert float(info["final_cost"]) < float(info["initial_cost"])

        # dense path on the same grown window agrees
        residual_fn, jac, weight_fn, x0, _ = ba_mod.build_problem(
            win, obs, calib, GRAVITY, 1e-5
        )
        x_dense, _ = lm_mod.lm_solve(
            residual_fn, jac, x0, weight_fn,
            lm_mod.LMOptions(max_iterations=15),
        )
        wsize = 4
        np.testing.assert_allclose(
            np.asarray(dpose).ravel(),
            np.asarray(x_dense[: 6 * wsize]).ravel(),
            atol=5e-7,
        )
