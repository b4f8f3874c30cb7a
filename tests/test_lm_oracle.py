"""Independent LM-solver oracle (SURVEY.md section 4: "an LM solver test
against Ceres on a recorded problem").

The exact motion-only-BA problem our `lm_solve` minimizes — residual
closure, frozen whitened Jacobian, IRLS weights — is exposed by
`ba.build_problem` and handed to `scipy.optimize.least_squares` (an
independent trust-region implementation, TRF). Both solvers must land on
the same minimum.

The frozen Jacobian is reference-faithful: the reference's analytic
Jacobians are evaluated at the stored window state, never at the applied
increments (`/root/reference/include/cfsd/cost-functions.hpp:332,343`), and
the reprojection term is pre-linearized (`optimizer.cpp:87-120`). scipy is
given the same frozen J so the two solve the identical fixed point
J^T W r(x*) = 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from test_backend import GRAVITY, build_synthetic_window

from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.models import window as win_mod
from pose_estimation_tpu.utils import lie


def _perturbed_problem(seed=50, px_noise=0.05):
    """A mid-sequence motion-only BA instance: synthetic window, perturbed
    active frames, low pixel noise (keeps the Huber loss inactive so the
    IRLS weights are constant 0/1 masks and scipy sees a smooth problem)."""
    wsize = 4
    R, p, v, ics, obs, calib = build_synthetic_window(
        seed=seed, wsize=wsize, px_noise=px_noise
    )
    dtype = jnp.float64
    rng = np.random.default_rng(seed + 1)
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
    pert_R = win.R.at[1:].set(
        win.R[1:] @ lie.so3_exp(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.02))
    )
    pert_p = win.p.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.05))
    pert_v = win.v.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.1))
    win_pert = win._replace(R=pert_R, p=pert_p, v=pert_v)
    return ba_mod.build_problem(win_pert, obs, calib, GRAVITY, 1e-5)


class TestLMOracle:
    @pytest.mark.parametrize("seed", [50, 51, 52])
    def test_matches_scipy_minimum(self, seed):
        residual_fn, jac, weight_fn, x0, aux = _perturbed_problem(seed=seed)
        n = x0.shape[0]

        # FREEZE the Huber/IRLS weights at x0 so both solvers minimize the
        # identical fixed-weight nonlinear least-squares problem (IRLS
        # reweighting is solver policy, not part of the problem; the
        # robustified comparison is the huber test below)
        w0 = jnp.asarray(weight_fn(residual_fn(x0)))
        w0_np = np.asarray(w0)
        sqrt_w = np.sqrt(w0_np)
        r_jit = jax.jit(residual_fn)

        def fun(x):
            return sqrt_w * np.asarray(r_jit(jnp.asarray(x)))

        jac_np = np.asarray(jac) * sqrt_w[:, None]

        sol = scipy_opt.least_squares(
            fun, np.zeros(n), jac=lambda x: jac_np, method="trf",
            xtol=1e-14, ftol=1e-14, gtol=1e-14,
        )
        assert sol.cost > 0.0 or sol.success

        x_ours, info = lm_mod.lm_solve(
            residual_fn, jac, x0, lambda r: w0,
            lm_mod.LMOptions(max_iterations=60, function_tolerance=1e-14,
                             parameter_tolerance=1e-14),
        )
        x_ours = np.asarray(x_ours)

        cost_ours = float(info["final_cost"])
        cost_scipy = float(sol.cost)
        # same minimum (cost within 0.1%, parameters within 1e-4)
        assert cost_ours <= cost_scipy * 1.001 + 1e-12, (cost_ours, cost_scipy)
        np.testing.assert_allclose(x_ours, sol.x, atol=1e-4)

    def test_huber_irls_matches_scipy_soft_l1_free_minimum(self):
        """With outliers present, our IRLS-Huber solve must reach a cost (in
        the TRUE Huber objective) at least as low as scipy solving the same
        robustified problem via its native huber loss."""
        residual_fn, jac, weight_fn, x0, aux = _perturbed_problem(
            seed=53, px_noise=0.0
        )
        wsize = aux["wsize"]
        m_pairs = 15 * wsize

        x_ours, info = lm_mod.lm_solve(
            residual_fn, jac, x0, weight_fn,
            lm_mod.LMOptions(max_iterations=60),
        )

        def huber_cost(x):
            r = np.asarray(residual_fn(jnp.asarray(x)))
            w = np.asarray(weight_fn(jnp.asarray(r)))
            # true Huber objective: 0.5 sum rho(||block||^2) over landmark
            # blocks + 0.5 ||pair residuals||^2
            pair = r[:m_pairs] * (w[:m_pairs] > 0)
            cost = 0.5 * float(pair @ pair)
            rep = r[m_pairs:].reshape(-1, wsize * 2)
            wrep = w[m_pairs:].reshape(-1, wsize * 2)[:, 0]
            s = (rep * rep).sum(axis=1)
            valid = wrep > 0
            rho = np.where(s <= 1.0, s, 2.0 * np.sqrt(np.maximum(s, 1e-32)) - 1.0)
            cost += 0.5 * float(rho[valid].sum())
            return cost

        c_ours = huber_cost(np.asarray(x_ours))
        c_zero = huber_cost(np.zeros_like(np.asarray(x0)))
        assert c_ours < c_zero * 0.05, (c_ours, c_zero)
