"""Online gravity refinement: recover a known world-gravity misalignment and
accelerometer bias from a synthetic keyframe chain.

Builds K keyframe states + K-1 exact preintegration constraints in a world
whose TRUE gravity is rotated away from the canonical axis, with the
constraints "measured" by a preintegrator that assumed zero acc bias while
the true bias is nonzero — exactly the situation after an imperfect
initialization (`optimizer.cpp:242-329` never revisits it; our
`init_solvers.refine_gravity` must)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.backend import init_solvers
from pose_estimation_tpu.imu.preintegration import ImuConstraint
from pose_estimation_tpu.utils import lie

pytestmark = pytest.mark.slow  # long jit compiles; excluded from the fast tier

G = 9.81


def _make_chain(k=12, dt_kf=0.4, rot_err=(0.03, -0.05, 0.0),
                ba_true=(0.15, -0.1, 0.2), seed=0):
    dtype = jnp.float64
    rng = np.random.default_rng(seed)
    unit_g = jnp.asarray([0.0, 0.0, -1.0], dtype)
    gravity = G * unit_g
    # true gravity direction is the canonical axis rotated by rot_err; the
    # refinement must find delta_r with exp(delta_r) g_true ~ g_canonical
    d_rm_err = np.asarray(lie.so3_exp(jnp.asarray(rot_err, dtype)))
    g_true = d_rm_err.T @ np.asarray(gravity)

    # a trajectory with real attitude variation (needed for g/ba
    # separability) and smooth velocities
    Rs, vs, ps = [np.eye(3)], [np.array([0.4, 0.1, 0.0])], [np.zeros(3)]
    for i in range(1, k):
        w = np.array([0.25 * np.sin(0.9 * i), 0.3 * np.cos(0.7 * i), 0.2])
        Rs.append(Rs[-1] @ np.asarray(lie.so3_exp(jnp.asarray(w * dt_kf))))
        vs.append(vs[-1] + rng.normal(0, 0.15, 3))
        ps.append(ps[-1] + vs[-2] * dt_kf + rng.normal(0, 0.01, 3))

    ba = np.asarray(ba_true)
    ics = []
    for i in range(k - 1):
        Ri, Rj = Rs[i], Rs[i + 1]
        vi, vj = vs[i], vs[i + 1]
        pi, pj = ps[i], ps[i + 1]
        # exact deltas in the TRUE world (gravity = g_true)
        dv_ideal = Ri.T @ (vj - vi - g_true * dt_kf)
        dp_ideal = Ri.T @ (pj - pi - vi * dt_kf - g_true * dt_kf**2 / 2)
        d_v_ba = -dt_kf * np.eye(3)
        d_p_ba = -(dt_kf**2 / 2) * np.eye(3)
        # preintegrated at assumed bias 0 while true bias = ba:
        # delta(0) = delta(ba) - J_ba @ ba
        dv_meas = dv_ideal - d_v_ba @ ba
        dp_meas = dp_ideal - d_p_ba @ ba
        z3 = jnp.zeros((3, 3), dtype)
        ics.append(ImuConstraint(
            inv_cov=jnp.eye(15, dtype=dtype) * 1e4,
            bg_i=jnp.zeros(3, dtype), ba_i=jnp.zeros(3, dtype),
            dR=jnp.asarray(Ri.T @ Rj, dtype),
            dv=jnp.asarray(dv_meas, dtype),
            dp=jnp.asarray(dp_meas, dtype),
            d_R_bg=-dt_kf * jnp.eye(3, dtype=dtype),
            d_v_bg=z3, d_v_ba=jnp.asarray(d_v_ba, dtype),
            d_p_bg=z3, d_p_ba=jnp.asarray(d_p_ba, dtype),
            dt=jnp.asarray(dt_kf, dtype),
            dt2=jnp.asarray(dt_kf**2, dtype),
        ))
    ics = jax.tree.map(lambda *a: jnp.stack(a), *ics)
    R = jnp.asarray(np.stack(Rs), dtype)
    p = jnp.asarray(np.stack(ps), dtype)
    return R, p, ics, unit_g, gravity, np.asarray(rot_err), ba


class TestRefineGravity:
    def test_recovers_misalignment_and_bias(self):
        """Pure-solver arm: with no state-noise inflation (the chain IS
        exact) the constrained tilt solve recovers the planted
        misalignment/bias nearly exactly."""
        R, p, ics, unit_g, gravity, rot_err, ba_true = _make_chain()
        g_est, delta_r, dba = init_solvers.refine_gravity(
            R, p, ics, unit_g, (0, 1), gravity, rounds=3,
            sigma_v=0.0, sigma_p=0.0,
        )
        # final-round gravity magnitude is physical
        assert abs(float(jnp.linalg.norm(g_est)) - G) < 0.15
        # the recovered world rotation maps the TRUE gravity direction onto
        # the canonical axis (only the direction is observable — delta_r's
        # components need not equal the planted vector)
        d_rm_err = np.asarray(lie.so3_exp(jnp.asarray(rot_err, jnp.float64)))
        g_true = d_rm_err.T @ np.asarray(gravity)
        d_rm = np.asarray(lie.so3_exp(delta_r))
        aligned = d_rm @ g_true
        cosang = aligned @ np.asarray(gravity) / (G * G)
        assert cosang > 1 - 1e-5, (aligned, cosang)
        np.testing.assert_allclose(np.asarray(dba), ba_true, atol=5e-2)

    def test_production_sigmas_improve_conservatively(self):
        """With the in-pipeline state-noise inflation the correction is
        deliberately partial — it must still reduce the misalignment and
        must never overshoot the planted bias."""
        R, p, ics, unit_g, gravity, rot_err, ba_true = _make_chain()
        g_est, delta_r, dba = init_solvers.refine_gravity(
            R, p, ics, unit_g, (0, 1), gravity
        )
        d_rm_err = np.asarray(lie.so3_exp(jnp.asarray(rot_err, jnp.float64)))
        g_true = d_rm_err.T @ np.asarray(gravity)
        cos_before = g_true @ np.asarray(gravity) / (G * G)
        d_rm = np.asarray(lie.so3_exp(delta_r))
        cos_after = (d_rm @ g_true) @ np.asarray(gravity) / (G * G)
        assert cos_after > cos_before          # tilt reduced ...
        assert float(jnp.linalg.norm(dba)) < 1.5 * np.linalg.norm(ba_true)

    def test_clean_chain_is_a_fixed_point(self):
        """With no misalignment and zero bias the refinement must return
        ~identity corrections (it runs periodically in-pipeline; a biased
        fixed point would drag a healthy estimate away)."""
        R, p, ics, unit_g, gravity, _, _ = _make_chain(
            rot_err=(0.0, 0.0, 0.0), ba_true=(0.0, 0.0, 0.0)
        )
        g_est, delta_r, dba = init_solvers.refine_gravity(
            R, p, ics, unit_g, (0, 1), gravity
        )
        assert float(jnp.linalg.norm(delta_r)) < 1e-4
        assert float(jnp.linalg.norm(dba)) < 1e-3
