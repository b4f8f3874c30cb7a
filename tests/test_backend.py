"""Backend tests: analytic Jacobians vs jax.jacfwd, LM solver, motion-only BA."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend import init_solvers
from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend import residuals as res
from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.models import window as win_mod
from pose_estimation_tpu.utils import lie

DT = 0.005


def make_ic(seed=0, m=40, bg=None, ba=None):
    rng = np.random.default_rng(seed)
    gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.3)
    acc = jnp.asarray(rng.normal(size=(m, 3)) * 1.5 + np.array([0, 0, 9.8]))
    params = pre.ImuParams(
        cov_noise_d=jnp.asarray([2.4e-3**2] * 3 + [2.8e-2**2] * 3),
        cov_bias=jnp.asarray([1.9e-5**2] * 3 + [3e-3**2] * 3),
        dt=jnp.asarray(DT),
    )
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba)
    st = pre.integrate_chunk(
        pre.init_state(jnp.float64), gyr, acc, jnp.ones(m, bool), bg, ba, params
    )
    return pre.finalize(st, bg, ba, params)


def rand_state(seed):
    rng = np.random.default_rng(seed)
    R = lie.so3_exp(jnp.asarray(rng.normal(size=3)))
    p = jnp.asarray(rng.normal(size=3) * 2)
    v = jnp.asarray(rng.normal(size=3))
    dbg = jnp.asarray(rng.normal(size=3) * 1e-3)
    dba = jnp.asarray(rng.normal(size=3) * 1e-2)
    return R, p, v, dbg, dba


GRAVITY = jnp.asarray([-9.81, 0.0, 0.0])


class TestImuJacobians:
    def test_match_jacfwd(self):
        ic = make_ic(1)
        R_i, p_i, v_i, dbg_i, dba_i = rand_state(10)
        R_j, p_j, v_j, dbg_j, dba_j = rand_state(11)

        def r_of(dpose_i, dvb_i, dpose_j, dvb_j):
            return res.imu_residual(
                dpose_i[0:3], dpose_i[3:6], dvb_i[0:3], dvb_i[3:6], dvb_i[6:9],
                dpose_j[0:3], dpose_j[3:6], dvb_j[0:3], dvb_j[3:6], dvb_j[6:9],
                R_i, p_i, v_i, dbg_i, dba_i,
                R_j, p_j, v_j, dbg_j, dba_j,
                ic, GRAVITY,
            )

        z6, z9 = jnp.zeros(6), jnp.zeros(9)
        j_num = jax.jacfwd(r_of, argnums=(0, 1, 2, 3))(z6, z9, z6, z9)
        j_ana = res.imu_jacobians(
            R_i, p_i, v_i, dbg_i, dba_i, R_j, p_j, v_j, ic, GRAVITY
        )
        for num, ana in zip(j_num, j_ana):
            np.testing.assert_allclose(np.asarray(ana), np.asarray(num), atol=2e-6, rtol=1e-4)

    def test_zero_residual_at_consistent_states(self):
        """Residual vanishes when state j is the IMU prediction of state i."""
        ic = make_ic(2)
        R_i, p_i, v_i, _, _ = rand_state(12)
        dbg = jnp.zeros(3)
        dba = jnp.zeros(3)
        R_j, v_j, p_j = pre.predict(R_i, v_i, p_i, ic, GRAVITY)
        z3, z6, z9 = jnp.zeros(3), jnp.zeros(6), jnp.zeros(9)
        r = res.imu_residual(
            z3, z3, z3, z3, z3, z3, z3, z3, z3, z3,
            R_i, p_i, v_i, dbg, dba, R_j, p_j, v_j, dbg, dba,
            ic, GRAVITY,
        )
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-8)


class TestPriorJacobians:
    def test_match_jacfwd(self):
        ic = make_ic(3)
        R_i, p_i, v_i, dbg_i, dba_i = rand_state(13)
        R_j, p_j, v_j, dbg_j, dba_j = rand_state(14)
        pf = 1e-5

        def r_of(dpose_j, dvb_j):
            return res.prior_residual(
                dpose_j[0:3], dpose_j[3:6], dvb_j[0:3], dvb_j[3:6], dvb_j[6:9],
                R_i, p_i, v_i, dbg_i, dba_i,
                R_j, p_j, v_j, dbg_j, dba_j,
                ic, GRAVITY, pf,
            )

        j_num = jax.jacfwd(r_of, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(9))
        j_ana = res.prior_jacobians(R_i, dbg_i, R_j, ic, pf)
        for num, ana in zip(j_num, j_ana):
            np.testing.assert_allclose(np.asarray(ana), np.asarray(num), atol=2e-8, rtol=1e-5)


class TestReprojection:
    def test_f_matches_jacfwd(self):
        rng = np.random.default_rng(20)
        R_wb = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.5))
        p_wb = jnp.asarray(rng.normal(size=3))
        r_cb = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.1))
        p_cb = jnp.asarray(rng.normal(size=3) * 0.05)
        lm_w = p_wb + R_wb @ (r_cb.T @ (jnp.asarray([0.3, -0.2, 5.0]) - p_cb))
        fx, fy, cx, cy = 400.0, 410.0, 370.0, 240.0
        inv_std = jnp.asarray([2.0, 2.0])
        pixel = jnp.asarray([350.0, 255.0])

        def err_of(dpose):
            R_new = R_wb @ lie.so3_exp(dpose[0:3])
            p_new = p_wb + R_wb @ dpose[3:6]
            e, _, _ = res.reprojection_error_and_jacobian(
                R_new, p_new, lm_w, pixel, r_cb, p_cb, fx, fy, cx, cy, inv_std
            )
            return e

        e0, f_ana, depth = res.reprojection_error_and_jacobian(
            R_wb, p_wb, lm_w, pixel, r_cb, p_cb, fx, fy, cx, cy, inv_std
        )
        assert float(depth) > 0
        j_num = jax.jacfwd(err_of)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(f_ana), np.asarray(j_num), atol=1e-8, rtol=1e-6)


class TestLMSolver:
    def test_linear_least_squares_exact(self):
        rng = np.random.default_rng(30)
        m, n = 50, 8
        A = jnp.asarray(rng.normal(size=(m, n)))
        b = jnp.asarray(rng.normal(size=m))
        x_ref = np.linalg.lstsq(np.asarray(A), -np.asarray(b), rcond=None)[0]
        x, info = lm_mod.lm_solve(lambda x: A @ x + b, A, jnp.zeros(n))
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
        assert int(info["iterations"]) <= 3

    def test_nonlinear_exponential_fit(self):
        """Frozen-Jacobian LM still converges on a mildly nonlinear problem."""
        t = jnp.linspace(0, 1, 20)
        y = jnp.exp(0.7 * t)

        def residual(x):
            return jnp.exp(x[0] * t) - y

        jac0 = jax.jacfwd(residual)(jnp.asarray([0.0]))
        x, _ = lm_mod.lm_solve(residual, jac0, jnp.asarray([0.0]),
                               options=lm_mod.LMOptions(max_iterations=100))
        np.testing.assert_allclose(float(x[0]), 0.7, atol=1e-4)


def build_synthetic_window(seed=40, wsize=4, n_landmarks=60, px_noise=0.0):
    """Ground-truth window + landmarks + consistent ImuConstraints."""
    rng = np.random.default_rng(seed)
    dt_kf = 0.5
    dtype = jnp.float64

    # smooth trajectory: W+1 states
    Rs, ps, vs = [jnp.eye(3, dtype=dtype)], [jnp.zeros(3, dtype)], [jnp.asarray([0.4, 0.1, 0.0], dtype)]
    for k in range(wsize):
        w_rot = jnp.asarray(rng.normal(size=3) * 0.15)
        Rs.append(Rs[-1] @ lie.so3_exp(w_rot))
        a_w = jnp.asarray(rng.normal(size=3) * 0.4)
        vs.append(vs[-1] + a_w * dt_kf)
        ps.append(ps[-1] + vs[-2] * dt_kf + 0.5 * a_w * dt_kf**2)
    R = jnp.stack(Rs)
    p = jnp.stack(ps)
    v = jnp.stack(vs)

    # constraints consistent with the truth (invert the residual definitions)
    ics = []
    for k in range(wsize):
        dR = R[k].T @ R[k + 1]
        dv = R[k].T @ (v[k + 1] - v[k] - GRAVITY * dt_kf)
        dp = R[k].T @ (p[k + 1] - p[k] - v[k] * dt_kf - GRAVITY * dt_kf**2 / 2)
        z33 = jnp.zeros((3, 3), dtype)
        ics.append(pre.ImuConstraint(
            inv_cov=jnp.eye(15, dtype=dtype) * 1e4,
            bg_i=jnp.zeros(3, dtype), ba_i=jnp.zeros(3, dtype),
            dR=dR, dv=dv, dp=dp,
            d_R_bg=z33, d_v_bg=z33, d_v_ba=z33, d_p_bg=z33, d_p_ba=z33,
            dt=jnp.asarray(dt_kf, dtype), dt2=jnp.asarray(dt_kf**2, dtype),
        ))
    ics = jax.tree.map(lambda *a: jnp.stack(a), *ics)

    # camera: identity extrinsics-ish, landmarks in front (+z in camera)
    r_cb = jnp.asarray(
        [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], dtype
    )  # body x -> cam z
    p_cb = jnp.asarray([0.01, -0.02, 0.03], dtype)
    calib = ba_mod.Calib(
        fx=jnp.asarray(400.0, dtype), fy=jnp.asarray(410.0, dtype),
        cx=jnp.asarray(376.0, dtype), cy=jnp.asarray(240.0, dtype),
        r_cb=r_cb, p_cb=p_cb,
        inv_std=jnp.asarray([2.0, 2.0], dtype),
    )

    # landmarks 4-10m ahead along body +x of the mid-window pose
    mid = wsize // 2
    lm_body = np.stack([
        rng.uniform(4, 10, n_landmarks),
        rng.uniform(-3, 3, n_landmarks),
        rng.uniform(-2, 2, n_landmarks),
    ], axis=1)
    lm_w = jnp.einsum("ij,lj->li", R[mid], jnp.asarray(lm_body, dtype)) + p[mid]

    # project into window frames 1..wsize
    def project(Rf, pf, X):
        xc = calib.r_cb @ (Rf.T @ (X - pf)) + calib.p_cb
        return jnp.asarray([
            calib.fx * xc[0] / xc[2] + calib.cx,
            calib.fy * xc[1] / xc[2] + calib.cy,
        ]), xc[2]

    px = np.zeros((n_landmarks, wsize, 2))
    mask = np.zeros((n_landmarks, wsize), bool)
    for l in range(n_landmarks):
        for w in range(wsize):
            uv, z = project(R[1 + w], p[1 + w], lm_w[l])
            uv = np.asarray(uv)
            if float(z) > 0.5 and 0 <= uv[0] < 752 and 0 <= uv[1] < 480:
                px[l, w] = uv + rng.normal(size=2) * px_noise
                mask[l, w] = True

    obs = ba_mod.LandmarkObs(pos=lm_w, px=jnp.asarray(px), mask=jnp.asarray(mask))
    return R, p, v, ics, obs, calib


class TestMotionOnlyBA:
    def test_recovers_perturbed_window(self):
        wsize = 4
        R, p, v, ics, obs, calib = build_synthetic_window()
        dtype = jnp.float64

        rng = np.random.default_rng(50)
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
        # perturb the active frames (not the anchor)
        pert_R = win.R.at[1:].set(
            win.R[1:] @ lie.so3_exp(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.02))
        )
        pert_p = win.p.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.05))
        pert_v = win.v.at[1:].add(jnp.asarray(rng.normal(size=(wsize, 3)) * 0.1))
        win_pert = win._replace(R=pert_R, p=pert_p, v=pert_v)

        dpose, dvdbga, info = ba_mod.motion_only_ba(
            win_pert, obs, calib, GRAVITY, prior_factor=1e-5, max_iterations=30
        )
        win_opt = win_mod.apply_deltas(win_pert, dpose, dvdbga, 0.1, 0.6)

        assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-3
        # poses recovered
        for k in range(1, wsize + 1):
            dr = lie.so3_log(win_opt.R[k].T @ R[k])
            assert np.linalg.norm(np.asarray(dr)) < 2e-3, k
            assert np.linalg.norm(np.asarray(win_opt.p[k] - p[k])) < 5e-3, k

    def test_masked_landmarks_ignored(self):
        """Landmarks with < 2 observations contribute nothing."""
        R, p, v, ics, obs, calib = build_synthetic_window(n_landmarks=30)
        wsize = 4
        dtype = jnp.float64
        win = win_mod.WindowState(
            R=R, v=v, p=p,
            dbg=jnp.zeros((wsize + 1, 3), dtype),
            dba=jnp.zeros((wsize + 1, 3), dtype),
            ics=ics, is_keyframe=jnp.asarray(True),
            need_reinit=jnp.asarray(False), sum_imu_time=jnp.zeros((), dtype),
            n_act=jnp.asarray(wsize, jnp.int32),
        )
        # kill all but one observation of the first 10 landmarks
        mask = np.asarray(obs.mask).copy()
        mask[:10, 1:] = False
        # corrupt their pixels wildly: must have zero effect
        px = np.asarray(obs.px).copy()
        px[:10] += 1e5
        obs2 = ba_mod.LandmarkObs(obs.pos, jnp.asarray(px), jnp.asarray(mask))
        obs3 = ba_mod.LandmarkObs(
            obs.pos, obs.px, jnp.asarray(mask)
        )
        d1 = ba_mod.motion_only_ba(win, obs2, calib, GRAVITY, 1e-5, 10)
        d2 = ba_mod.motion_only_ba(win, obs3, calib, GRAVITY, 1e-5, 10)
        np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]), atol=1e-12)


class TestInitSolvers:
    def test_gyr_bias_recovery(self):
        """Preintegrate gyro measurements corrupted by a constant bias with
        assumed-zero bias; the solver must recover the bias increment."""
        rng = np.random.default_rng(60)
        bg_true = np.array([0.02, -0.015, 0.01])
        wsize = 4
        m = 100
        params = pre.ImuParams(
            cov_noise_d=jnp.asarray([2.4e-3**2] * 3 + [2.8e-2**2] * 3),
            cov_bias=jnp.asarray([1.9e-5**2] * 3 + [3e-3**2] * 3),
            dt=jnp.asarray(DT),
        )
        R_list = [jnp.eye(3, dtype=jnp.float64)]
        ics = []
        for k in range(wsize - 1):
            omega_true = rng.normal(size=(m, 3)) * 0.4
            acc = rng.normal(size=(m, 3))
            # true rotation increment
            R_next = R_list[-1]
            for j in range(m):
                R_next = R_next @ lie.so3_exp(jnp.asarray(omega_true[j] * DT))
            R_list.append(R_next)
            gyr_meas = omega_true + bg_true
            st = pre.integrate_chunk(
                pre.init_state(jnp.float64), jnp.asarray(gyr_meas), jnp.asarray(acc),
                jnp.ones(m, bool), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params)
            ics.append(pre.finalize(st, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params))
        R = jnp.stack(R_list)
        ics = jax.tree.map(lambda *a: jnp.stack(a), *ics)
        # The solved increment is ADDED to the assumed bias
        # (`ImuPreintegrator::setInitialGyrBias`), so it equals +bg_true:
        # corrected dR = dR_meas exp(d_R_bg * dbg) with d_R_bg ~ -T*I.
        dbg, info = init_solvers.solve_gyr_bias(R, ics)
        np.testing.assert_allclose(np.asarray(dbg), bg_true, atol=2e-4)

    def test_alignment(self):
        init_g = jnp.asarray([-0.9, 0.3, 0.3])
        init_g = init_g / jnp.linalg.norm(init_g)
        unit_g = jnp.asarray([-1.0, 0.0, 0.0])
        delta_r, _ = init_solvers.solve_alignment(init_g, unit_g, (1, 2))
        rotated = lie.so3_exp(delta_r) @ init_g
        np.testing.assert_allclose(np.asarray(rotated), np.asarray(unit_g), atol=1e-6)
        assert float(delta_r[0]) == 0.0  # fixed axis untouched

    def test_gravity_velocity_linear(self):
        """With truth-consistent constraints the solver recovers gravity (in
        the SfM frame) and per-frame velocities."""
        R, p, v, ics, _, _ = build_synthetic_window(seed=70)
        wsize = 4
        # Constraints were built with world gravity; in the init problem the
        # "world" IS the SfM frame and gravity/velocities are the unknowns.
        g_est, dv, info = init_solvers.solve_gravity_velocity(R[:wsize], p[:wsize],
                                                              jax.tree.map(lambda a: a[:wsize-1], ics))
        np.testing.assert_allclose(np.asarray(g_est), np.asarray(GRAVITY), atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(v[:wsize]), atol=1e-6)
