"""IMU preintegration: lax.scan vs a straight-line numpy oracle.

The oracle below re-derives the Forster-style preintegration recurrences (the
same closed forms as reference `src/imu-preintegrator.cpp:245-297`) in plain
numpy, fed identical samples — the fidelity gate is identical deltas to float
tolerance.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.utils import lie


def _np_jr(omega):
    t2 = float(omega @ omega)
    t = np.sqrt(t2)
    k = np.array([
        [0, -omega[2], omega[1]],
        [omega[2], 0, -omega[0]],
        [-omega[1], omega[0], 0],
    ])
    if t < 1e-7:
        return np.eye(3) - 0.5 * k + k @ k / 6.0
    return (
        np.eye(3)
        - (1 - np.cos(t)) / t2 * k
        + (t - np.sin(t)) / (t2 * t) * (k @ k)
    )


def numpy_oracle(gyr, acc, bg, ba, dt, cov_noise_d):
    """Sequential preintegration, plain numpy."""
    dR = np.eye(3)
    dv = np.zeros(3)
    dp = np.zeros(3)
    dRbg = np.zeros((3, 3))
    dvbg = np.zeros((3, 3))
    dvba = np.zeros((3, 3))
    dpbg = np.zeros((3, 3))
    dpba = np.zeros((3, 3))
    cov = np.zeros((9, 9))
    covN = np.diag(cov_noise_d)
    dt2 = dt * dt
    for g, a in zip(gyr, acc):
        ubg = g - bg
        uba = a - ba
        omega = ubg * dt
        step = ScipyRot.from_rotvec(omega).as_matrix()
        jr = _np_jr(omega)
        hat_a = np.array([
            [0, -uba[2], uba[1]],
            [uba[2], 0, -uba[0]],
            [-uba[1], uba[0], 0],
        ])
        temp = dR @ hat_a
        # covariance propagation
        A = np.zeros((9, 9))
        A[0:3, 0:3] = step.T
        A[3:6, 0:3] = -temp * dt
        A[3:6, 3:6] = np.eye(3)
        A[6:9, 0:3] = -temp * dt2 / 2
        A[6:9, 3:6] = np.eye(3) * dt
        A[6:9, 6:9] = np.eye(3)
        B = np.zeros((9, 6))
        B[0:3, 0:3] = jr * dt
        B[3:6, 3:6] = dR * dt
        B[6:9, 3:6] = dR * dt2 / 2
        cov = A @ cov @ A.T + B @ covN @ B.T
        # bias jacobians (use previous-step values on the RHS)
        temp2 = temp @ dRbg
        new_dRbg = step.T @ dRbg - jr * dt
        new_dvbg = dvbg - temp2 * dt
        new_dvba = dvba - dR * dt
        new_dpbg = dpbg + dvbg * dt - temp2 * dt2 / 2
        new_dpba = dpba + dvba * dt - dR * dt2 / 2
        # state integration (uses previous dR, dv)
        new_dv = dv + dR @ uba * dt
        new_dp = dp + dv * dt + dR @ uba * dt2 / 2
        new_dR = dR @ step
        dR, dv, dp = new_dR, new_dv, new_dp
        dRbg, dvbg, dvba, dpbg, dpba = new_dRbg, new_dvbg, new_dvba, new_dpbg, new_dpba
    return dict(dR=dR, dv=dv, dp=dp, dRbg=dRbg, dvbg=dvbg, dvba=dvba,
                dpbg=dpbg, dpba=dpba, cov=cov)


def make_params(dt=0.005):
    # EuRoC-like noise magnitudes
    gyr_n = 1.6968e-04 / np.sqrt(dt)
    acc_n = 2.0e-3 / np.sqrt(dt)
    return pre.ImuParams(
        cov_noise_d=jnp.asarray([gyr_n**2] * 3 + [acc_n**2] * 3, jnp.float64),
        cov_bias=jnp.asarray([1.9393e-05**2] * 3 + [3.0e-3**2] * 3, jnp.float64),
        dt=jnp.asarray(dt, jnp.float64),
    )


def make_samples(m=40, seed=0):
    rng = np.random.default_rng(seed)
    gyr = rng.normal(size=(m, 3)) * 0.3
    acc = rng.normal(size=(m, 3)) * 2.0 + np.array([0.0, 0.0, 9.81])
    return gyr, acc


class TestParallelFormulation:
    def test_matches_sequential_exactly(self):
        """The associative-scan formulation must equal the sequential scan
        to machine epsilon — with carry-in state, bias, and masking."""
        gyr, acc = make_samples(40, seed=9)
        params = make_params()
        bg = jnp.asarray([0.01, -0.02, 0.005])
        ba = jnp.asarray([-0.05, 0.1, 0.02])
        mask = jnp.asarray(np.arange(40) < 33)
        s0 = pre.integrate_chunk_sequential(
            pre.init_state(jnp.float64), jnp.asarray(gyr[:10]), jnp.asarray(acc[:10]),
            jnp.ones(10, bool), bg, ba, params)
        seq = pre.integrate_chunk_sequential(
            s0, jnp.asarray(gyr), jnp.asarray(acc), mask, bg, ba, params)
        par = pre.integrate_chunk(
            s0, jnp.asarray(gyr), jnp.asarray(acc), mask, bg, ba, params)
        for name in seq._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(par, name)), np.asarray(getattr(seq, name)),
                atol=1e-13, err_msg=name)


class TestPreintegration:
    def test_matches_numpy_oracle(self):
        gyr, acc = make_samples()
        bg = np.array([0.01, -0.02, 0.005])
        ba = np.array([-0.05, 0.1, 0.02])
        params = make_params()
        oracle = numpy_oracle(gyr, acc, bg, ba, 0.005, np.asarray(params.cov_noise_d))

        st = pre.init_state(jnp.float64)
        st = pre.integrate_chunk(
            st, jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(len(gyr), bool), jnp.asarray(bg), jnp.asarray(ba), params,
        )
        np.testing.assert_allclose(np.asarray(st.dR), oracle["dR"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.dv), oracle["dv"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.dp), oracle["dp"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.d_R_bg), oracle["dRbg"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.d_v_bg), oracle["dvbg"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.d_v_ba), oracle["dvba"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.d_p_bg), oracle["dpbg"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.d_p_ba), oracle["dpba"], atol=1e-12)
        # tiny cross-covariances (~1e-17) differ only by summation order
        np.testing.assert_allclose(np.asarray(st.cov9), oracle["cov"], rtol=1e-6, atol=1e-18)
        assert np.isclose(float(st.dt), 40 * 0.005)

    def test_masking_equals_truncation(self):
        """Padded samples must not change the result."""
        gyr, acc = make_samples(24)
        bg = np.zeros(3)
        ba = np.zeros(3)
        params = make_params()
        st_full = pre.integrate_chunk(
            pre.init_state(jnp.float64), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(24, bool), jnp.asarray(bg), jnp.asarray(ba), params)
        pad_g = np.concatenate([gyr, np.full((8, 3), 1e9)])
        pad_a = np.concatenate([acc, np.full((8, 3), -1e9)])
        mask = np.concatenate([np.ones(24, bool), np.zeros(8, bool)])
        st_pad = pre.integrate_chunk(
            pre.init_state(jnp.float64), jnp.asarray(pad_g), jnp.asarray(pad_a),
            jnp.asarray(mask), jnp.asarray(bg), jnp.asarray(ba), params)
        for a, b in zip(st_full, st_pad):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_chunked_equals_single(self):
        """Integrating in two chunks == one chunk (constraint persistence)."""
        gyr, acc = make_samples(40, seed=3)
        bg = np.array([0.01, 0.0, -0.01])
        ba = np.zeros(3)
        params = make_params()
        one = pre.integrate_chunk(
            pre.init_state(jnp.float64), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(40, bool), jnp.asarray(bg), jnp.asarray(ba), params)
        two = pre.init_state(jnp.float64)
        for lo, hi in ((0, 20), (20, 40)):
            two = pre.integrate_chunk(
                two, jnp.asarray(gyr[lo:hi]), jnp.asarray(acc[lo:hi]),
                jnp.ones(20, bool), jnp.asarray(bg), jnp.asarray(ba), params)
        for a, b in zip(one, two):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-15)

    def test_finalize_inverse(self):
        gyr, acc = make_samples(30, seed=4)
        params = make_params()
        st = pre.integrate_chunk(
            pre.init_state(jnp.float64), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(30, bool), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params)
        ic = pre.finalize(st, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params)
        cov15 = np.zeros((15, 15))
        cov15[:9, :9] = np.asarray(st.cov9)
        cov15[9:, 9:] = np.diag(np.asarray(params.cov_bias)) * float(st.dt)
        np.testing.assert_allclose(
            np.asarray(ic.inv_cov) @ cov15, np.eye(15), atol=1e-6)

    def test_repropagate_first_order(self):
        """repropagate(ic, db) ~ re-integrating with bias + db (first order)."""
        gyr, acc = make_samples(40, seed=5)
        params = make_params()
        bg0 = np.zeros(3)
        ba0 = np.zeros(3)
        dbg = np.array([1e-4, -2e-4, 5e-5])
        dba = np.array([-3e-4, 1e-4, 2e-4])

        def run(bg, ba):
            st = pre.integrate_chunk(
                pre.init_state(jnp.float64), jnp.asarray(gyr), jnp.asarray(acc),
                jnp.ones(40, bool), jnp.asarray(bg), jnp.asarray(ba), params)
            return pre.finalize(st, jnp.asarray(bg), jnp.asarray(ba), params)

        ic0 = run(bg0, ba0)
        ic1 = run(bg0 + dbg, ba0 + dba)
        ic_rep = pre.repropagate(ic0, jnp.asarray(dbg), jnp.asarray(dba))
        np.testing.assert_allclose(np.asarray(ic_rep.dR), np.asarray(ic1.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ic_rep.dv), np.asarray(ic1.dv), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ic_rep.dp), np.asarray(ic1.dp), atol=1e-6)

    def test_predict_consistency(self):
        """predict() must invert the residual definition: zero residual at the
        predicted state (gravity cancels)."""
        gyr, acc = make_samples(20, seed=6)
        params = make_params()
        st = pre.integrate_chunk(
            pre.init_state(jnp.float64), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(20, bool), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params)
        ic = pre.finalize(st, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), params)
        rng = np.random.default_rng(7)
        R_i = lie.so3_exp(jnp.asarray(rng.normal(size=3)))
        v_i = jnp.asarray(rng.normal(size=3))
        p_i = jnp.asarray(rng.normal(size=3) * 4)
        gravity = jnp.asarray([0.0, 0.0, -9.81])
        R_j, v_j, p_j = pre.predict(R_i, v_i, p_i, ic, gravity)
        # residuals as in the ImuCostFunction (cost-functions.hpp:286-304)
        r_res = lie.so3_log(ic.dR.T @ (R_i.T @ R_j))
        v_res = R_i.T @ (v_j - v_i - gravity * ic.dt) - ic.dv
        p_res = R_i.T @ (p_j - p_i - v_i * ic.dt - gravity * ic.dt2 / 2) - ic.dp
        np.testing.assert_allclose(np.asarray(r_res), 0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(v_res), 0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(p_res), 0, atol=1e-12)
