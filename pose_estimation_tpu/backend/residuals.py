"""Residual functions + analytic Jacobians of the sliding-window VIO backend.

Pure-JAX re-derivation of the seven Ceres cost functions in the reference
(`/root/reference/include/cfsd/cost-functions.hpp`). Parameterization matches
the reference exactly: the solver works on *increments* relative to the
current window state,

    pose increment   delta_pose  = [delta_r(3), delta_p(3)]   (per frame)
    speed/bias inc   delta_vdbga = [delta_v(3), delta_dbg(3), delta_dba(3)]

applied right-multiplicatively: R <- R exp(delta_r), p <- p + R delta_p
(manifold handling lives inside the residuals, not a local parameterization —
see `optimizer.cpp:17-24` + `map.cpp:183-219`).

All residuals are whitened by L^T where LL^T = inv_cov (`LLT` whitening,
`cost-functions.hpp:81,325`). Everything is batch-friendly and `vmap`-able;
`jax.jacfwd` is the test oracle for every analytic Jacobian.
"""

from __future__ import annotations

import jax.numpy as jnp

from pose_estimation_tpu.utils import lie


def whitener(inv_cov):
    """L^T with L = cholesky(inv_cov) (lower). [..., n, n]."""
    return jnp.swapaxes(jnp.linalg.cholesky(inv_cov), -1, -2)


# ---------------------------------------------------------------------------
# IMU residual (15) between window frames i and j.
# Reference: ImuCostFunction::Evaluate (`cost-functions.hpp:250-445`).
# ---------------------------------------------------------------------------

def imu_residual(
    dr_i, dp_i, dv_i, ddbg_i, ddba_i,
    dr_j, dp_j, dv_j, ddbg_j, ddba_j,
    R_i, p_i, v_i, dbg_i, dba_i,
    R_j, p_j, v_j, dbg_j, dba_j,
    ic, gravity, lt=None, off_bg=0.0, off_ba=0.0,
):
    """Whitened 15-residual [r_R, r_v, r_p, r_bg, r_ba].

    `lt` optionally supplies the precomputed whitener L^T (it is constant
    across solver iterations — hoist it out of optimization loops).

    `off_bg`/`off_ba` are the committed-bias offsets between the two frames'
    delta references (`ref(j) - ref(i)`): window slots straddle keyframe
    bias commits, so the absolute bias change is `off + dbg_j - dbg_i`, not
    `dbg_j - dbg_i`. Without the offset every committed keyframe bias jump
    escapes the random-walk penalty and the bias estimate random-walks with
    per-keyframe re-estimation noise (observed: 1-2 m/s^2 steps)."""
    up_dbg_i = dbg_i + ddbg_i
    up_dba_i = dba_i + ddba_i

    uR_i = R_i @ lie.so3_exp(dr_i)
    uR_j = R_j @ lie.so3_exp(dr_j)
    corrected_dR = ic.dR @ lie.so3_exp(ic.d_R_bg @ up_dbg_i)
    r_R = lie.so3_log(corrected_dR.T @ (uR_i.T @ uR_j))

    uv_i = v_i + dv_i
    uv_j = v_j + dv_j
    r_v = uR_i.T @ (uv_j - uv_i - gravity * ic.dt) - (
        ic.dv + ic.d_v_bg @ up_dbg_i + ic.d_v_ba @ up_dba_i
    )

    up_i = p_i + R_i @ dp_i
    up_j = p_j + R_j @ dp_j
    r_p = uR_i.T @ (up_j - up_i - uv_i * ic.dt - gravity * (ic.dt2 / 2)) - (
        ic.dp + ic.d_p_bg @ up_dbg_i + ic.d_p_ba @ up_dba_i
    )

    r_bg = off_bg + dbg_j + ddbg_j - up_dbg_i
    r_ba = off_ba + dba_j + ddba_j - up_dba_i

    res = jnp.concatenate([r_R, r_v, r_p, r_bg, r_ba])
    if lt is None:
        lt = whitener(ic.inv_cov)
    return lt @ res


def imu_jacobians(
    R_i, p_i, v_i, dbg_i, dba_i,
    R_j, p_j, v_j,
    ic, gravity,
):
    """Analytic Jacobian blocks at delta = 0, whitened.

    Returns (J_pose_i [15,6], J_vb_i [15,9], J_pose_j [15,6], J_vb_j [15,9]),
    matching `cost-functions.hpp:336-442` block for block.
    """
    dtype = R_i.dtype
    eye = jnp.eye(3, dtype=dtype)

    residual_R = lie.so3_log(
        (ic.dR @ lie.so3_exp(ic.d_R_bg @ dbg_i)).T @ (R_i.T @ R_j)
    )
    jr_inv = lie.right_jacobian_inverse(residual_R)

    j_pose_i = jnp.zeros((15, 6), dtype)
    j_pose_i = j_pose_i.at[0:3, 0:3].set(-jr_inv @ R_j.T @ R_i)
    dv = v_j - v_i - gravity * ic.dt
    j_pose_i = j_pose_i.at[3:6, 0:3].set(lie.hat(R_i.T @ dv))
    dp = p_j - p_i - v_i * ic.dt - gravity * (ic.dt2 / 2)
    j_pose_i = j_pose_i.at[6:9, 0:3].set(lie.hat(R_i.T @ dp))
    j_pose_i = j_pose_i.at[6:9, 3:6].set(-eye)

    j_vb_i = jnp.zeros((15, 9), dtype)
    j_vb_i = j_vb_i.at[0:3, 3:6].set(
        -jr_inv
        @ lie.so3_exp(residual_R).T
        @ lie.right_jacobian(ic.d_R_bg @ dbg_i)
        @ ic.d_R_bg
    )
    j_vb_i = j_vb_i.at[3:6, 0:3].set(-R_i.T)
    j_vb_i = j_vb_i.at[3:6, 3:6].set(-ic.d_v_bg)
    j_vb_i = j_vb_i.at[3:6, 6:9].set(-ic.d_v_ba)
    j_vb_i = j_vb_i.at[6:9, 0:3].set(-R_i.T * ic.dt)
    j_vb_i = j_vb_i.at[6:9, 3:6].set(-ic.d_p_bg)
    j_vb_i = j_vb_i.at[6:9, 6:9].set(-ic.d_p_ba)
    j_vb_i = j_vb_i.at[9:12, 3:6].set(-eye)
    j_vb_i = j_vb_i.at[12:15, 6:9].set(-eye)

    j_pose_j = jnp.zeros((15, 6), dtype)
    j_pose_j = j_pose_j.at[0:3, 0:3].set(jr_inv)
    j_pose_j = j_pose_j.at[6:9, 3:6].set(R_i.T @ R_j)

    j_vb_j = jnp.zeros((15, 9), dtype)
    j_vb_j = j_vb_j.at[3:6, 0:3].set(R_i.T)
    j_vb_j = j_vb_j.at[9:12, 3:6].set(eye)
    j_vb_j = j_vb_j.at[12:15, 6:9].set(eye)

    lt = whitener(ic.inv_cov)
    return lt @ j_pose_i, lt @ j_vb_i, lt @ j_pose_j, lt @ j_vb_j


# ---------------------------------------------------------------------------
# Prior residual (15) on the oldest window frame j (i is the marginalized
# frame just outside the window). Reference: PriorCostFunction
# (`cost-functions.hpp:22-133`): like the IMU residual but with frame i's
# increments frozen at zero and inv_cov scaled by priorFactor.
# ---------------------------------------------------------------------------

def prior_residual(
    dr_j, dp_j, dv_j, ddbg_j, ddba_j,
    R_i, p_i, v_i, dbg_i, dba_i,
    R_j, p_j, v_j, dbg_j, dba_j,
    ic, gravity, prior_factor, lt=None,
):
    uR_j = R_j @ lie.so3_exp(dr_j)
    corrected_dR = ic.dR @ lie.so3_exp(ic.d_R_bg @ dbg_i)
    r_R = lie.so3_log(corrected_dR.T @ (R_i.T @ uR_j))

    uv_j = v_j + dv_j
    r_v = R_i.T @ (uv_j - v_i - gravity * ic.dt) - (
        ic.dv + ic.d_v_bg @ dbg_i + ic.d_v_ba @ dba_i
    )

    up_j = p_j + R_j @ dp_j
    r_p = R_i.T @ (up_j - p_i - v_i * ic.dt - gravity * (ic.dt2 / 2)) - (
        ic.dp + ic.d_p_bg @ dbg_i + ic.d_p_ba @ dba_i
    )

    r_bg = dbg_j + ddbg_j - dbg_i
    r_ba = dba_j + ddba_j - dba_i

    res = jnp.concatenate([r_R, r_v, r_p, r_bg, r_ba])
    if lt is None:
        lt = whitener(ic.inv_cov * prior_factor)
    return lt @ res


def prior_jacobians(R_i, dbg_i, R_j, ic, prior_factor):
    """(J_pose_j [15,6], J_vb_j [15,9]); reference `:92-130`."""
    dtype = R_i.dtype
    eye = jnp.eye(3, dtype=dtype)
    residual_R = lie.so3_log(
        (ic.dR @ lie.so3_exp(ic.d_R_bg @ dbg_i)).T @ (R_i.T @ R_j)
    )
    jr_inv = lie.right_jacobian_inverse(residual_R)

    j_pose_j = jnp.zeros((15, 6), dtype)
    j_pose_j = j_pose_j.at[0:3, 0:3].set(jr_inv)
    j_pose_j = j_pose_j.at[6:9, 3:6].set(R_i.T @ R_j)

    j_vb_j = jnp.zeros((15, 9), dtype)
    j_vb_j = j_vb_j.at[3:6, 0:3].set(R_i.T)
    j_vb_j = j_vb_j.at[9:12, 3:6].set(eye)
    j_vb_j = j_vb_j.at[12:15, 6:9].set(eye)

    lt = whitener(ic.inv_cov * prior_factor)
    return lt @ j_pose_j, lt @ j_vb_j


# ---------------------------------------------------------------------------
# Reprojection: pre-linearized at the current state, exactly like the
# reference (`optimizer.cpp:87-120` computes error + constant F blocks; the
# ImageCostFunction is then linear: residual = error + F dpose).
# ---------------------------------------------------------------------------

def reprojection_error_and_jacobian(
    R_wb, p_wb, landmark_w, pixel, R_cb, p_cb, fx, fy, cx, cy, inv_std,
):
    """Per-observation 2-residual + 2x6 pose Jacobian.

    All inputs broadcast; returns (error [...,2], F [...,2,6], depth [...]).
    Mirrors `optimizer.cpp:95-114`:
        temp  = R_wb^T (X_w - p_wb)            (landmark in body frame)
        X_cam = R_cb temp + p_cb
        error = invStd * (project(X_cam) - pixel)
        F_dp  = -invStd * d_e_pcam * R_cb
        F_dr  = -F_dp * hat(temp)
    """
    temp = jnp.einsum("...ji,...j->...i", R_wb, landmark_w - p_wb)
    x_cam = jnp.einsum("...ij,...j->...i", R_cb, temp) + p_cb
    x, y, z = x_cam[..., 0], x_cam[..., 1], x_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)

    u = fx * x / safe_z + cx
    v = fy * y / safe_z + cy
    error = jnp.stack(
        [inv_std[0] * (u - pixel[..., 0]), inv_std[1] * (v - pixel[..., 1])],
        axis=-1,
    )

    zero = jnp.zeros_like(z)
    d_e_pcam = jnp.stack(
        [
            jnp.stack([fx / safe_z, zero, -fx * x / (safe_z * safe_z)], axis=-1),
            jnp.stack([zero, fy / safe_z, -fy * y / (safe_z * safe_z)], axis=-1),
        ],
        axis=-2,
    )  # [..., 2, 3]
    inv_std_mat = jnp.asarray(
        [[inv_std[0], 0.0], [0.0, inv_std[1]]], dtype=R_wb.dtype
    )
    f_dp = -jnp.einsum("ij,...jk,kl->...il", inv_std_mat, d_e_pcam, R_cb)
    f_dr = -jnp.einsum("...ij,...jk->...ik", f_dp, lie.hat(temp))
    f = jnp.concatenate([f_dr, f_dp], axis=-1)  # [..., 2, 6]
    return error, f, z


# ---------------------------------------------------------------------------
# Initialization residuals (`cost-functions.hpp:453-692`). Small problems
# solved once at startup; each returns (residual, jacobian(s)) whitened.
# ---------------------------------------------------------------------------

def gyr_bias_residual(ddbg, R_i, R_j, ic):
    """3-residual of BiasGyrCostFunction (:459-483)."""
    r = lie.so3_log(
        (ic.dR @ lie.so3_exp(ic.d_R_bg @ ddbg)).T @ (R_i.T @ R_j)
    )
    lt = whitener(ic.inv_cov[0:3, 0:3])
    return lt @ r


def gyr_bias_jacobian(R_i, R_j, ic):
    residual_R = lie.so3_log(ic.dR.T @ (R_i.T @ R_j))
    j = -lie.right_jacobian_inverse(residual_R) @ lie.so3_exp(residual_R).T @ ic.d_R_bg
    lt = whitener(ic.inv_cov[0:3, 0:3])
    return lt @ j


def gravity_velocity_residual(dg, dv_i, dv_j, R_i, p_i, p_j, ic):
    """6-residual of GravityVelocityCostFunction (:502-519)."""
    r_v = R_i.T @ (dv_j - dv_i - dg * ic.dt) - ic.dv
    r_p = R_i.T @ (p_j - p_i - dv_i * ic.dt - dg * (ic.dt2 / 2)) - ic.dp
    lt = whitener(ic.inv_cov[3:9, 3:9])
    return lt @ jnp.concatenate([r_v, r_p])


def gravity_velocity_jacobians(R_i, ic):
    """(J_g [6,3], J_vi [6,3], J_vj [6,3]); reference `:525-559`."""
    dtype = R_i.dtype
    r_temp = -R_i.T
    z = jnp.zeros((3, 3), dtype)
    j_g = jnp.concatenate([r_temp * ic.dt, r_temp * (ic.dt2 / 2)], axis=0)
    j_vi = jnp.concatenate([r_temp, r_temp * ic.dt], axis=0)
    j_vj = jnp.concatenate([-r_temp, z], axis=0)
    lt = whitener(ic.inv_cov[3:9, 3:9])
    return lt @ j_g, lt @ j_vi, lt @ j_vj


def alignment_residual(delta_r2, init_g, unit_g, axes):
    """3-residual of AlignmentCostFunction (:578-613). `axes` are the two
    free tangent indices (dataset profile)."""
    delta_r = jnp.zeros(3, dtype=init_g.dtype)
    delta_r = delta_r.at[axes[0]].set(delta_r2[0])
    delta_r = delta_r.at[axes[1]].set(delta_r2[1])
    return unit_g - lie.so3_exp(delta_r) @ init_g


def alignment_jacobian(init_g, axes):
    """[3,2] jacobian: columns of hat(init_g) at the free axes (:617-631)."""
    h = lie.hat(init_g)
    return jnp.stack([h[:, axes[0]], h[:, axes[1]]], axis=-1)


def acc_bias_residual(ddba, R_i, v_i, v_j, p_i, p_j, ic, gravity):
    """6-residual of AccCostFunction (:649-663)."""
    r_v = R_i.T @ (v_j - v_i - gravity * ic.dt) - (ic.dv + ic.d_v_ba @ ddba)
    r_p = R_i.T @ (p_j - p_i - v_i * ic.dt - gravity * (ic.dt2 / 2)) - (
        ic.dp + ic.d_p_ba @ ddba
    )
    lt = whitener(ic.inv_cov[3:9, 3:9])
    return lt @ jnp.concatenate([r_v, r_p])


def acc_bias_jacobian(ic):
    j = jnp.concatenate([-ic.d_v_ba, -ic.d_p_ba], axis=0)
    lt = whitener(ic.inv_cov[3:9, 3:9])
    return lt @ j
