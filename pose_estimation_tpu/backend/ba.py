"""Motion-only bundle adjustment over the sliding window.

Re-design of `Optimizer::motionOnlyBA` (`/root/reference/src/optimizer.cpp:
16-181`) as a single jitted function: assemble (constant) Jacobians + a
residual closure for the prior / IMU / pre-linearized reprojection terms and
run the `lax.while_loop` LM solver. Landmarks are held fixed (same as the
reference — the structureless-BA machinery there is commented out,
`optimizer.cpp:122-133`).

Shapes are static: W window frames, L landmark-observation slots. Invalid
slots carry zero weight. The reprojection Jacobian is block-diagonal over
frames (each observation touches one pose), so J^T W J from reprojection
only fills per-frame 6x6 diagonal blocks — assembled with one einsum, no
scatter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend import residuals as res
from pose_estimation_tpu.models.window import WindowState
from pose_estimation_tpu.utils import lie


class Calib(NamedTuple):
    """Rectified-camera + extrinsic constants used by the backend."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    r_cb: jax.Array   # [3,3] body->camera rotation
    p_cb: jax.Array   # [3]   body->camera translation
    inv_std: jax.Array  # [2] = (1/stdX, 1/stdY)


class LandmarkObs(NamedTuple):
    """Window observations of fixed landmarks (built by the tracker).

    pos:  [L, 3]   landmark world positions
    px:   [L, W, 2] observed pixel in window frame w (frames 1..W)
    mask: [L, W]   observation validity
    """

    pos: jax.Array
    px: jax.Array
    mask: jax.Array


def motion_only_ba(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
    max_iterations: int = 20,
):
    """Returns (delta_pose [W,6], delta_vdbga [W,9], info)."""
    wsize = win.R.shape[0] - 1
    L = obs.pos.shape[0]
    dtype = win.R.dtype

    # Landmarks must be observed by >= 2 window frames (`optimizer.cpp:77`).
    obs_count = jnp.sum(obs.mask, axis=1)
    lm_valid = obs_count >= 2
    obs_mask = obs.mask & lm_valid[:, None]          # [L, W]

    # ---- pre-linearized reprojection error + constant F (`:87-120`) ----
    R_act = win.R[1:]                                 # [W,3,3]
    p_act = win.p[1:]                                 # [W,3]
    err, f_blk, _depth = res.reprojection_error_and_jacobian(
        R_act[None, :], p_act[None, :],
        obs.pos[:, None, :], obs.px,
        calib.r_cb, calib.p_cb,
        calib.fx, calib.fy, calib.cx, calib.cy, calib.inv_std,
    )  # err [L,W,2], f_blk [L,W,2,6]
    err = jnp.where(obs_mask[..., None], err, 0.0)
    f_blk = jnp.where(obs_mask[..., None, None], f_blk, 0.0)

    # ---- constant whitened Jacobians for prior + IMU pairs ----
    ic0 = jax.tree.map(lambda a: a[0], win.ics)
    jp_prior, jvb_prior = res.prior_jacobians(
        win.R[0], win.dbg[0], win.R[1], ic0, prior_factor
    )

    def imu_jac(k):
        ic = jax.tree.map(lambda a: a[k], win.ics)
        return res.imu_jacobians(
            win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
            win.R[k + 1], win.p[k + 1], win.v[k + 1],
            ic, gravity,
        )

    imu_jacs = [imu_jac(k) for k in range(1, wsize)]  # static small loop

    # ---- dense J [m, n]; x = [pose_1..pose_W | vdbga_1..vdbga_W] ----
    n = 6 * wsize + 9 * wsize
    m_prior = 15
    m_imu = 15 * (wsize - 1)
    m_rep = L * wsize * 2
    jac = jnp.zeros((m_prior + m_imu + m_rep, n), dtype)
    jac = jac.at[0:15, 0:6].set(jp_prior)
    jac = jac.at[0:15, 6 * wsize : 6 * wsize + 9].set(jvb_prior)
    for k, (jpi, jvi, jpj, jvj) in enumerate(imu_jacs):
        r0 = m_prior + 15 * k
        # pair connects window frames (k, k+1) in 0-based active indexing
        jac = jac.at[r0 : r0 + 15, 6 * k : 6 * k + 6].set(jpi)
        jac = jac.at[r0 : r0 + 15, 6 * (k + 1) : 6 * (k + 1) + 6].set(jpj)
        jac = jac.at[r0 : r0 + 15, 6 * wsize + 9 * k : 6 * wsize + 9 * k + 9].set(jvi)
        jac = jac.at[r0 : r0 + 15, 6 * wsize + 9 * (k + 1) : 6 * wsize + 9 * (k + 1) + 9].set(jvj)
    # reprojection rows: observation (l, w) occupies rows [base + (l*W+w)*2, +2)
    # and columns [6w, 6w+6). Build via one-hot frame selector (no scatter).
    frame_sel = jnp.eye(wsize, dtype=dtype)  # [W, W]
    rep_rows = jnp.einsum("lwab,wf->lwafb", f_blk, frame_sel).reshape(
        L * wsize * 2, 6 * wsize
    )
    jac = jac.at[m_prior + m_imu :, 0 : 6 * wsize].set(rep_rows)

    # ---- residual closure ----
    def residual_fn(x):
        dpose = x[0 : 6 * wsize].reshape(wsize, 6)
        dvdbga = x[6 * wsize :].reshape(wsize, 9)

        r_prior = res.prior_residual(
            dpose[0, 0:3], dpose[0, 3:6],
            dvdbga[0, 0:3], dvdbga[0, 3:6], dvdbga[0, 6:9],
            win.R[0], win.p[0], win.v[0], win.dbg[0], win.dba[0],
            win.R[1], win.p[1], win.v[1], win.dbg[1], win.dba[1],
            ic0, gravity, prior_factor,
        )
        r_imus = []
        for k in range(1, wsize):
            ic = jax.tree.map(lambda a: a[k], win.ics)
            r_imus.append(
                res.imu_residual(
                    dpose[k - 1, 0:3], dpose[k - 1, 3:6],
                    dvdbga[k - 1, 0:3], dvdbga[k - 1, 3:6], dvdbga[k - 1, 6:9],
                    dpose[k, 0:3], dpose[k, 3:6],
                    dvdbga[k, 0:3], dvdbga[k, 3:6], dvdbga[k, 6:9],
                    win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
                    win.R[k + 1], win.p[k + 1], win.v[k + 1],
                    win.dbg[k + 1], win.dba[k + 1],
                    ic, gravity,
                )
            )
        # linear reprojection residual: err + F dpose_w
        r_rep = err + jnp.einsum("lwab,wb->lwa", f_blk, dpose)
        r_rep = jnp.where(obs_mask[..., None], r_rep, 0.0)
        return jnp.concatenate([r_prior, *r_imus, r_rep.reshape(-1)])

    # ---- Huber weights per landmark block (loss on reprojection only,
    # `optimizer.cpp:36,135`; prior/IMU use NULL loss `:41,47`) ----
    def weight_fn(r):
        ones = jnp.ones(m_prior + m_imu, dtype)
        r_rep = r[m_prior + m_imu :].reshape(L, wsize * 2)
        w_lm = lm_mod.huber_block_weights(r_rep, lm_valid)  # [L]
        w_rep = jnp.repeat(w_lm[:, None], wsize * 2, axis=1).reshape(-1)
        return jnp.concatenate([ones, w_rep])

    x0 = jnp.zeros(n, dtype)
    x, info = lm_mod.lm_solve(
        residual_fn, jac, x0, weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    delta_pose = x[0 : 6 * wsize].reshape(wsize, 6)
    delta_vdbga = x[6 * wsize :].reshape(wsize, 9)
    info["num_landmarks"] = jnp.sum(lm_valid)
    info["num_observations"] = jnp.sum(obs_mask)
    return delta_pose, delta_vdbga, info
