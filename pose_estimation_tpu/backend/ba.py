"""Motion-only bundle adjustment over the sliding window.

Re-design of `Optimizer::motionOnlyBA` (`/root/reference/src/optimizer.cpp:
16-181`) as a single jitted function: assemble (constant) Jacobians + a
residual closure for the prior / IMU / pre-linearized reprojection terms and
run the `lax.while_loop` LM solver. Landmarks are held fixed (same as the
reference — the structureless-BA machinery there is commented out,
`optimizer.cpp:122-133`).

Window growth (`actualSize`, `optimizer.cpp:26`) is handled with dynamic
pair roles under static shapes: constraint pair k (connecting window slots k
and k+1) is
  * the PRIOR pair when k == W - n_act (its frame i is the marginalization
    anchor: deltas frozen, covariance scaled by priorFactor),
  * an IMU pair when k > W - n_act,
  * inactive otherwise (zero rows).
Reprojection observations of non-optimized frames are masked out likewise.

The reprojection Jacobian is block-diagonal over frames (each observation
touches one pose), so J^T W J from reprojection only fills per-frame 6x6
diagonal blocks — assembled densely, no scatter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend import residuals as res
from pose_estimation_tpu.models.window import WindowState


class Calib(NamedTuple):
    """Rectified-camera + extrinsic constants used by the backend."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    r_cb: jax.Array   # [3,3] body->rectified-camera rotation
    p_cb: jax.Array   # [3]
    inv_std: jax.Array  # [2] = (1/stdX, 1/stdY)


class LandmarkObs(NamedTuple):
    """Window observations of fixed landmarks (built by the tracker).

    pos:  [L, 3]    landmark world positions
    px:   [L, W, 2] observed pixel in window frame w (slots 1..W)
    mask: [L, W]    observation validity
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

    anchor = (wsize - win.n_act).astype(jnp.int32)
    ks = jnp.arange(wsize)
    is_prior = (ks == anchor)
    is_imu = (ks > anchor)
    col_active = jnp.arange(wsize) >= anchor  # obs col w <-> slot 1+w

    # Landmarks must be observed by >= 2 (active) frames (`optimizer.cpp:77`).
    obs_mask = obs.mask & col_active[None, :]
    lm_valid = jnp.sum(obs_mask, axis=1) >= 2
    obs_mask = obs_mask & lm_valid[:, None]          # [L, W]

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

    # ---- constant whitened Jacobians for the W constraint pairs ----
    n = 6 * wsize + 9 * wsize
    m_pairs = 15 * wsize
    m_rep = L * wsize * 2
    jac = jnp.zeros((m_pairs + m_rep, n), dtype)

    def pair_ic(k):
        return jax.tree.map(lambda a: a[k], win.ics)

    for k in range(wsize):
        ic = pair_ic(k)
        w_imu = is_imu[k].astype(dtype)
        w_pri = is_prior[k].astype(dtype)
        jpi, jvi, jpj, jvj = res.imu_jacobians(
            win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
            win.R[k + 1], win.p[k + 1], win.v[k + 1],
            ic, gravity,
        )
        jpj_p, jvj_p = res.prior_jacobians(
            win.R[k], win.dbg[k], win.R[k + 1], ic, prior_factor
        )
        r0 = 15 * k
        # frame j = slot k+1 -> param block k
        jac = jac.at[r0 : r0 + 15, 6 * k : 6 * k + 6].set(
            w_imu * jpj + w_pri * jpj_p
        )
        jac = jac.at[r0 : r0 + 15, 6 * wsize + 9 * k : 6 * wsize + 9 * k + 9].set(
            w_imu * jvj + w_pri * jvj_p
        )
        if k >= 1:
            # frame i = slot k -> param block k-1 (imu pairs only)
            jac = jac.at[r0 : r0 + 15, 6 * (k - 1) : 6 * (k - 1) + 6].set(w_imu * jpi)
            jac = jac.at[
                r0 : r0 + 15, 6 * wsize + 9 * (k - 1) : 6 * wsize + 9 * (k - 1) + 9
            ].set(w_imu * jvi)

    # reprojection rows: observation (l, w) occupies rows [base + (l*W+w)*2)
    # and columns [6w, 6w+6). One-hot frame selector avoids scatter.
    frame_sel = jnp.eye(wsize, dtype=dtype)  # [W, F]
    rep_rows = jnp.einsum("lwab,wf->lwafb", f_blk, frame_sel).reshape(
        L * wsize * 2, 6 * wsize
    )
    jac = jac.at[m_pairs:, 0 : 6 * wsize].set(rep_rows)

    # ---- residual closure ----
    # whiteners are constant across LM iterations; hoist them out of the
    # while_loop (16 cholesky lowerings inside the loop body otherwise)
    lts_imu = [res.whitener(pair_ic(k).inv_cov) for k in range(wsize)]
    lts_pri = [
        res.whitener(pair_ic(k).inv_cov * prior_factor) for k in range(wsize)
    ]

    def residual_fn(x):
        dpose = x[0 : 6 * wsize].reshape(wsize, 6)
        dvdbga = x[6 * wsize :].reshape(wsize, 9)
        parts = []
        for k in range(wsize):
            ic = pair_ic(k)
            dp_j = dpose[k]
            dv_j = dvdbga[k]
            if k >= 1:
                dp_i, dv_i = dpose[k - 1], dvdbga[k - 1]
            else:
                dp_i, dv_i = jnp.zeros(6, dtype), jnp.zeros(9, dtype)
            r_imu = res.imu_residual(
                dp_i[0:3], dp_i[3:6], dv_i[0:3], dv_i[3:6], dv_i[6:9],
                dp_j[0:3], dp_j[3:6], dv_j[0:3], dv_j[3:6], dv_j[6:9],
                win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
                win.R[k + 1], win.p[k + 1], win.v[k + 1],
                win.dbg[k + 1], win.dba[k + 1],
                ic, gravity, lt=lts_imu[k],
            )
            r_pri = res.prior_residual(
                dp_j[0:3], dp_j[3:6], dv_j[0:3], dv_j[3:6], dv_j[6:9],
                win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
                win.R[k + 1], win.p[k + 1], win.v[k + 1],
                win.dbg[k + 1], win.dba[k + 1],
                ic, gravity, prior_factor, lt=lts_pri[k],
            )
            parts.append(
                jnp.where(is_imu[k], r_imu, jnp.where(is_prior[k], r_pri, 0.0))
            )
        # linear reprojection residual: err + F dpose_w
        r_rep = err + jnp.einsum("lwab,wb->lwa", f_blk, dpose)
        r_rep = jnp.where(obs_mask[..., None], r_rep, 0.0)
        parts.append(r_rep.reshape(-1))
        return jnp.concatenate(parts)

    # ---- Huber weights per landmark block (loss on reprojection only,
    # `optimizer.cpp:36,135`; prior/IMU use NULL loss `:41,47`) ----
    pair_w = jnp.repeat((is_imu | is_prior).astype(dtype), 15)

    def weight_fn(r):
        r_rep = r[m_pairs:].reshape(L, wsize * 2)
        w_lm = lm_mod.huber_block_weights(r_rep, lm_valid)  # [L]
        w_rep = jnp.repeat(w_lm[:, None], wsize * 2, axis=1).reshape(-1)
        return jnp.concatenate([pair_w, w_rep])

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
