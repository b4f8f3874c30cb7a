"""Full bundle adjustment with Schur-complement landmark elimination.

The reference keeps landmarks FIXED in its motion-only BA and carries the
structureless-BA machinery only as commented-out code
(`/root/reference/src/optimizer.cpp:122-133`, `cost-functions.hpp:178-211`).
This module provides the real thing, TPU-style: jointly optimize the W window
poses AND the L landmark positions, eliminating the landmark blocks with the
classic Schur trick (what Ceres' DENSE_SCHUR does for the reduced camera
system):

    H = [ Hpp  Hpl ]   ->  (Hpp - Hpl Hll^-1 Hpl^T) dx_p = -(gp - Hpl Hll^-1 gl)
        [ Hpl^T Hll ]       dx_l = -Hll^-1 (gl + Hpl^T dx_p)

Hll is block-diagonal (3x3 per landmark) so its inverse is a batched 3x3
solve; Hpl's landmark blocks are batched [L, W, 6, 3] einsum contractions.
Everything is fixed-shape and masked; the LM loop is a lax.while_loop.

Pose parameters keep the reference parameterization: [delta_r, delta_p] per
frame applied right-multiplicatively; landmark parameters are plain world
deltas. The IMU/prior terms from the motion-only problem enter the pose
block unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend import residuals as res
from pose_estimation_tpu.backend.ba import Calib, LandmarkObs
from pose_estimation_tpu.models.window import WindowState
from pose_estimation_tpu.utils import lie

from pose_estimation_tpu.utils.precision import full_precision


def _reproj_residual_and_jacs(win, obs, obs_mask, calib, dpose, dlm):
    """Whitened reprojection residuals + (constant) pose/landmark Jacobians
    evaluated at the current increments.

    Returns err [L,W,2] at (dpose, dlm); f_pose [L,W,2,6]; f_lm [L,W,2,3]
    (Jacobians frozen at zero increments, reference-style chord iteration).
    """
    wsize = win.R.shape[0] - 1
    R_act = win.R[1:]
    p_act = win.p[1:]
    # apply increments
    R_new = R_act @ lie.so3_exp(dpose[:, 0:3])
    p_new = p_act + jnp.einsum("wij,wj->wi", R_act, dpose[:, 3:6])
    lm_new = obs.pos + dlm

    err, _, _ = res.reprojection_error_and_jacobian(
        R_new[None, :], p_new[None, :], lm_new[:, None, :], obs.px,
        calib.r_cb, calib.p_cb, calib.fx, calib.fy, calib.cx, calib.cy,
        calib.inv_std,
    )
    return jnp.where(obs_mask[..., None], err, 0.0)


@full_precision
def full_ba(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
    max_iterations: int = 10,
    use_marg_prior: bool = False,
):
    """Joint pose + landmark refinement.

    Returns (delta_pose [W,6], delta_vdbga [W,9], delta_landmarks [L,3],
    info). Landmarks observed < 2 times are frozen (delta 0).
    With use_marg_prior, the window's marginalization prior contributes to
    the pose/velocity/bias block exactly as in the motion-only problem
    (and the anchor-pair surrogate is disabled while it is live), so the
    keyframe refinement cannot silently undo prior-constrained states.
    """
    wsize = win.R.shape[0] - 1
    L = obs.pos.shape[0]
    dtype = win.R.dtype

    anchor = (wsize - win.n_act).astype(jnp.int32)
    ks = jnp.arange(wsize)
    is_prior = ks == anchor
    is_imu = ks > anchor
    if use_marg_prior:
        is_prior = is_prior & ~win.prior_on
    col_active = jnp.arange(wsize) >= anchor

    obs_mask = obs.mask & col_active[None, :]
    lm_valid = jnp.sum(obs_mask, axis=1) >= 2
    obs_mask = obs_mask & lm_valid[:, None]

    # ---- constant Jacobians (chord/frozen-J like the reference) ----
    R_act = win.R[1:]
    p_act = win.p[1:]
    err0, f_pose, _ = res.reprojection_error_and_jacobian(
        R_act[None, :], p_act[None, :], obs.pos[:, None, :], obs.px,
        calib.r_cb, calib.p_cb, calib.fx, calib.fy, calib.cx, calib.cy,
        calib.inv_std,
    )
    f_pose = jnp.where(obs_mask[..., None, None], f_pose, 0.0)  # [L,W,2,6]
    # landmark Jacobian: d err / d X_w = invStd * d_e_pcam * R_cb * R_wb^T
    # = -F_dp (the translation block) times R_wb^T (`optimizer.cpp:117`)
    f_lm = -jnp.einsum(
        "lwab,wcb->lwac", f_pose[..., 3:6], R_act
    )  # [L,W,2,3]

    # pose-side prior/IMU jacobians, reusing the motion-only assembly
    lts_imu = []
    lts_pri = []
    pair_jacs = []
    for k in range(wsize):
        ic = jax.tree.map(lambda a: a[k], win.ics)
        lts_imu.append(res.whitener(ic.inv_cov))
        lts_pri.append(res.whitener(ic.inv_cov * prior_factor))
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
        pair_jacs.append((
            w_imu * jpi, w_imu * jvi,
            w_imu * jpj + w_pri * jpj_p, w_imu * jvj + w_pri * jvj_p,
        ))

    n_pose = 6 * wsize + 9 * wsize

    if use_marg_prior:
        from pose_estimation_tpu.backend.ba import prior_delta

        ph = jnp.where(win.prior_on, win.prior_h, 0.0)       # [n_pose, n_pose]
        d0 = prior_delta(win)                                # [n_pose]
    else:
        ph = d0 = None

    def pair_residuals(dpose, dvdbga):
        parts = []
        for k in range(wsize):
            ic = jax.tree.map(lambda a: a[k], win.ics)
            dp_j, dv_j = dpose[k], dvdbga[k]
            if k >= 1:
                dp_i, dv_i = dpose[k - 1], dvdbga[k - 1]
            else:
                dp_i, dv_i = jnp.zeros(6, dtype), jnp.zeros(9, dtype)
            # committed-bias reference offsets between the pair's two slots
            # (see residuals.imu_residual docstring; ba.build_problem)
            if k < wsize - 1:
                off_bg = win.ics.bg_i[k + 1] - win.ics.bg_i[k]
                off_ba = win.ics.ba_i[k + 1] - win.ics.ba_i[k]
            else:
                off_bg = off_ba = jnp.zeros(3, dtype)
            r_imu = res.imu_residual(
                dp_i[0:3], dp_i[3:6], dv_i[0:3], dv_i[3:6], dv_i[6:9],
                dp_j[0:3], dp_j[3:6], dv_j[0:3], dv_j[3:6], dv_j[6:9],
                win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
                win.R[k + 1], win.p[k + 1], win.v[k + 1],
                win.dbg[k + 1], win.dba[k + 1], ic, gravity, lt=lts_imu[k],
                off_bg=off_bg, off_ba=off_ba,
            )
            r_pri = res.prior_residual(
                dp_j[0:3], dp_j[3:6], dv_j[0:3], dv_j[3:6], dv_j[6:9],
                win.R[k], win.p[k], win.v[k], win.dbg[k], win.dba[k],
                win.R[k + 1], win.p[k + 1], win.v[k + 1],
                win.dbg[k + 1], win.dba[k + 1], ic, gravity, prior_factor,
                lt=lts_pri[k],
            )
            parts.append(
                jnp.where(is_imu[k], r_imu, jnp.where(is_prior[k], r_pri, 0.0))
            )
        return jnp.stack(parts)  # [W, 15]

    # assemble the pose-side pair Jacobian into a [W*15, n_pose] matrix once
    jac_pairs = jnp.zeros((15 * wsize, n_pose), dtype)
    for k, (jpi, jvi, jpj, jvj) in enumerate(pair_jacs):
        r0 = 15 * k
        jac_pairs = jac_pairs.at[r0 : r0 + 15, 6 * k : 6 * k + 6].set(jpj)
        jac_pairs = jac_pairs.at[
            r0 : r0 + 15, 6 * wsize + 9 * k : 6 * wsize + 9 * k + 9
        ].set(jvj)
        if k >= 1:
            jac_pairs = jac_pairs.at[r0 : r0 + 15, 6 * (k - 1) : 6 * (k - 1) + 6].set(jpi)
            jac_pairs = jac_pairs.at[
                r0 : r0 + 15, 6 * wsize + 9 * (k - 1) : 6 * wsize + 9 * (k - 1) + 9
            ].set(jvi)

    def cost_of(dpose_flat, dvdbga_flat, dlm):
        dpose = dpose_flat.reshape(wsize, 6)
        dvdbga = dvdbga_flat.reshape(wsize, 9)
        r_pairs = pair_residuals(dpose, dvdbga)
        err = _reproj_residual_and_jacs(
            win, obs, obs_mask, calib, dpose, dlm
        )
        w_lm = lm_mod.huber_block_weights(
            err.reshape(L, -1), lm_valid
        )
        c = 0.5 * jnp.sum(r_pairs**2) + 0.5 * jnp.sum(
            w_lm[:, None, None] * err**2
        )
        if use_marg_prior:
            rp = d0 + jnp.concatenate([dpose_flat, dvdbga_flat])
            c = c + 0.5 * rp @ (ph @ rp)
        return c, (r_pairs, err, w_lm)

    def body(state):
        x_pose, x_lm, lam, nu, cost, it, done = state
        dpose = x_pose[: 6 * wsize].reshape(wsize, 6)
        dvdbga = x_pose[6 * wsize :].reshape(wsize, 9)
        _, (r_pairs, err, w_lm) = cost_of(x_pose[: 6 * wsize], x_pose[6 * wsize :], x_lm)

        # ---- normal equations ----
        wgt = w_lm[:, None] * obs_mask.astype(dtype)  # [L,W]
        # pose block from reprojection: block-diagonal over frames
        h_pp_rep = jnp.einsum(
            "lwai,lwaj,lw->wij", f_pose, f_pose, wgt
        )  # [W,6,6]
        g_p_rep = jnp.einsum("lwai,lwa,lw->wi", f_pose, err, wgt)
        # landmark blocks
        h_ll = jnp.einsum("lwai,lwaj,lw->lij", f_lm, f_lm, wgt)
        g_l = jnp.einsum("lwai,lwa,lw->li", f_lm, err, wgt)
        # cross blocks per (landmark, frame)
        h_pl = jnp.einsum("lwai,lwaj,lw->lwij", f_pose, f_lm, wgt)

        # pose-side H from prior/IMU pairs (+ the marginalization prior)
        h_pairs = jac_pairs.T @ jac_pairs
        g_pairs = jac_pairs.T @ r_pairs.reshape(-1)
        if use_marg_prior:
            h_pairs = h_pairs + ph
            g_pairs = g_pairs + ph @ (d0 + x_pose)

        # full pose H (n_pose x n_pose): add reprojection pose-diag blocks
        h_pp = h_pairs
        for wf in range(wsize):
            h_pp = h_pp.at[6 * wf : 6 * wf + 6, 6 * wf : 6 * wf + 6].add(
                h_pp_rep[wf]
            )
        g_p = g_pairs.at[: 6 * wsize].add(g_p_rep.reshape(-1))

        # ---- damping ----
        d_pp = jnp.diag(h_pp)
        d_pp = jnp.where(d_pp > 0, d_pp, 1.0)
        h_pp_d = h_pp + lam * jnp.diag(d_pp)
        d_ll = jnp.einsum("lii->li", h_ll)
        d_ll = jnp.where(d_ll > 0, d_ll, 1.0)
        eye3 = jnp.eye(3, dtype=dtype)
        h_ll_d = h_ll + lam * d_ll[..., None] * eye3[None]
        # guard unobserved landmarks: identity so the solve stays finite
        h_ll_d = jnp.where(lm_valid[:, None, None], h_ll_d, eye3[None])

        # ---- Schur elimination ----
        h_ll_inv = jnp.linalg.inv(h_ll_d)                      # [L,3,3] batched
        hpl_hllinv = jnp.einsum("lwij,ljk->lwik", h_pl, h_ll_inv)
        # S = Hpp - sum_l Hpl Hll^-1 Hpl^T  (pose-frame cross terms couple
        # frames THROUGH landmarks)
        s_red = jnp.einsum("lwik,lvjk->wivj", hpl_hllinv, h_pl)
        s_mat = h_pp_d.at[: 6 * wsize, : 6 * wsize].add(
            -s_red.reshape(6 * wsize, 6 * wsize)
        )
        g_red = jnp.einsum("lwik,lk->wi", hpl_hllinv, g_l).reshape(-1)
        g_s = g_p.at[: 6 * wsize].add(-g_red)

        chol = jnp.linalg.cholesky(
            s_mat + 1e-30 * jnp.eye(n_pose, dtype=dtype)
        )
        step_p = -jax.scipy.linalg.cho_solve((chol, True), g_s)
        bad = ~jnp.all(jnp.isfinite(step_p))
        step_p = jnp.where(bad, 0.0, step_p)

        # back-substitute landmarks
        step_pose_frames = step_p[: 6 * wsize].reshape(wsize, 6)
        rhs_l = g_l + jnp.einsum("lwij,wi->lj", h_pl, step_pose_frames)
        step_l = -jnp.einsum("lij,lj->li", h_ll_inv, rhs_l)
        step_l = jnp.where(lm_valid[:, None], step_l, 0.0)

        # ---- accept / reject ----
        x_pose_new = x_pose + step_p
        x_lm_new = x_lm + step_l
        new_cost, _ = cost_of(
            x_pose_new[: 6 * wsize], x_pose_new[6 * wsize :], x_lm_new
        )
        model_dec = -(g_s @ step_p) - 0.5 * step_p @ (h_pp_d @ step_p)
        model_dec = jnp.maximum(model_dec, 1e-32)
        rho = (cost - new_cost) / model_dec
        accept = (rho > 1e-3) & jnp.isfinite(new_cost) & ~bad

        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.where(accept, lam * shrink, lam * nu)
        lam_new = jnp.clip(lam_new, 1e-12, 1e32)
        nu_new = jnp.where(accept, 2.0, nu * 2.0)
        done_new = accept & (
            jnp.abs(cost - new_cost) <= 1e-6 * (cost + 1e-32)
        )
        return (
            jnp.where(accept, x_pose_new, x_pose),
            jnp.where(accept, x_lm_new, x_lm),
            lam_new,
            nu_new.astype(dtype),
            jnp.where(accept, new_cost, cost),
            it + 1,
            done_new,
        )

    def cond(state):
        return (~state[6]) & (state[5] < max_iterations)

    x_pose0 = jnp.zeros(n_pose, dtype)
    x_lm0 = jnp.zeros((L, 3), dtype)
    cost0, _ = cost_of(x_pose0[: 6 * wsize], x_pose0[6 * wsize :], x_lm0)
    out = jax.lax.while_loop(
        cond, body,
        (x_pose0, x_lm0, jnp.asarray(1e-4, dtype), jnp.asarray(2.0, dtype),
         cost0, jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    x_pose, x_lm, lam, _, cost, iters, _ = out
    info = {"initial_cost": cost0, "final_cost": cost, "iterations": iters}
    return (
        x_pose[: 6 * wsize].reshape(wsize, 6),
        x_pose[6 * wsize :].reshape(wsize, 9),
        x_lm,
        info,
    )
