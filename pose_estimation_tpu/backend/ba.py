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

from pose_estimation_tpu.utils.precision import full_precision


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


def _prep(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
    use_marg_prior: bool = False,
):
    """Shared precomputation of the motion-only BA problem: masks, the
    pre-linearized reprojection pieces, the constant pair Jacobian, the
    whiteners, and the (nonlinear) pair-residual closure. Consumed by both
    `build_problem` (dense [m, n] form, the oracle surface) and
    `build_normal_problem` (precomputed normal-equations form, the hot
    path)."""
    wsize = win.R.shape[0] - 1
    L = obs.pos.shape[0]
    dtype = win.R.dtype

    anchor = (wsize - win.n_act).astype(jnp.int32)
    ks = jnp.arange(wsize)
    is_prior = (ks == anchor)
    is_imu = (ks > anchor)
    col_active = jnp.arange(wsize) >= anchor  # obs col w <-> slot 1+w
    # Once the marginalization prior is live it REPLACES the anchor-pair
    # prior (the reference's priorFactor surrogate) — keeping both would
    # re-count the anchor link that was absorbed when its frame was
    # marginalized. During window growth (prior_on False) the anchor pair
    # stays active as usual.
    if use_marg_prior:
        is_prior = is_prior & ~win.prior_on

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
    # All W pairs evaluated in ONE vmapped program (the per-pair python loop
    # costs W x the op count; on the dispatch-latency-bound chip op count IS
    # latency, see BASELINE.md).
    R_i, R_j = win.R[:-1], win.R[1:]
    p_i, p_j = win.p[:-1], win.p[1:]
    v_i, v_j = win.v[:-1], win.v[1:]
    dbg_i, dbg_j = win.dbg[:-1], win.dbg[1:]
    dba_i, dba_j = win.dba[:-1], win.dba[1:]
    # committed-bias offsets between each pair's delta references: slot k's
    # deltas reference ics.bg_i[k] (the bias committed AT keyframe k, which
    # the outgoing pair was preintegrated with); the newest pair's two ends
    # share a reference (offset 0). See residuals.imu_residual docstring.
    off_bg = jnp.concatenate(
        [win.ics.bg_i[1:] - win.ics.bg_i[:-1], jnp.zeros((1, 3), dtype)]
    )
    off_ba = jnp.concatenate(
        [win.ics.ba_i[1:] - win.ics.ba_i[:-1], jnp.zeros((1, 3), dtype)]
    )

    jpi, jvi, jpj, jvj = jax.vmap(
        res.imu_jacobians, in_axes=(0,) * 8 + (0, None)
    )(R_i, p_i, v_i, dbg_i, dba_i, R_j, p_j, v_j, win.ics, gravity)
    jpj_p, jvj_p = jax.vmap(
        res.prior_jacobians, in_axes=(0, 0, 0, 0, None)
    )(R_i, dbg_i, R_j, win.ics, prior_factor)

    w_imu = is_imu.astype(dtype)[:, None, None]
    w_pri = is_prior.astype(dtype)[:, None, None]
    blk_pj = w_imu * jpj + w_pri * jpj_p          # [W,15,6] frame-j pose
    blk_vj = w_imu * jvj + w_pri * jvj_p          # [W,15,9]
    blk_pi = w_imu * jpi                          # frame-i blocks: imu only
    blk_vi = w_imu * jvi

    # block placement via one-hot selectors (no scatter): pair k's frame-j
    # blocks land in param column k, frame-i blocks in column k-1 (none for
    # k = 0).
    sel_j = jnp.eye(wsize, dtype=dtype)
    sel_i = jnp.concatenate(
        [jnp.zeros((1, wsize), dtype), jnp.eye(wsize, dtype=dtype)[:-1]], axis=0
    )
    pose_cols = (
        jnp.einsum("kab,kf->kafb", blk_pj, sel_j)
        + jnp.einsum("kab,kf->kafb", blk_pi, sel_i)
    ).reshape(15 * wsize, 6 * wsize)
    vb_cols = (
        jnp.einsum("kab,kf->kafb", blk_vj, sel_j)
        + jnp.einsum("kab,kf->kafb", blk_vi, sel_i)
    ).reshape(15 * wsize, 9 * wsize)
    jac_pairs = jnp.concatenate([pose_cols, vb_cols], axis=1)   # [15W, 15W]

    # whiteners are constant across LM iterations; hoist them out of the
    # while_loop (cholesky lowerings inside the loop body otherwise)
    lts_imu = res.whitener(win.ics.inv_cov)                     # [W,15,15]
    lts_pri = res.whitener(win.ics.inv_cov * prior_factor)

    # The prior residual IS the IMU residual with frame i's increments
    # frozen at zero and a priorFactor-scaled whitener (compare
    # `cost-functions.hpp:22-133` vs `:250-445`), so ONE masked vmapped
    # chain evaluates both roles: per-pair whitener selected by role, the
    # i-side increments and the committed-bias offsets zeroed at the
    # anchor. This halves the op count of the LM loop body (which is what
    # per-frame solver latency is made of on this chip) vs evaluating two
    # separate residual chains and selecting.
    active = is_imu | is_prior
    lts = jnp.where(is_prior[:, None, None], lts_pri, lts_imu)
    i_live = (~is_prior).astype(dtype)[:, None]
    off_bg_m = off_bg * i_live
    off_ba_m = off_ba * i_live

    def pairs_residual(x):
        """Whitened prior/IMU pair residuals at increments x -> [W, 15]
        (inactive pairs zeroed)."""
        dpose = x[0 : 6 * wsize].reshape(wsize, 6)
        dvdbga = x[6 * wsize :].reshape(wsize, 9)
        # increments of frame i (= param block k-1; zero for the first
        # pair, frozen for the anchor's prior role)
        dpose_i = (
            jnp.concatenate([jnp.zeros((1, 6), dtype), dpose[:-1]], 0) * i_live
        )
        dvdbga_i = (
            jnp.concatenate([jnp.zeros((1, 9), dtype), dvdbga[:-1]], 0) * i_live
        )

        r = jax.vmap(
            res.imu_residual, in_axes=(0,) * 20 + (0, None, 0, 0, 0)
        )(
            dpose_i[:, 0:3], dpose_i[:, 3:6],
            dvdbga_i[:, 0:3], dvdbga_i[:, 3:6], dvdbga_i[:, 6:9],
            dpose[:, 0:3], dpose[:, 3:6],
            dvdbga[:, 0:3], dvdbga[:, 3:6], dvdbga[:, 6:9],
            R_i, p_i, v_i, dbg_i, dba_i,
            R_j, p_j, v_j, dbg_j, dba_j,
            win.ics, gravity, lts, off_bg_m, off_ba_m,
        )
        return jnp.where(active[:, None], r, 0.0)

    aux = {
        "num_landmarks": jnp.sum(lm_valid),
        "num_observations": jnp.sum(obs_mask),
        "wsize": wsize,
    }
    return {
        "wsize": wsize, "L": L, "dtype": dtype,
        "is_imu": is_imu, "is_prior": is_prior,
        "obs_mask": obs_mask, "lm_valid": lm_valid,
        "err": err, "f_blk": f_blk,
        "jac_pairs": jac_pairs, "sel_j": sel_j,
        "pairs_residual": pairs_residual,
        "aux": aux,
    }


@full_precision
def build_problem(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
):
    """Assemble the motion-only BA least-squares problem in DENSE form.

    Returns (residual_fn, jac [m,n], weight_fn, x0 [n], aux) — the exact
    problem `motion_only_ba` solves, exposed so an independent solver
    (scipy / Ceres) can act as oracle on it (SURVEY.md section 4). The hot
    path solves the same problem via `build_normal_problem`."""
    pr = _prep(win, obs, calib, gravity, prior_factor)
    wsize, L, dtype = pr["wsize"], pr["L"], pr["dtype"]
    err, f_blk = pr["err"], pr["f_blk"]
    obs_mask, lm_valid = pr["obs_mask"], pr["lm_valid"]
    n = 15 * wsize
    m_pairs = 15 * wsize
    m_rep = L * wsize * 2

    # reprojection rows: observation (l, w) occupies rows [base + (l*W+w)*2)
    # and columns [6w, 6w+6). One-hot frame selector avoids scatter.
    rep_rows = jnp.einsum("lwab,wf->lwafb", f_blk, pr["sel_j"]).reshape(
        m_rep, 6 * wsize
    )
    jac = jnp.concatenate(
        [
            pr["jac_pairs"],
            jnp.concatenate(
                [rep_rows, jnp.zeros((m_rep, 9 * wsize), dtype)], axis=1
            ),
        ],
        axis=0,
    )

    def residual_fn(x):
        pairs = pr["pairs_residual"](x)
        dpose = x[0 : 6 * wsize].reshape(wsize, 6)
        # linear reprojection residual: err + F dpose_w
        r_rep = err + jnp.einsum("lwab,wb->lwa", f_blk, dpose)
        r_rep = jnp.where(obs_mask[..., None], r_rep, 0.0)
        return jnp.concatenate([pairs.reshape(-1), r_rep.reshape(-1)])

    # ---- Huber weights per landmark block (loss on reprojection only,
    # `optimizer.cpp:36,135`; prior/IMU use NULL loss `:41,47`) ----
    pair_w = jnp.repeat((pr["is_imu"] | pr["is_prior"]).astype(dtype), 15)

    def weight_fn(r):
        r_rep = r[m_pairs:].reshape(L, wsize * 2)
        w_lm = lm_mod.huber_block_weights(r_rep, lm_valid)  # [L]
        w_rep = jnp.repeat(w_lm[:, None], wsize * 2, axis=1).reshape(-1)
        return jnp.concatenate([pair_w, w_rep])

    def cost_fn(r):
        """TRUE robustified cost (Ceres convention; see
        build_normal_problem) — pass as lm_solve(cost_fn=...) so the
        dense oracle surface reports/accepts on the same cost as the
        normal-equations hot path."""
        pairs2 = jnp.sum(jnp.square(r[:m_pairs] * pair_w))
        s_l = jnp.sum(
            jnp.square(r[m_pairs:].reshape(L, wsize * 2)), axis=1
        )
        rho_l = jnp.where(
            s_l <= 1.0, s_l,
            2.0 * jnp.sqrt(jnp.maximum(s_l, 1e-32)) - 1.0,
        )
        rho_l = jnp.where(lm_valid, rho_l, 0.0)
        return 0.5 * (pairs2 + jnp.sum(rho_l))

    pr["aux"]["cost_fn"] = cost_fn
    x0 = jnp.zeros(n, dtype)
    return residual_fn, jac, weight_fn, x0, pr["aux"]


def prior_delta(win: WindowState) -> jax.Array:
    """Box-minus of the current window states (frames 1..W) against the
    marginalization prior's linearization states, flattened in the solver
    param layout [6W poses | 9W v/dbg/dba] -> [15W].

    Local coordinates match `window.apply_deltas`' right-multiplicative
    convention: R = R_lin exp(dr), p = p_lin + R_lin dp, additive v/biases;
    the prior residual is then linear in the solver increments (J = I to
    first order — states stay near the lin point because it refreshes at
    every keyframe)."""
    from pose_estimation_tpu.utils import lie

    wsize = win.R.shape[0] - 1
    R_act, p_act, v_act = win.R[1:], win.p[1:], win.v[1:]
    dr = jax.vmap(lie.so3_log)(
        jnp.einsum("wji,wjk->wik", win.lin_R, R_act)
    )                                                     # [W, 3]
    dp = jnp.einsum("wji,wj->wi", win.lin_R, p_act - win.lin_p)
    dv = v_act - win.lin_v
    # total biases of frame k+1 reference ics[k]'s committed bias
    dbg = (win.ics.bg_i + win.dbg[1:]) - win.lin_bg
    dba = (win.ics.ba_i + win.dba[1:]) - win.lin_ba
    pose = jnp.concatenate([dr, dp], axis=1).reshape(6 * wsize)
    vb = jnp.concatenate([dv, dbg, dba], axis=1).reshape(9 * wsize)
    d0 = jnp.concatenate([pose, vb])
    return jnp.where(win.prior_on, d0, 0.0)


def _marg_indices(wsize: int):
    """(dropped dims, kept dims, kept dims' post-roll positions) for
    marginalizing frame 1 (param block 0) out of the [6W | 9W] layout."""
    import numpy as np

    n = 15 * wsize
    idx_m = np.concatenate([np.arange(6), 6 * wsize + np.arange(9)])
    idx_r = np.setdiff1d(np.arange(n), idx_m)
    # post-roll position of each kept dim: old block k -> new block k - 1
    new_pos = np.concatenate([
        np.arange(0, 6 * (wsize - 1)),                       # old pose 1..W-1
        6 * wsize + np.arange(0, 9 * (wsize - 1)),           # old vb 1..W-1
    ])
    return idx_m, idx_r, new_pos


@full_precision
def marginalize_prior(
    win: WindowState, h_final: jax.Array, forget: float = 1.0
):
    """Schur-marginalize the outgoing frame's 15-dim block from the solved
    information matrix and re-index the remainder into the post-roll window
    layout. Returns the WindowState with refreshed prior fields.

    This is the sliding-window marginalization the reference approximates
    with a fixed `priorFactor`-scaled anchor prior (`cost-functions.hpp:81`,
    `optimizer.cpp:40-41`): instead of discarding all pre-window
    information, the dropped frame's information is folded into a Gaussian
    prior on the remaining states (linearized at their post-solve values).
    `h_final` must include the PREVIOUS prior's contribution, so information
    accumulates across windows. The gradient term is dropped (the solver
    runs to convergence, g ~ 0); linearization states refresh every
    keyframe, keeping the J = I prior residual accurate.
    """
    wsize = win.R.shape[0] - 1
    n = 15 * wsize
    dtype = win.R.dtype
    idx_m, idx_r, new_pos = _marg_indices(wsize)

    h = 0.5 * (h_final + h_final.T)
    h_mm = h[jnp.ix_(idx_m, idx_m)] + 1e-8 * jnp.eye(len(idx_m), dtype=dtype)
    h_rm = h[jnp.ix_(idx_r, idx_m)]
    h_rr = h[jnp.ix_(idx_r, idx_r)]
    schur = h_rr - h_rm @ jnp.linalg.solve(h_mm, h_rm.T)
    schur = 0.5 * (schur + schur.T) * forget
    prior_h = jnp.zeros((n, n), dtype).at[jnp.ix_(new_pos, new_pos)].set(schur)

    # linearization states: post-roll param block k covers current window
    # slot k+2 (for k < W-1); the newest block W-1 carries the current
    # newest state as a placeholder (its prior rows are zero).
    bg_tot = win.ics.bg_i + win.dbg[1:]                  # [W] per param block
    ba_tot = win.ics.ba_i + win.dba[1:]

    def roll_slot(a):                                    # [W+1, ...] slots
        return jnp.concatenate([a[2:], a[-1:]], axis=0)  # -> [W, ...]

    def roll_blk(a):                                     # [W, ...] blocks
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    return win._replace(
        prior_h=prior_h,
        lin_R=roll_slot(win.R),
        lin_p=roll_slot(win.p),
        lin_v=roll_slot(win.v),
        lin_bg=roll_blk(bg_tot),
        lin_ba=roll_blk(ba_tot),
        prior_on=jnp.asarray(True),
    )


@full_precision
def build_normal_problem(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
    use_marg_prior: bool = False,
    ba_prior_sigma: float = 0.0,
):
    """The SAME motion-only BA problem in precomputed normal-equations form.

    Structure exploited (why this is cheap):
    * the pair Jacobian is constant and pair weights are 0/1 constants, so
      H_pairs = J_p^T J_p is computed ONCE outside the LM loop;
    * the reprojection residual is LINEAR in x (pre-linearized: r = err +
      F dpose), so per-landmark Gram pieces G = F^T F [L, W, 6, 6],
      b = F^T err [L, W, 6], e2 = ||err||^2 [L, W] are constant too, and the
      per-iteration reprojection contribution is just Huber-weighted sums of
      them: H_rep,w = sum_l w_l G_lw, g_rep,w = sum_l w_l (b_lw + G_lw dp_w),
      block cost s_l = sum_w (e2 + 2 b.dp + dp.G dp).
    The LM loop body (lm.lm_solve_normal) therefore touches NO m~8k-row
    tensors — only [L, W]-sized weighted sums and a 15W-dim solve.

    Returns (normal_fn, x0, aux) with normal_fn(x) -> (H, g, cost),
    mathematically identical (up to fp summation order) to
    `build_problem` + IRLS weights.

    With use_marg_prior, aux additionally carries "marg_h_fn":
    x -> [n, n], the ONCE-COUNTED information for marginalizing the
    outgoing frame: previous prior + the outgoing IMU pair (k=1, the only
    pair whose information would otherwise be lost at the roll — it
    becomes the disabled anchor pair) + the outgoing frame's
    Huber-weighted reprojection block. Pairs 2..W-1 and the other frames'
    reprojection terms stay ACTIVE in future solves and are deliberately
    NOT included — folding the full posterior H would re-count them once
    per window overlap and make the prior catastrophically overconfident
    (measured: ATE 3.2 -> 10.6 % of path on the noisy sim).
    """
    pr = _prep(win, obs, calib, gravity, prior_factor, use_marg_prior)
    wsize, dtype = pr["wsize"], pr["dtype"]
    err, f_blk, lm_valid = pr["err"], pr["f_blk"], pr["lm_valid"]
    jac_pairs = pr["jac_pairs"]
    pairs_residual = pr["pairs_residual"]
    n = 15 * wsize

    # constant pieces (inactive pairs / masked observations are already
    # zeroed inside jac_pairs / f_blk / err, so no re-masking needed)
    h_pairs = jac_pairs.T @ jac_pairs                       # [n, n]
    gram = jnp.einsum("lwai,lwaj->lwij", f_blk, f_blk)      # [L, W, 6, 6]
    bvec = jnp.einsum("lwai,lwa->lwi", f_blk, err)          # [L, W, 6]
    e2 = jnp.sum(err * err, axis=-1)                        # [L, W]

    # marginalization prior: residual d0 + x is LINEAR in x with unit
    # Jacobian, so it contributes a constant H block and a cheap g term
    if use_marg_prior:
        on = win.prior_on
        ph = jnp.where(on, win.prior_h, 0.0)                # [n, n]
        d0 = prior_delta(win)                               # [n]
        h_pairs = h_pairs + ph
        g_pr0 = ph @ d0

        rows1 = jac_pairs[15:30]                            # pair k=1 rows

        def marg_h_fn(x):
            dpose = x[0 : 6 * wsize].reshape(wsize, 6)
            s_lw = (
                e2
                + 2.0 * jnp.einsum("lwi,wi->lw", bvec, dpose)
                + jnp.einsum("wi,lwij,wj->lw", dpose, gram, dpose)
            )
            s_l = jnp.sum(s_lw, axis=1)
            w_l = jnp.where(
                s_l <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(s_l, 1e-32))
            )
            w_l = jnp.where(pr["lm_valid"], w_l, 0.0)
            hw0 = jnp.einsum("l,lij->ij", w_l, gram[:, 0])  # frame block 0
            h = ph + rows1.T @ rows1
            return h.at[0:6, 0:6].add(hw0)

        pr["aux"]["marg_h_fn"] = marg_h_fn
    else:
        ph = None

    # weak zero-mean acc-bias prior (config ba_prior_sigma): pins the
    # near-degenerate (tilt, ba) gauge mode on low-rotation trajectories.
    # One 3-dim residual (ba_tot + delta_ba)/sigma per ACTIVE frame block.
    if ba_prior_sigma > 0:
        inv_s2 = 1.0 / float(ba_prior_sigma) ** 2
        anchor_blk = (wsize - win.n_act).astype(jnp.int32)
        act_blk = (jnp.arange(wsize) >= anchor_blk).astype(dtype)   # [W]
        ba_tot = win.ics.ba_i + win.dba[1:]                         # [W, 3]
        ba_dims = (
            6 * wsize
            + 9 * jnp.arange(wsize)[:, None]
            + jnp.arange(6, 9)[None, :]
        ).reshape(-1)                                               # [3W]
        h_pairs = h_pairs.at[ba_dims, ba_dims].add(
            inv_s2 * jnp.repeat(act_blk, 3)
        )

    def normal_fn(x):
        dpose = x[0 : 6 * wsize].reshape(wsize, 6)
        pairs = pairs_residual(x)                           # [W, 15]

        # Huber block weights from the quadratic expansion of s_l
        s_lw = (
            e2
            + 2.0 * jnp.einsum("lwi,wi->lw", bvec, dpose)
            + jnp.einsum("wi,lwij,wj->lw", dpose, gram, dpose)
        )
        s_l = jnp.sum(s_lw, axis=1)                         # [L] >= 0
        w_l = jnp.where(
            s_l <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(s_l, 1e-32))
        )
        w_l = jnp.where(lm_valid, w_l, 0.0)

        hw = jnp.einsum("l,lwij->wij", w_l, gram)           # [W, 6, 6]
        gw = jnp.einsum("l,lwi->wi", w_l, bvec) + jnp.einsum(
            "wij,wj->wi", hw, dpose
        )

        h = h_pairs
        for k in range(wsize):                              # static slices
            h = h.at[6 * k : 6 * k + 6, 6 * k : 6 * k + 6].add(hw[k])
        g = jac_pairs.T @ pairs.reshape(-1)
        g = g.at[: 6 * wsize].add(gw.reshape(-1))
        # TRUE robustified cost, Ceres convention (0.5 sum rho(s), Huber
        # rho(s) = s | 2 sqrt(s) - 1): measured identical to the real
        # Ceres' reported cost on a recorded problem (CERES_ORACLE.json).
        # The previous IRLS-weighted cost (0.5 w s = 0.5 sqrt(s) on
        # outlier blocks) under-reports outliers and makes the accept /
        # gain-ratio decisions inconsistent with the model decrease; g is
        # the exact gradient of THIS cost (d rho/dx = rho'(s) J^T r with
        # rho' = w), H its Gauss-Newton approximation.
        rho_l = jnp.where(
            s_l <= 1.0, s_l,
            2.0 * jnp.sqrt(jnp.maximum(s_l, 1e-32)) - 1.0,
        )
        rho_l = jnp.where(lm_valid, rho_l, 0.0)
        cost = 0.5 * (jnp.sum(pairs * pairs) + jnp.sum(rho_l))
        if use_marg_prior:
            rp = d0 + x
            g = g + g_pr0 + ph @ x
            cost = cost + 0.5 * rp @ (ph @ rp)
        if ba_prior_sigma > 0:
            dba_x = x[6 * wsize :].reshape(wsize, 9)[:, 6:9]
            r_ba = (ba_tot + dba_x) * act_blk[:, None]          # [W, 3]
            g = g.at[ba_dims].add(inv_s2 * r_ba.reshape(-1))
            cost = cost + 0.5 * inv_s2 * jnp.sum(r_ba * r_ba)
        return h, g, cost

    return normal_fn, jnp.zeros(n, dtype), pr["aux"]


@full_precision
def motion_only_ba(
    win: WindowState,
    obs: LandmarkObs,
    calib: Calib,
    gravity: jax.Array,
    prior_factor: float,
    max_iterations: int = 20,
    use_marg_prior: bool = False,
    ba_prior_sigma: float = 0.0,
):
    """Returns (delta_pose [W,6], delta_vdbga [W,9], info). info["h_final"]
    is the information matrix at the solution (incl. the marginalization
    prior when enabled) — the input to `marginalize_prior`."""
    wsize = win.R.shape[0] - 1
    normal_fn, x0, aux = build_normal_problem(
        win, obs, calib, gravity, prior_factor, use_marg_prior=use_marg_prior,
        ba_prior_sigma=ba_prior_sigma,
    )
    x, info = lm_mod.lm_solve_normal(
        normal_fn, x0, lm_mod.LMOptions(max_iterations=max_iterations),
    )
    delta_pose = x[0 : 6 * wsize].reshape(wsize, 6)
    delta_vdbga = x[6 * wsize :].reshape(wsize, 9)
    info["num_landmarks"] = aux["num_landmarks"]
    info["num_observations"] = aux["num_observations"]
    if use_marg_prior:
        info["marg_h"] = aux["marg_h_fn"](x)
    return delta_pose, delta_vdbga, info
