"""The 4-stage visual-inertial initializer, each stage a small LM solve.

Re-design of `Optimizer::{initialGyrBias, initialGravityVelocity,
initialAlignment, initialAccBias}` (`/root/reference/src/optimizer.cpp:
183-329`). Inputs are plain stacked arrays (R [W,3,3], v/p [W,3]) plus W-1
stacked IMU constraints from the SfM bootstrap; each stage returns the solved
increment(s), to be applied by the host FSM (set bias, repropagate, rotate
states) exactly as the reference does after each solve.

Note: the reference's `initialAccBias` passes the preintegrator's *latest*
constraint for every window pair (`optimizer.cpp:312`) rather than the pair's
own constraint; we use the pair's own constraint (`ics[i]`), which is the
evidently intended semantics (the same loop in `initialGravityVelocity:221`
uses `_imuConstraint[i]`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend import residuals as res

from pose_estimation_tpu.utils.precision import full_precision


def _stack_map(ics, k):
    return jax.tree.map(lambda a: a[k], ics)


@full_precision
def solve_gyr_bias(R: jax.Array, ics, max_iterations: int = 50):
    """delta_bg [3] from W-1 rotation residuals (`optimizer.cpp:183-206`).

    Huber(1.0) loss per residual block.
    """
    w = R.shape[0]
    dtype = R.dtype
    n_blocks = w - 1

    jacs = jnp.stack(
        [res.gyr_bias_jacobian(R[i], R[i + 1], _stack_map(ics, i)) for i in range(n_blocks)]
    )  # [B,3,3]
    jac = jacs.reshape(n_blocks * 3, 3)

    def residual_fn(x):
        rs = [
            res.gyr_bias_residual(x, R[i], R[i + 1], _stack_map(ics, i))
            for i in range(n_blocks)
        ]
        return jnp.concatenate(rs)

    def weight_fn(r):
        blocks = r.reshape(n_blocks, 3)
        wts = lm_mod.huber_block_weights(blocks, jnp.ones(n_blocks, bool))
        return jnp.repeat(wts[:, None], 3, axis=1).reshape(-1)

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(3, dtype), weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    return x, info


@full_precision
def solve_gravity_velocity(R, p, ics, max_iterations: int = 50):
    """(gravity_estimate [3], delta_v [W,3]) — `optimizer.cpp:208-240`.

    Parameters x = [dg(3), dv_0(3) .. dv_{W-1}(3)]; residuals are linear in x
    so LM converges in one accepted step.
    """
    w = R.shape[0]
    dtype = R.dtype
    n_blocks = w - 1
    n = 3 + 3 * w

    jac = jnp.zeros((6 * n_blocks, n), dtype)
    for i in range(n_blocks):
        jg, jvi, jvj = res.gravity_velocity_jacobians(R[i], _stack_map(ics, i))
        r0 = 6 * i
        jac = jac.at[r0 : r0 + 6, 0:3].set(jg)
        jac = jac.at[r0 : r0 + 6, 3 + 3 * i : 6 + 3 * i].set(jvi)
        jac = jac.at[r0 : r0 + 6, 3 + 3 * (i + 1) : 6 + 3 * (i + 1)].set(jvj)

    def residual_fn(x):
        dg = x[0:3]
        dv = x[3:].reshape(w, 3)
        rs = [
            res.gravity_velocity_residual(
                dg, dv[i], dv[i + 1], R[i], p[i], p[i + 1], _stack_map(ics, i)
            )
            for i in range(n_blocks)
        ]
        return jnp.concatenate(rs)

    def weight_fn(r):
        blocks = r.reshape(n_blocks, 6)
        wts = lm_mod.huber_block_weights(blocks, jnp.ones(n_blocks, bool))
        return jnp.repeat(wts[:, None], 6, axis=1).reshape(-1)

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(n, dtype), weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    return x[0:3], x[3:].reshape(w, 3), info


@full_precision
def solve_gravity_velocity_bias(R, p, ics, max_iterations: int = 50):
    """JOINT (gravity [3], acc-bias increment [3], velocities [K,3]) solve.

    The init-stage pair (`solve_gravity_velocity` then `solve_acc_bias`)
    holds one of g/ba fixed while solving the other; their tilt <-> ba_xy
    coupling makes that block-coordinate loop converge at ~5%/round. Over a
    long keyframe chain with attitude variation the JOINT problem is linear
    and well-posed, so the gravity refinement solves it in one shot. The
    bias enters through the constraints' own bias Jacobians
    (`d_v_ba`/`d_p_ba`), i.e. residual -(ic.dv + d_v_ba dba) etc.
    """
    w = R.shape[0]
    dtype = R.dtype
    n_blocks = w - 1
    n = 6 + 3 * w  # [dg(3), dba(3), dv...]

    jac = jnp.zeros((6 * n_blocks, n), dtype)
    for i in range(n_blocks):
        ic = _stack_map(ics, i)
        jg, jvi, jvj = res.gravity_velocity_jacobians(R[i], ic)
        lt = res.whitener(ic.inv_cov[3:9, 3:9])
        jba = lt @ jnp.concatenate([-ic.d_v_ba, -ic.d_p_ba], axis=0)
        r0 = 6 * i
        jac = jac.at[r0 : r0 + 6, 0:3].set(jg)
        jac = jac.at[r0 : r0 + 6, 3:6].set(jba)
        jac = jac.at[r0 : r0 + 6, 6 + 3 * i : 9 + 3 * i].set(jvi)
        jac = jac.at[r0 : r0 + 6, 9 + 3 * i : 12 + 3 * i].set(jvj)

    def residual_fn(x):
        dg = x[0:3]
        dba = x[3:6]
        dv = x[6:].reshape(w, 3)
        rs = []
        for i in range(n_blocks):
            ic = _stack_map(ics, i)
            ic_b = pre_repropagate(ic, jnp.zeros(3, dtype), dba)
            rs.append(res.gravity_velocity_residual(
                dg, dv[i], dv[i + 1], R[i], p[i], p[i + 1], ic_b
            ))
        return jnp.concatenate(rs)

    def weight_fn(r):
        blocks = r.reshape(n_blocks, 6)
        wts = lm_mod.huber_block_weights(blocks, jnp.ones(n_blocks, bool))
        return jnp.repeat(wts[:, None], 6, axis=1).reshape(-1)

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(n, dtype), weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    return x[0:3], x[3:6], x[6:].reshape(w, 3), info


@full_precision
def solve_gravity_tilt_bias(
    R, p, ics, g0, max_iterations: int = 50,
    sigma_tilt: float = 0.5, sigma_dba: float = 0.5,
):
    """Magnitude-CONSTRAINED joint (gravity tilt [2], acc-bias increment [3],
    velocities [K,3]) solve for online refinement.

    `solve_gravity_velocity_bias` estimates gravity as a free 3-vector from
    a zero start — correct at init (gravity direction unknown) but
    DEGENERATE on refinement chains with little attitude variation: the
    (|g|, dba) subspace is unconstrained and the LS wanders to unphysical
    |g| (measured 12-39 m/s^2 on simulator chains, every refine rejected).
    Post-init the magnitude is known and the direction is already near the
    world axis, so parametrize g = g0 + B w with B an orthonormal basis of
    the tangent plane at g0 (VINS-Mono-style 2-DoF refinement), plus weak
    Tikhonov priors pulling (w, dba) to zero — on a chain that cannot
    observe the tilt/ba_xy split the solve returns ~no correction instead
    of a large complementary error pair. Returns (g_est [3] renormalized to
    |g0|, dba [3], dv [K,3], info).
    """
    w = R.shape[0]
    dtype = R.dtype
    n_blocks = w - 1
    n = 5 + 3 * w  # [tilt(2), dba(3), dv...]

    g_mag = jnp.linalg.norm(g0)
    ghat = g0 / g_mag
    # orthonormal tangent basis at g0 (any fixed completion works)
    a = jnp.where(jnp.abs(ghat[0]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], dtype),
                  jnp.asarray([0.0, 1.0, 0.0], dtype))
    b1 = jnp.cross(ghat, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(ghat, b1)
    basis = jnp.stack([b1, b2], axis=1)                    # [3, 2]

    n_rows = 6 * n_blocks + 5
    jac = jnp.zeros((n_rows, n), dtype)
    for i in range(n_blocks):
        ic = _stack_map(ics, i)
        jg, jvi, jvj = res.gravity_velocity_jacobians(R[i], ic)
        lt = res.whitener(ic.inv_cov[3:9, 3:9])
        jba = lt @ jnp.concatenate([-ic.d_v_ba, -ic.d_p_ba], axis=0)
        r0 = 6 * i
        jac = jac.at[r0 : r0 + 6, 0:2].set(jg @ basis)
        jac = jac.at[r0 : r0 + 6, 2:5].set(jba)
        jac = jac.at[r0 : r0 + 6, 5 + 3 * i : 8 + 3 * i].set(jvi)
        jac = jac.at[r0 : r0 + 6, 8 + 3 * i : 11 + 3 * i].set(jvj)
    pr = 6 * n_blocks
    jac = jac.at[pr : pr + 2, 0:2].set(jnp.eye(2, dtype=dtype) / sigma_tilt)
    jac = jac.at[pr + 2 : pr + 5, 2:5].set(jnp.eye(3, dtype=dtype) / sigma_dba)

    def residual_fn(x):
        tilt = x[0:2]
        dba = x[2:5]
        dv = x[5:].reshape(w, 3)
        dg = g0 + basis @ tilt
        rs = []
        for i in range(n_blocks):
            ic = _stack_map(ics, i)
            ic_b = pre_repropagate(ic, jnp.zeros(3, dtype), dba)
            rs.append(res.gravity_velocity_residual(
                dg, dv[i], dv[i + 1], R[i], p[i], p[i + 1], ic_b
            ))
        rs.append(tilt / sigma_tilt)
        rs.append(dba / sigma_dba)
        return jnp.concatenate(rs)

    def weight_fn(r):
        blocks = r[: 6 * n_blocks].reshape(n_blocks, 6)
        wts = lm_mod.huber_block_weights(blocks, jnp.ones(n_blocks, bool))
        return jnp.concatenate([
            jnp.repeat(wts[:, None], 6, axis=1).reshape(-1),
            jnp.ones(5, dtype),
        ])

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(n, dtype), weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    g_raw = g0 + basis @ x[0:2]
    g_est = g_raw / jnp.linalg.norm(g_raw) * g_mag
    return g_est, x[2:5], x[5:].reshape(w, 3), info


@full_precision
def solve_alignment(init_g: jax.Array, unit_g: jax.Array, axes, max_iterations: int = 50):
    """2-DoF rotation aligning the estimated gravity direction with the world
    gravity axis (`optimizer.cpp:242-304`). Returns delta_r [3] (full tangent,
    zeros on the fixed axis)."""
    dtype = init_g.dtype
    jac = res.alignment_jacobian(init_g, axes)

    def residual_fn(x):
        return res.alignment_residual(x, init_g, unit_g, axes)

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(2, dtype), None,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    delta_r = jnp.zeros(3, dtype).at[axes[0]].set(x[0]).at[axes[1]].set(x[1])
    return delta_r, info


@full_precision
def refine_gravity(
    R, p, ics, unit_g, axes, gravity,
    max_iterations: int = 50, rounds: int = 2,
    sigma_v: float = 0.05, sigma_p: float = 0.02,
    sigma_tilt: float = 0.5, sigma_dba: float = 0.5,
):
    """Online gravity refinement over an accumulated KEYFRAME chain.

    The 4-frame init window cannot separate a small gravity-direction error
    from accelerometer bias (the error is absorbed into ba and eats ATE; the
    reference never refines after init). Re-running the gravity/alignment/
    acc-bias solves over a LONG chain of optimized keyframe states makes the
    two observable. `rounds` block-coordinate passes (g+v solve -> world
    alignment -> acc-bias solve -> constraint repropagation) are chained so
    the g/ba coupling converges instead of being solved once at the wrong
    bias. Inputs: R/p [K, ...] keyframe states, ics [K-1 stacked] constraints
    repropagated to the current bias estimate. Returns (g_est [3] of the
    final round, delta_r [3] TOTAL world-alignment rotation, dba [3] TOTAL
    acc-bias increment).
    """
    import jax

    from pose_estimation_tpu.utils import lie

    dtype = R.dtype
    zero3 = jnp.zeros(3, dtype)
    total_rot = jnp.eye(3, dtype=dtype)
    total_dba = zero3
    g_est = zero3
    # The constraints' preintegration covariances describe IMU noise only;
    # the chain's R/v/p come from windowed vision BA and carry cm/cm-per-s
    # state errors that dwarf it. Solving with raw IMU weights makes the
    # tilt/bias estimate wildly overconfident (accepted ~15 deg spurious
    # tilts on the simulator); inflate the v/p covariance blocks with the
    # expected state noise (sigma_v [m/s], sigma_p [m]) before whitening.
    ncov = ics.inv_cov.shape[-1]
    dvec = jnp.zeros(ncov, dtype)
    dvec = dvec.at[3:6].set(sigma_v**2).at[6:9].set(sigma_p**2)
    infl = jnp.diag(dvec)

    def _inflate(inv_cov):
        return jnp.linalg.inv(jnp.linalg.inv(inv_cov) + infl)

    ics = ics._replace(inv_cov=jax.vmap(_inflate)(ics.inv_cov))
    for _ in range(rounds):
        # JOINT (tilt, ba, v) solve, gravity constrained to the known
        # magnitude around the current world axis — the free-gravity joint
        # solve is degenerate on low-rotation chains (see
        # solve_gravity_tilt_bias)
        g_est, dba, _, _ = solve_gravity_tilt_bias(
            R, p, ics, gravity, max_iterations,
            sigma_tilt=sigma_tilt, sigma_dba=sigma_dba,
        )
        g_unit = g_est / jnp.linalg.norm(g_est)
        delta_r, _ = solve_alignment(g_unit, unit_g, axes, max_iterations)
        d_rm = lie.so3_exp(delta_r)
        R = d_rm[None] @ R
        p = p @ d_rm.T
        total_rot = d_rm @ total_rot
        ics = jax.vmap(pre_repropagate)(
            ics, jnp.zeros_like(ics.bg_i), jnp.broadcast_to(dba, ics.ba_i.shape)
        )
        total_dba = total_dba + dba
    return g_est, lie.so3_log(total_rot), total_dba


def pre_repropagate(ic, dbg, dba):
    from pose_estimation_tpu.imu.preintegration import repropagate

    return repropagate(ic, dbg, dba)


@full_precision
def solve_acc_bias(R, v, p, ics, gravity, max_iterations: int = 50):
    """delta_ba [3] — `optimizer.cpp:306-329` (with per-pair constraints)."""
    w = R.shape[0]
    dtype = R.dtype
    n_blocks = w - 1

    jacs = jnp.stack([res.acc_bias_jacobian(_stack_map(ics, i)) for i in range(n_blocks)])
    jac = jacs.reshape(n_blocks * 6, 3)

    def residual_fn(x):
        rs = [
            res.acc_bias_residual(
                x, R[i], v[i], v[i + 1], p[i], p[i + 1], _stack_map(ics, i), gravity
            )
            for i in range(n_blocks)
        ]
        return jnp.concatenate(rs)

    def weight_fn(r):
        blocks = r.reshape(n_blocks, 6)
        wts = lm_mod.huber_block_weights(blocks, jnp.ones(n_blocks, bool))
        return jnp.repeat(wts[:, None], 6, axis=1).reshape(-1)

    x, info = lm_mod.lm_solve(
        residual_fn, jac, jnp.zeros(3, dtype), weight_fn,
        lm_mod.LMOptions(max_iterations=max_iterations),
    )
    return x, info


@full_precision
def full_init(R, p, ics, unit_g, axes, gravity):
    """All four init solves fused into ONE jittable program.

    The orchestration of `visual-inertial-slam.cpp:68-110` over the solver
    bodies of `optimizer.cpp:183-329`: gyr bias -> repropagate ->
    gravity+velocity -> world alignment -> acc bias -> repropagate. Run
    eagerly (as the host FSM did through round 4) the per-solver dispatch
    chain costs 2-5 s per (re)initialization on the tunneled chip; fused
    it is one dispatch. Plausibility gating on the returned scalars stays
    on the host (slam._initialize).

    Returns (R', v', p', dbg, dba, g_est, ics') — states world-aligned,
    constraints repropagated to the solved biases.
    """
    import jax as _jax

    from pose_estimation_tpu.imu.preintegration import repropagate
    from pose_estimation_tpu.utils import lie as _lie

    dtype = R.dtype
    zero3 = jnp.zeros(3, dtype)
    dbg, _ = solve_gyr_bias(R, ics)
    ics = _jax.vmap(repropagate, in_axes=(0, None, None))(ics, dbg, zero3)
    g_est, v, _ = solve_gravity_velocity(R, p, ics)
    init_g_unit = g_est / jnp.maximum(jnp.linalg.norm(g_est), 1e-12)
    delta_r, _ = solve_alignment(init_g_unit, unit_g, axes)
    d_rm = _lie.so3_exp(delta_r)
    R = d_rm[None] @ R
    v = jnp.einsum("ij,wj->wi", d_rm, v)
    p = jnp.einsum("ij,wj->wi", d_rm, p)
    dba, _ = solve_acc_bias(R, v, p, ics, gravity)
    ics = _jax.vmap(repropagate, in_axes=(0, None, None))(ics, zero3, dba)
    return R, v, p, dbg, dba, g_est, ics
