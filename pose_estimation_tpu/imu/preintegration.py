"""On-manifold IMU preintegration (Forster et al.) as a `lax.scan`.

TPU-native re-design of the reference preintegrator
(`/root/reference/src/imu-preintegrator.cpp`):

* The per-sample recurrences (`integrate` :245-255, `propagateNoise` :257-278,
  `biasJacobians` :280-297) are reproduced bit-for-bit as a masked
  `jax.lax.scan` over a fixed-length IMU chunk — same math, but the whole
  window integrates in one fused XLA loop on device instead of a mutex-guarded
  host queue.
* State is a functional pytree (`PreintState`); a constraint persists across
  non-keyframes exactly like the reference accumulator (the host FSM resets it
  on keyframes via `reset_state`, mirroring `ImuPreintegrator::reset` :143).
* Everything is vmap-able over a batch of sequences and over window intervals.

Tangent ordering of the 15-dof error state matches the reference:
[delta_r(3), delta_v(3), delta_p(3), delta_bg(3), delta_ba(3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.utils import lie

from pose_estimation_tpu.utils.precision import full_precision


class ImuParams(NamedTuple):
    """Discrete-time noise parameters (precomputed on host from config).

    cov_noise_d: [6] diagonal of the discrete measurement-noise covariance
        (gyr^2 x3, acc^2 x3), reference `imu-preintegrator.cpp:128-129`.
    cov_bias: [6] diagonal of the bias random-walk covariance (per second),
        reference `imu-preintegrator.cpp:133-134`.
    dt: IMU sample period (1/samplingRate).
    """

    cov_noise_d: jax.Array  # [6]
    cov_bias: jax.Array     # [6]
    dt: jax.Array           # scalar

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        gyr_n, acc_n, gyr_w, acc_w = cfg.discrete_noise()
        return cls(
            cov_noise_d=jnp.asarray([gyr_n**2] * 3 + [acc_n**2] * 3, dtype),
            cov_bias=jnp.asarray([gyr_w**2] * 3 + [acc_w**2] * 3, dtype),
            dt=jnp.asarray(cfg.dt, dtype),
        )


class PreintState(NamedTuple):
    """Running preintegration accumulator Delta_{i,j} (i = last keyframe)."""

    dR: jax.Array      # [3,3] Delta R_ij
    dv: jax.Array      # [3]
    dp: jax.Array      # [3]
    d_R_bg: jax.Array  # [3,3] d DeltaR / d bg
    d_v_bg: jax.Array
    d_v_ba: jax.Array
    d_p_bg: jax.Array
    d_p_ba: jax.Array
    cov9: jax.Array    # [9,9] covariance of (delta_r, delta_v, delta_p)
    dt: jax.Array      # scalar: accumulated time


class ImuConstraint(NamedTuple):
    """Preintegrated constraint between window states i and j.

    Mirror of `cfsd::ImuConstraint` (`include/cfsd/structs.hpp:26-55`), with
    the rotation stored as a 3x3 matrix and the covariance kept in *forward*
    form plus its inverse (the reference stores only the inverse :240).
    """

    inv_cov: jax.Array  # [15,15]
    bg_i: jax.Array     # [3]
    ba_i: jax.Array     # [3]
    dR: jax.Array       # [3,3]
    dv: jax.Array       # [3]
    dp: jax.Array       # [3]
    d_R_bg: jax.Array   # [3,3]
    d_v_bg: jax.Array
    d_v_ba: jax.Array
    d_p_bg: jax.Array
    d_p_ba: jax.Array
    dt: jax.Array       # scalar
    dt2: jax.Array      # scalar


def init_state(dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros((3, 3), dtype)
    return PreintState(
        dR=jnp.eye(3, dtype=dtype),
        dv=jnp.zeros(3, dtype),
        dp=jnp.zeros(3, dtype),
        d_R_bg=z3, d_v_bg=z3, d_v_ba=z3, d_p_bg=z3, d_p_ba=z3,
        cov9=jnp.zeros((9, 9), dtype),
        dt=jnp.zeros((), dtype),
    )


@full_precision
def integrate_chunk_sequential(
    state: PreintState,
    gyr: jax.Array,   # [M, 3]
    acc: jax.Array,   # [M, 3]
    mask: jax.Array,  # [M] bool — padding samples are skipped
    bg: jax.Array,    # [3] gyro bias at time i
    ba: jax.Array,    # [3] accel bias at time i
    params: ImuParams,
) -> PreintState:
    """Reference-faithful sequential scan (the oracle for the parallel
    formulation below; ~400us/iteration of tiny ops on TPU, so the fast path
    is `integrate_chunk`).

    Exact recurrences of `ImuPreintegrator::processImu`'s hot loop
    (`src/imu-preintegrator.cpp:196-233`).
    """
    dt = params.dt
    dt2 = dt * dt
    cov_noise = jnp.diag(params.cov_noise_d)

    def step(s: PreintState, inp):
        g, a, m = inp
        ub_g = g - bg
        ub_a = a - ba
        omega = ub_g * dt
        dR_step = lie.so3_exp(omega)
        jr = lie.right_jacobian(omega)

        # integrate (:245-255)
        new_dR = s.dR @ dR_step
        new_dv = s.dv + s.dR @ ub_a * dt
        new_dp = s.dp + s.dv * dt + s.dR @ ub_a * (dt2 / 2)

        # propagateNoise (:257-278): cov' = A cov A^T + B covN B^T
        temp = s.dR @ lie.hat(ub_a)
        eye = jnp.eye(3, dtype=g.dtype)
        zero = jnp.zeros((3, 3), dtype=g.dtype)
        a_mat = jnp.block([
            [dR_step.T, zero, zero],
            [-temp * dt, eye, zero],
            [-temp * (dt2 / 2), eye * dt, eye],
        ])
        b_mat = jnp.block([
            [jr * dt, zero],
            [zero, s.dR * dt],
            [zero, s.dR * (dt2 / 2)],
        ])
        new_cov9 = a_mat @ s.cov9 @ a_mat.T + b_mat @ cov_noise @ b_mat.T

        # biasJacobians (:280-297)
        temp2 = temp @ s.d_R_bg
        new = PreintState(
            dR=new_dR,
            dv=new_dv,
            dp=new_dp,
            d_R_bg=dR_step.T @ s.d_R_bg - jr * dt,
            d_v_bg=s.d_v_bg - temp2 * dt,
            d_v_ba=s.d_v_ba - s.dR * dt,
            d_p_bg=s.d_p_bg + s.d_v_bg * dt - temp2 * (dt2 / 2),
            d_p_ba=s.d_p_ba + s.d_v_ba * dt - s.dR * (dt2 / 2),
            cov9=new_cov9,
            dt=s.dt + dt,
        )
        # Masked (padding) samples leave the carry untouched.
        out = jax.tree.map(lambda n, o: jnp.where(m, n, o), new, s)
        return out, None

    state, _ = jax.lax.scan(step, state, (gyr, acc, mask))
    return state


@full_precision
def integrate_chunk(
    state: PreintState,
    gyr: jax.Array,   # [M, 3]
    acc: jax.Array,   # [M, 3]
    mask: jax.Array,  # [M] bool
    bg: jax.Array,
    ba: jax.Array,
    params: ImuParams,
) -> PreintState:
    """Parallel (log-depth) preintegration — same math as the sequential
    recurrences, reformulated for the TPU:

    * the rotation chain is a prefix product of per-sample increments
      (`associative_scan` of 3x3 matmuls);
    * (dv, dp) and the (d_v_ba, d_p_ba) Jacobians are cumulative sums of
      per-sample terms once the rotation prefixes are known;
    * (d_R_bg, d_v_bg, d_p_bg) stacked as a 9x3 block satisfy an affine
      recurrence X_j = A_j X_{j-1} + b_j where A_j is EXACTLY the 9x9
      covariance-propagation matrix — one affine associative scan;
    * the covariance itself composes as (A2, Q2) o (A1, Q1) =
      (A2 A1, A2 Q1 A2^T + Q2) — one quadratic associative scan.

    Everything is batched [M, ...] matmuls at log2(M) depth instead of M
    sequential tiny-op steps. Masked samples contribute identity elements.
    Results match `integrate_chunk_sequential` to float tolerance (tested).
    """
    dt = params.dt
    dt2 = dt * dt
    dtype = gyr.dtype
    m = gyr.shape[0]
    eye3 = jnp.eye(3, dtype=dtype)
    mskf = mask.astype(dtype)[:, None]

    ub_g = (gyr - bg) * mskf
    ub_a = (acc - ba) * mskf
    omega = ub_g * dt
    dR_step = jnp.where(mask[:, None, None], lie.so3_exp(omega), eye3)   # [M,3,3]
    jr = lie.right_jacobian(omega) * mskf[..., None]                      # [M,3,3]

    # ---- rotation prefixes (inclusive), then full-frame exclusive prefixes
    incl = jax.lax.associative_scan(jnp.matmul, dR_step)                  # [M,3,3]
    dR_total = state.dR @ incl[-1]
    # exclusive prefix in the chunk frame, then rotate into the i-frame
    excl = jnp.concatenate([eye3[None], incl[:-1]], axis=0)
    r_prev = jnp.einsum("ab,mbc->mac", state.dR, excl)                    # [M,3,3]

    # ---- dv / dp (cumulative sums over full-frame terms) ----
    t_v = jnp.einsum("mab,mb->ma", r_prev, ub_a) * dt                     # [M,3]
    dv_steps = jnp.cumsum(t_v, axis=0)
    dv_total = state.dv + dv_steps[-1]
    # dp_j = dp + sum_j (dv_{j-1} dt + r_prev ub dt/2)
    dv_prev = state.dv + jnp.concatenate(
        [jnp.zeros((1, 3), dtype), dv_steps[:-1]], axis=0
    )
    dp_total = state.dp + jnp.sum(
        (dv_prev * dt + t_v * (dt / 2)) * mskf, axis=0
    )

    # ---- per-sample 9x9 A and 9x9 Q (noise) / 9x3 b (bias-Jacobian) ----
    temp = jnp.einsum("mab,mbc->mac", r_prev, lie.hat(ub_a))              # [M,3,3]
    zero = jnp.zeros((m, 3, 3), dtype)
    eye_m = jnp.broadcast_to(eye3, (m, 3, 3))
    dR_step_T = jnp.swapaxes(dR_step, -1, -2)

    def assemble_a(dRT, tmp, msk):
        row0 = jnp.concatenate([dRT, zero, zero], axis=-1)
        row1 = jnp.concatenate([-tmp * dt, eye_m, zero], axis=-1)
        row2 = jnp.concatenate(
            [-tmp * (dt2 / 2), eye_m * dt * msk[..., None], eye_m], axis=-1
        )
        return jnp.concatenate([row0, row1, row2], axis=-2)

    a_mat = assemble_a(dR_step_T, temp, mskf)                             # [M,9,9]

    # noise Q_j = B_j covN B_j^T, with B built from r_prev (full frame)
    gyr_var = params.cov_noise_d[0]
    acc_var = params.cov_noise_d[3]
    jr_jr_t = jnp.einsum("mab,mcb->mac", jr, jr) * (gyr_var * dt * dt)
    rr_t = jnp.einsum("mab,mcb->mac", r_prev, r_prev) * acc_var
    q = jnp.zeros((m, 9, 9), dtype)
    q = q.at[:, 0:3, 0:3].set(jr_jr_t)
    q = q.at[:, 3:6, 3:6].set(rr_t * dt2)
    q = q.at[:, 3:6, 6:9].set(rr_t * (dt * dt2 / 2))
    q = q.at[:, 6:9, 3:6].set(rr_t * (dt * dt2 / 2))
    q = q.at[:, 6:9, 6:9].set(rr_t * (dt2 * dt2 / 4))
    q = q * mskf[..., None]

    # bias-Jacobian forcing term b_j = [-Jr dt; 0; 0] (9x3)
    b = jnp.concatenate([-jr * dt, zero, zero], axis=-2)                  # [M,9,3]

    # ---- ONE fused tree REDUCTION for the affine bias-Jacobian recurrence
    # AND the quadratic covariance recurrence (they share the same A_j
    # chain, so the combined element (A, b, Q) halves the op count vs two
    # passes). Only the chunk TOTAL is needed — a log-depth pairwise
    # reduction does ~M combines vs the ~2M of `associative_scan`'s full
    # prefix computation (Blelloch up+down sweeps), at the same depth.
    def fused_combine(c1, c2):
        a1, b1, q1 = c1
        a2, b2, q2 = c2
        return (
            a2 @ a1,
            a2 @ b1 + b2,
            a2 @ q1 @ jnp.swapaxes(a2, -1, -2) + q2,
        )

    elems = (a_mat, b, q)
    mm = m
    while mm > 1:
        half = mm // 2
        even = jax.tree.map(lambda x: x[0 : 2 * half : 2], elems)
        odd = jax.tree.map(lambda x: x[1 : 2 * half : 2], elems)
        red = fused_combine(even, odd)  # element i covers (2i, 2i+1) in order
        if mm % 2:
            red = jax.tree.map(
                lambda r, x: jnp.concatenate([r, x[-1:]], axis=0), red, elems
            )
        elems = red
        mm = half + (mm % 2)
    a_tot, b_tot, q_tot = jax.tree.map(lambda x: x[0], elems)
    x0 = jnp.concatenate([state.d_R_bg, state.d_v_bg, state.d_p_bg], axis=0)
    x_new = a_tot @ x0 + b_tot
    cov_new = a_tot @ state.cov9 @ a_tot.T + q_tot

    # ---- (d_v_ba, d_p_ba): closed-form cumsums (constant A block) ----
    r_sum = jnp.cumsum(r_prev * mskf[..., None], axis=0)                  # [M,3,3]
    d_v_ba_steps = -r_sum * dt
    d_v_ba_total = state.d_v_ba + d_v_ba_steps[-1]
    d_v_ba_prev = state.d_v_ba + jnp.concatenate(
        [jnp.zeros((1, 3, 3), dtype), d_v_ba_steps[:-1]], axis=0
    )
    d_p_ba_total = state.d_p_ba + jnp.sum(
        (d_v_ba_prev * dt - r_prev * (dt2 / 2)) * mskf[..., None], axis=0
    )

    n_valid = jnp.sum(mask)
    return PreintState(
        dR=dR_total,
        dv=dv_total,
        dp=dp_total,
        d_R_bg=x_new[0:3],
        d_v_bg=x_new[3:6],
        d_p_bg=x_new[6:9],
        d_v_ba=d_v_ba_total,
        d_p_ba=d_p_ba_total,
        cov9=cov_new,
        dt=state.dt + n_valid.astype(dtype) * dt,
    )


@full_precision
def finalize(state: PreintState, bg: jax.Array, ba: jax.Array, params: ImuParams) -> ImuConstraint:
    """Build the 15x15 constraint; reference `processImu` tail (:238-240)."""
    dtype = state.dR.dtype
    cov15 = jnp.zeros((15, 15), dtype)
    cov15 = cov15.at[:9, :9].set(state.cov9)
    cov15 = cov15.at[9:, 9:].set(jnp.diag(params.cov_bias) * state.dt)
    inv_cov = _spd_inverse(cov15)
    return ImuConstraint(
        inv_cov=inv_cov,
        bg_i=bg, ba_i=ba,
        dR=state.dR, dv=state.dv, dp=state.dp,
        d_R_bg=state.d_R_bg, d_v_bg=state.d_v_bg, d_v_ba=state.d_v_ba,
        d_p_bg=state.d_p_bg, d_p_ba=state.d_p_ba,
        dt=state.dt, dt2=state.dt * state.dt,
    )


def _spd_inverse(m: jax.Array) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix via Cholesky."""
    chol = jnp.linalg.cholesky(m)
    eye = jnp.eye(m.shape[-1], dtype=m.dtype)
    return jax.scipy.linalg.cho_solve((chol, True), eye)


@full_precision
def repropagate(ic: ImuConstraint, delta_bg: jax.Array, delta_ba: jax.Array) -> ImuConstraint:
    """First-order bias repropagation of a stored constraint.

    Reference `Map::repropagate` (`src/map.cpp:72-81`).
    """
    return ic._replace(
        bg_i=ic.bg_i + delta_bg,
        ba_i=ic.ba_i + delta_ba,
        dR=ic.dR @ lie.so3_exp(ic.d_R_bg @ delta_bg),
        dv=ic.dv + ic.d_v_bg @ delta_bg + ic.d_v_ba @ delta_ba,
        dp=ic.dp + ic.d_p_bg @ delta_bg + ic.d_p_ba @ delta_ba,
    )


@full_precision
def predict(
    R_i: jax.Array, v_i: jax.Array, p_i: jax.Array,
    ic: ImuConstraint, gravity: jax.Array,
    dbg_i: jax.Array | None = None, dba_i: jax.Array | None = None,
):
    """IMU-predicted state j from state i + constraint (initial solver guess).

    Reference `Map::pushImuConstraint` (`src/map.cpp:135-161`): when the bias
    increments (dbg, dba) at frame i are available the bias-corrected deltas
    are used (:151-154), else the raw deltas (:138-140).
    """
    if dbg_i is None:
        dR, dv, dp = ic.dR, ic.dv, ic.dp
    else:
        dR = ic.dR @ lie.so3_exp(ic.d_R_bg @ dbg_i)
        dv = ic.dv + ic.d_v_bg @ dbg_i + ic.d_v_ba @ dba_i
        dp = ic.dp + ic.d_p_bg @ dbg_i + ic.d_p_ba @ dba_i
    R_j = R_i @ dR
    v_j = v_i + gravity * ic.dt + R_i @ dv
    p_j = p_i + v_i * ic.dt + gravity * (ic.dt2 / 2) + R_i @ dp
    return R_j, v_j, p_j
