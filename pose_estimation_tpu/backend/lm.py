"""Dense Levenberg-Marquardt trust-region solver in JAX.

TPU-native replacement for the vendored Ceres 1.14 trust-region minimizer
(`/root/reference/thirdparty/ceres-solver-1.14.0/internal/ceres/
{trust_region_minimizer,levenberg_marquardt_strategy}.cc`) for the dense
problems the reference solves (DENSE_SCHUR motion-only BA with <= 60 params
and the four DENSE_QR init problems).

Key structural fact exploited: the reference's analytic Jacobians do not
depend on the optimization increments (they are evaluated from the stored
window state only — see `cost-functions.hpp:332,343` which use `R_i/R_j`
without the applied deltas), so J is CONSTANT across LM iterations. Each
iteration only re-evaluates the residual vector r(x) and the IRLS (Huber)
weights. The whole solve is one `lax.while_loop` — no host round trips.

Step update: solve (J^T W J + lambda * diag(J^T W J)) s = -J^T W r, accept on
Ceres' gain-ratio rule, radius update eta' = eta * max(1/3, 1-(2 rho-1)^3).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.utils.precision import full_precision


class LMOptions(NamedTuple):
    max_iterations: int = 20
    initial_lambda: float = 1e-4          # Ceres: 1/initial_radius, radius=1e4
    min_lambda: float = 1e-16
    max_lambda: float = 1e32
    min_relative_decrease: float = 1e-3   # Ceres default
    function_tolerance: float = 1e-6      # Ceres default
    parameter_tolerance: float = 1e-8     # Ceres default


class LMState(NamedTuple):
    x: jax.Array
    r: jax.Array         # residual at x (carried: ONE eval per iteration)
    w: jax.Array         # IRLS weights at x
    cost: jax.Array
    lam: jax.Array
    nu: jax.Array        # rejection growth factor
    it: jax.Array
    done: jax.Array
    accepted: jax.Array  # total accepted steps


def _weighted_cost(r, w):
    return 0.5 * jnp.sum(w * r * r)


@full_precision
def lm_solve(
    residual_fn: Callable[[jax.Array], jax.Array],
    jac: jax.Array,                                  # [m, n] constant
    x0: jax.Array,                                   # [n]
    weight_fn: Callable[[jax.Array], jax.Array] | None = None,
    options: LMOptions = LMOptions(),
    cost_fn: Callable[[jax.Array], jax.Array] | None = None,
):
    """Minimize 0.5 * || sqrt(w(r)) r(x) ||^2 with frozen Jacobian `jac`.

    weight_fn maps the residual vector -> per-residual IRLS weights (Huber
    etc.); defaults to unit weights. cost_fn(r) optionally reports the
    TRUE robustified cost (Ceres convention; `ba.build_problem` aux
    exposes one) for accept / convergence decisions — without it the
    IRLS-weighted cost is used, which under-reports outlier blocks.
    Returns (x, info dict).
    """
    if weight_fn is None:
        weight_fn = lambda r: jnp.ones_like(r)

    r0 = residual_fn(x0)
    w0 = weight_fn(r0)
    cost0 = cost_fn(r0) if cost_fn is not None else _weighted_cost(r0, w0)
    dtype = x0.dtype

    def body(s: LMState) -> LMState:
        # residual/weights at s.x are CARRIED from the previous iteration
        # (identical math to re-evaluating; halves the loop-body op count,
        # which is what single-stream latency is made of on this chip)
        jtw = jac.T * s.w[None, :]
        h = jtw @ jac                      # [n, n]
        g = jtw @ s.r                      # [n]
        d = jnp.diag(h)
        d = jnp.where(d > 0, d, 1.0)       # guard unobserved params
        h_damped = h + s.lam * jnp.diag(d)
        # Solve via Cholesky; fall back to stronger damping on failure is
        # implicit: lam grows on rejected steps.
        chol = jnp.linalg.cholesky(h_damped + 1e-32 * jnp.eye(h.shape[0], dtype=dtype))
        step = -jax.scipy.linalg.cho_solve((chol, True), g)
        bad_chol = ~jnp.all(jnp.isfinite(step))
        step = jnp.where(bad_chol, jnp.zeros_like(step), step)

        x_new = s.x + step
        r_new = residual_fn(x_new)
        w_new = weight_fn(r_new)
        new_cost = (cost_fn(r_new) if cost_fn is not None
                    else _weighted_cost(r_new, w_new))

        # Predicted reduction of the damped quadratic model (Ceres
        # levenberg_marquardt_strategy.cc): -g's - 0.5 s'Hs
        model_decrease = -(g @ step) - 0.5 * step @ (h @ step)
        model_decrease = jnp.maximum(model_decrease, 1e-32)
        rho = (s.cost - new_cost) / model_decrease

        accept = (rho > options.min_relative_decrease) & jnp.isfinite(new_cost) & ~bad_chol

        # Radius update (Ceres): on accept lam *= max(1/3, 1-(2rho-1)^3),
        # nu=2; on reject lam *= nu, nu *= 2.
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_acc = jnp.clip(s.lam * shrink, options.min_lambda, options.max_lambda)
        lam_rej = jnp.clip(s.lam * s.nu, options.min_lambda, options.max_lambda)

        # Convergence tests. Evaluated on the CANDIDATE step whether or not
        # it is accepted: near the optimum, IRLS weight feedback can push
        # rho just below min_relative_decrease while |delta cost| is already
        # under function_tolerance — requiring an ACCEPTED step to terminate
        # then burns the remaining iterations rejecting ever-tinier steps
        # (lam only grows). A rejected-but-converged candidate leaves x at
        # the carried (accepted) iterate, so the returned solution is the
        # same one the reject-loop would have returned at the cap.
        # bad_chol zero-steps must NOT terminate (they retry at larger lam).
        cost_change = jnp.abs(s.cost - new_cost)
        f_conv = cost_change <= options.function_tolerance * (s.cost + 1e-32)
        x_norm = jnp.linalg.norm(s.x)
        p_conv = jnp.linalg.norm(step) <= options.parameter_tolerance * (
            x_norm + options.parameter_tolerance
        )
        done = (f_conv | p_conv) & jnp.isfinite(new_cost) & ~bad_chol

        return LMState(
            x=jnp.where(accept, x_new, s.x),
            r=jnp.where(accept, r_new, s.r),
            w=jnp.where(accept, w_new, s.w),
            cost=jnp.where(accept, new_cost, s.cost),
            lam=jnp.where(accept, lam_acc, lam_rej),
            nu=jnp.where(accept, jnp.asarray(2.0, dtype), s.nu * 2.0),
            it=s.it + 1,
            done=done,
            accepted=s.accepted + accept.astype(jnp.int32),
        )

    def cond(s: LMState):
        return (~s.done) & (s.it < options.max_iterations)

    init = LMState(
        x=x0,
        r=r0,
        w=w0,
        cost=cost0,
        lam=jnp.asarray(options.initial_lambda, dtype),
        nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        accepted=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    info = {
        "initial_cost": cost0,
        "final_cost": final.cost,
        "iterations": final.it,
        "accepted_steps": final.accepted,
        "lambda": final.lam,
    }
    return final.x, info


class NormalLMState(NamedTuple):
    x: jax.Array
    h: jax.Array         # J^T W J at x (carried: ONE eval per iteration)
    g: jax.Array         # J^T W r at x
    cost: jax.Array
    lam: jax.Array
    nu: jax.Array
    it: jax.Array
    done: jax.Array
    accepted: jax.Array


@full_precision
def lm_solve_normal(
    normal_fn: Callable[[jax.Array], tuple[jax.Array, jax.Array, jax.Array]],
    x0: jax.Array,
    options: LMOptions = LMOptions(),
):
    """`lm_solve` with the normal equations supplied directly.

    normal_fn(x) -> (H [n,n], g [n], cost scalar) of the IRLS-weighted
    problem at x, i.e. H = J^T W(x) J, g = J^T W(x) r(x),
    cost = 0.5 r^T W r. For problems whose per-block Gram matrices are
    precomputable (the motion-only BA: constant Jacobian, LINEAR
    reprojection residual, per-landmark Huber weights — see
    `ba.build_normal_problem`), this shrinks the while_loop body from
    two [n, m] x [m, .] products over m ~ 8k residuals to a few
    block-weighted sums + one n-dim Cholesky solve — the loop body is
    what single-stream latency is made of on this chip.

    Accept/reject, radius update, and convergence rules are identical to
    `lm_solve` (Ceres gain-ratio trust region). Returns (x, info).
    """
    h0, g0, cost0 = normal_fn(x0)
    dtype = x0.dtype
    n = x0.shape[0]

    def body(s: NormalLMState) -> NormalLMState:
        d = jnp.diag(s.h)
        d = jnp.where(d > 0, d, 1.0)
        h_damped = s.h + s.lam * jnp.diag(d)
        chol = jnp.linalg.cholesky(h_damped + 1e-32 * jnp.eye(n, dtype=dtype))
        step = -jax.scipy.linalg.cho_solve((chol, True), s.g)
        bad_chol = ~jnp.all(jnp.isfinite(step))
        step = jnp.where(bad_chol, jnp.zeros_like(step), step)

        x_new = s.x + step
        h_new, g_new, new_cost = normal_fn(x_new)

        model_decrease = -(s.g @ step) - 0.5 * step @ (s.h @ step)
        model_decrease = jnp.maximum(model_decrease, 1e-32)
        rho = (s.cost - new_cost) / model_decrease

        accept = (
            (rho > options.min_relative_decrease)
            & jnp.isfinite(new_cost) & ~bad_chol
        )

        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_acc = jnp.clip(s.lam * shrink, options.min_lambda, options.max_lambda)
        lam_rej = jnp.clip(s.lam * s.nu, options.min_lambda, options.max_lambda)

        # Candidate-based convergence (see lm_solve.body): a rejected step
        # whose cost change is already under tolerance must terminate, not
        # reject-loop to the iteration cap.
        cost_change = jnp.abs(s.cost - new_cost)
        f_conv = cost_change <= options.function_tolerance * (s.cost + 1e-32)
        x_norm = jnp.linalg.norm(s.x)
        p_conv = jnp.linalg.norm(step) <= options.parameter_tolerance * (
            x_norm + options.parameter_tolerance
        )
        done = (f_conv | p_conv) & jnp.isfinite(new_cost) & ~bad_chol

        return NormalLMState(
            x=jnp.where(accept, x_new, s.x),
            h=jnp.where(accept, h_new, s.h),
            g=jnp.where(accept, g_new, s.g),
            cost=jnp.where(accept, new_cost, s.cost),
            lam=jnp.where(accept, lam_acc, lam_rej),
            nu=jnp.where(accept, jnp.asarray(2.0, dtype), s.nu * 2.0),
            it=s.it + 1,
            done=done,
            accepted=s.accepted + accept.astype(jnp.int32),
        )

    def cond(s: NormalLMState):
        return (~s.done) & (s.it < options.max_iterations)

    init = NormalLMState(
        x=x0, h=h0, g=g0, cost=cost0,
        lam=jnp.asarray(options.initial_lambda, dtype),
        nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        accepted=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    info = {
        "initial_cost": cost0,
        "final_cost": final.cost,
        "iterations": final.it,
        "accepted_steps": final.accepted,
        "lambda": final.lam,
        # information matrix at the solution (the carried H is always
        # evaluated at the accepted x) — consumed by marginalization
        "h_final": final.h,
    }
    return final.x, info


def huber_block_weights(r_blocks: jax.Array, mask: jax.Array, delta: float = 1.0):
    """Per-block Huber IRLS weights, Ceres `HuberLoss(1.0)` convention.

    r_blocks: [..., k] whitened residual blocks; mask: [...] validity.
    Ceres applies the loss to the squared norm s = ||r_block||^2:
        rho'(s) = 1            if s <= delta^2
                  delta/sqrt(s) otherwise
    Returns weights [...] (0 where masked).
    """
    s = jnp.sum(r_blocks * r_blocks, axis=-1)
    d2 = delta * delta
    w = jnp.where(s <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-32)))
    return jnp.where(mask, w, 0.0)
