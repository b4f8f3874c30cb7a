"""SO(3) / SE(3) Lie-group operations in JAX.

TPU-native replacement for the vendored Sophus library used by the reference
(`/root/reference/thirdparty/Sophus-1.0.0/sophus/{so3,se3}.hpp`) and the
right-Jacobian helpers in `/root/reference/src/imu-preintegrator.cpp:6-62`.

Design notes
------------
* Rotations are 3x3 matrices (not quaternions): the window size is tiny (W=4)
  so storage is irrelevant, and matrices compose with one MXU-friendly matmul.
* Everything is shape-polymorphic over leading batch dimensions and safe to
  `vmap` / `grad`: small-angle branches use Taylor series selected with
  `jnp.where` on *safe* denominators so gradients never see NaN.
* dtype follows the inputs (tests run float64 on CPU; TPU runs float32).
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle cutoff on theta^2. Deliberately wide (theta < 0.1 rad): XLA's
# sin/cos are only ~2^-27 accurate on some backends, so for small angles we
# use Taylor series with enough terms to be exact to float64 (truncation
# error < 3e-14 at theta = 0.1), and per-sample IMU rotations always land in
# this branch.
_EPS2 = 1e-2


def hat(v):
    """Skew-symmetric matrix of a 3-vector. [..., 3] -> [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """Inverse of `hat`. [..., 3, 3] -> [..., 3]."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


# ---------------------------------------------------------------------------
# Accurate sin/cos. XLA's transcendentals are only ~2^-27 accurate on some
# backends (observed on CPU), which is not enough for float64 oracle parity.
# Cody-Waite range reduction by pi/2 plus a full-precision Taylor polynomial
# on [-pi/4, pi/4] gives ~1 ulp in float64 and costs ~20 fused multiply-adds
# on the VPU. In float32 this is no slower than the builtin.
# ---------------------------------------------------------------------------

_PI2_HI = 1.5707963267948966      # high part of pi/2
_PI2_LO = 6.123233995736766e-17   # low part of pi/2


def _sincos_core(r):
    """sin/cos on [-pi/4-eps, pi/4+eps] by Taylor, float64-exact."""
    r2 = r * r
    # Horner for sin(r) = r * S(r^2)
    s = 1.0 / 121645100408832000.0
    s = 1.0 / 355687428096000.0 - s * r2
    s = 1.0 / 1307674368000.0 - s * r2
    s = 1.0 / 6227020800.0 - s * r2
    s = 1.0 / 39916800.0 - s * r2
    s = 1.0 / 362880.0 - s * r2
    s = 1.0 / 5040.0 - s * r2
    s = 1.0 / 120.0 - s * r2
    s = 1.0 / 6.0 - s * r2
    sin_r = r - r * r2 * s
    # cos(r) = C(r^2)
    c = 1.0 / 6402373705728000.0
    c = 1.0 / 20922789888000.0 - c * r2
    c = 1.0 / 87178291200.0 - c * r2
    c = 1.0 / 479001600.0 - c * r2
    c = 1.0 / 3628800.0 - c * r2
    c = 1.0 / 40320.0 - c * r2
    c = 1.0 / 720.0 - c * r2
    c = 1.0 / 24.0 - c * r2
    cos_r = 1.0 - r2 * (0.5 - r2 * c)
    return sin_r, cos_r


def sin_cos(theta):
    """Accurate (sin, cos) for |theta| up to ~1e3 (far beyond any rotation)."""
    k = jnp.round(theta * (2.0 / jnp.pi))
    r = (theta - k * _PI2_HI) - k * _PI2_LO
    sin_r, cos_r = _sincos_core(r)
    q = jnp.asarray(k, jnp.int32) & 3
    sin_t = jnp.where(
        q == 0, sin_r,
        jnp.where(q == 1, cos_r, jnp.where(q == 2, -sin_r, -cos_r)),
    )
    cos_t = jnp.where(
        q == 0, cos_r,
        jnp.where(q == 1, -sin_r, jnp.where(q == 2, -cos_r, sin_r)),
    )
    return sin_t, cos_t


def _sinc_coeffs(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) robustly.

    Taylor fallbacks near zero:
      A ~ 1 - t^2/6 + t^4/120
      B ~ 1/2 - t^2/24 + t^4/720
      C ~ 1/6 - t^2/120 + t^4/5040
    """
    small = theta2 < _EPS2
    # Safe theta2 avoids 0/0 in the exact formulas (value replaced by where).
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    sin_t, cos_t = sin_cos(theta)
    a_exact = sin_t / theta
    b_exact = (1.0 - cos_t) / safe2
    c_exact = (theta - sin_t) / (safe2 * theta)
    t4 = theta2 * theta2
    t6 = t4 * theta2
    a_taylor = 1.0 - theta2 / 6.0 + t4 / 120.0 - t6 / 5040.0
    b_taylor = 0.5 - theta2 / 24.0 + t4 / 720.0 - t6 / 40320.0
    c_taylor = 1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0 - t6 / 362880.0
    return (
        jnp.where(small, a_taylor, a_exact),
        jnp.where(small, b_taylor, b_exact),
        jnp.where(small, c_taylor, c_exact),
    )


def so3_exp(omega):
    """Exponential map so(3) -> SO(3) (Rodrigues). [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def mat_to_quat(r):
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method.

    Branch-free: computes all four candidate constructions and selects the
    numerically best (largest pivot) with `where`, so it is vmap/grad safe.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest. In each, the
    # pivot slot holds s^2 (s = 2*q_pivot) so that after normalization the
    # component ratios are exact: e.g. for the trace branch
    # q = [s^2, m21-m12, m02-m20, m10-m01] ~ [4w^2, 4wx, 4wy, 4wz].
    def pos(x):
        return jnp.maximum(x, 1e-30)

    q0 = jnp.stack([pos(1.0 + tr), m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack(
        [m21 - m12, pos(1.0 + m00 - m11 - m22), m01 + m10, m02 + m20], axis=-1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, pos(1.0 - m00 + m11 - m22), m12 + m21], axis=-1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, pos(1.0 - m00 - m11 + m22)], axis=-1
    )
    # Pivot magnitudes (all >= 0 where valid).
    p = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(p, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_mat(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def so3_log(r):
    """Logarithm map SO(3) -> so(3) via the quaternion (robust near pi).

    Matches Sophus' `SO3::log()` which also goes through the quaternion.
    [..., 3, 3] -> [..., 3].
    """
    q = mat_to_quat(r)
    w = q[..., 0]
    v = q[..., 1:]
    n2 = jnp.sum(v * v, axis=-1)
    small = n2 < _EPS2
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    # angle = 2*atan2(|v|, w); factor = angle / |v|
    factor_exact = 2.0 * jnp.arctan2(n, w) / n
    # Taylor: 2/w * (1 - n^2/(3 w^2))
    factor_taylor = 2.0 / jnp.maximum(w, 1e-30) * (1.0 - n2 / (3.0 * jnp.maximum(w * w, 1e-30)))
    factor = jnp.where(small, factor_taylor, factor_exact)
    return v * factor[..., None]


def right_jacobian(omega):
    """Right Jacobian of SO(3), Jr(w) = I - B(w) w^ + C(w) (w^)^2.

    Same closed form as `rightJacobianSO3` in the reference
    (`src/imu-preintegrator.cpp:6-33`).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    _, b, c = _sinc_coeffs(theta2)
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye - b[..., None, None] * k + c[..., None, None] * k2


def left_jacobian(omega):
    """Left Jacobian, Jl(w) = Jr(-w)."""
    return right_jacobian(-omega)


def right_jacobian_inverse(omega):
    """Inverse right Jacobian of SO(3).

    JrInv(w) = I + w^/2 + (1/t^2 - (1+cos t)/(2 t sin t)) (w^)^2,
    with Taylor fallback  (1/12 + t^2/720 + ...) for small t.
    Mirrors `rightJacobianInverseSO3` (`src/imu-preintegrator.cpp:36-62`).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < _EPS2
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    sin_t, cos_t = sin_cos(theta)
    coeff_exact = 1.0 / safe2 - (1.0 + cos_t) / (2.0 * theta * jnp.where(small, jnp.ones_like(sin_t), sin_t))
    t4 = theta2 * theta2
    coeff_taylor = 1.0 / 12.0 + theta2 / 720.0 + t4 / 30240.0 + t4 * theta2 / 1209600.0
    coeff = jnp.where(small, coeff_taylor, coeff_exact)
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + 0.5 * k + coeff[..., None, None] * k2


# ----------------------------------------------------------------------------
# SE(3): represented as a pair (R [...,3,3], p [...,3]).
# ----------------------------------------------------------------------------


def se3_apply(r, p, x):
    """Apply T=(r,p) to points x [..., 3]."""
    return jnp.einsum("...ij,...j->...i", r, x) + p


def se3_compose(r1, p1, r2, p2):
    """T1 * T2."""
    return r1 @ r2, se3_apply(r1, p1, p2)


def se3_inverse(r, p):
    rt = jnp.swapaxes(r, -1, -2)
    return rt, -jnp.einsum("...ij,...j->...i", rt, p)


def se3_exp(xi):
    """se(3) exp with xi = [rho(3), omega(3)] (translation first, Sophus order
    is (translation, rotation) in the tangent vector)."""
    rho, omega = xi[..., :3], xi[..., 3:]
    r = so3_exp(omega)
    # V = left Jacobian of SO(3)
    v = left_jacobian(omega)
    p = jnp.einsum("...ij,...j->...i", v, rho)
    return r, p


def se3_log(r, p):
    omega = so3_log(r)
    v_inv = jnp.swapaxes(right_jacobian_inverse(-omega), -1, -2)
    # Jl^{-1}(w) = Jr^{-1}(-w); and Jl^{-1} = Jr^{-1}(w)^T as well.
    rho = jnp.einsum("...ij,...j->...i", right_jacobian_inverse(-omega), p)
    del v_inv
    return jnp.concatenate([rho, omega], axis=-1)
