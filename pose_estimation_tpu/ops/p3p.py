"""Batched closed-form P3P (Grunert) — the true minimal perspective-3-point
solver for the reference's SOLVEPNP_P3P/AP3P config values
(`/root/reference/src/feature-tracker.cpp:521-529`).

Grunert's 1841 reduction (the formulation in Haralick et al., "Review and
Analysis of Solutions of the Three Point Perspective Pose Estimation
Problem"): with depths s_i along the three bearing rays f_i and pairwise
world distances a = |X2-X3|, b = |X1-X3|, c = |X1-X2|, the law-of-cosines
system

    s2^2 + s3^2 - 2 s2 s3 cos(alpha) = a^2
    s1^2 + s3^2 - 2 s1 s3 cos(beta)  = b^2
    s1^2 + s2^2 - 2 s1 s2 cos(gamma) = c^2

reduces, with u = s2/s1 and v = s3/s1, to u = N(v)/D(v) (N quadratic, D
linear) and a QUARTIC in v. TPU-batched design decisions:

* the quartic coefficients are built by static polynomial convolution of
  N, D, Q coefficient vectors — no hand-expanded 20-term formulas to get
  wrong;
* roots come from Ferrari's closed form (resolvent cubic solved
  trigonometrically, picking its largest real root) followed by NEWTON
  POLISH steps on the original quartic — the polish is what makes the
  closed form f32-safe on TPU; complex/invalid roots surface as NaN and
  are filtered by the caller's reprojection scoring (NaN compares false);
* all (up to) 4 roots are emitted as SEPARATE pose hypotheses; inside
  RANSAC the consensus scoring disambiguates them, so no 4th point is
  needed.

(R, t) per root is recovered by rigid Procrustes between the world points
and the back-projected camera points s_i f_i, matching cv::solvePnP's
x_cam = R X + t convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from pose_estimation_tpu.utils.precision import full_precision


def _poly_mul(p, q):
    """Multiply two polynomials given as coefficient LISTS (highest degree
    first, static python lists of traced scalars)."""
    out = [None] * (len(p) + len(q) - 1)
    for i, pi in enumerate(p):
        for j, qj in enumerate(q):
            t = pi * qj
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return out


def _cubic_max_real_root(b, c, d):
    """Largest real root of x^3 + b x^2 + c x + d (batched, trigonometric
    method; always exists)."""
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    # discriminant split: trig form for 3 real roots, cardano for 1
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # --- three real roots (disc <= 0): x = 2 sqrt(-p/3) cos(theta/3) - b/3
    pm = jnp.minimum(p, -1e-30)                       # p < 0 in this branch
    rr = jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (2.0 * pm * rr), -1.0, 1.0)
    theta = jnp.arccos(arg)
    x_trig = 2.0 * rr * jnp.cos(theta / 3.0) - b / 3.0
    # --- one real root (disc > 0): cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    cb = lambda t: jnp.sign(t) * jnp.abs(t) ** (1.0 / 3.0)
    x_card = cb(-q / 2.0 + sq) + cb(-q / 2.0 - sq) - b / 3.0
    return jnp.where(disc > 0, x_card, x_trig)


def _quartic_roots(coeffs):
    """Roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 (each [B]) -> [B, 4].

    Ferrari closed form + 3 Newton polish steps; complex root pairs come
    out as NaN."""
    c4, c3, c2, c1, c0 = coeffs
    lead = jnp.where(jnp.abs(c4) < 1e-20, jnp.sign(c4) * 1e-20 + 1e-20, c4)
    a = c3 / lead
    b = c2 / lead
    c = c1 / lead
    d = c0 / lead
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a/4
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a**3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a**4 / 256.0
    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 (Ferrari's
    # auxiliary variable 2m); its largest real root keeps sqrt args >= 0
    m = _cubic_max_real_root(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, 1e-12)
    s = jnp.sqrt(2.0 * m)
    t_term = q / (2.0 * s)
    # y^2 -+ s y + (p/2 + m +- t) = 0
    roots = []
    for sgn_s in (1.0, -1.0):
        cq = p / 2.0 + m - sgn_s * t_term
        disc = s * s / 4.0 - cq            # (sgn_s*s/2)^2 - cq
        sd = jnp.sqrt(disc)                # NaN where complex — intended
        for sgn_d in (1.0, -1.0):
            y = -sgn_s * s / 2.0 + sgn_d * sd
            roots.append(y - a / 4.0)
    x = jnp.stack(roots, axis=-1)          # [B, 4]
    # Newton polish on the ORIGINAL quartic (f32 closed form alone drifts)
    for _ in range(3):
        f = (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x
             + c1[..., None]) * x + c0[..., None]
        df = ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
              + 2.0 * c2[..., None]) * x + c1[..., None]
        df = jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
        x = x - f / df
    return x


@full_precision
def p3p_solve(obj: jnp.ndarray, img_n: jnp.ndarray):
    """Batched Grunert P3P.

    obj [B, 3, 3] world points, img_n [B, 3, 2] normalized image coords
    (f=1, c=0) -> (R [B, 4, 3, 3], t [B, 4, 3]): up to 4 solutions per
    sample, invalid ones NaN. x_cam = R X + t.
    """
    dtype = obj.dtype
    ones = jnp.ones(img_n.shape[:-1] + (1,), dtype)
    f = jnp.concatenate([img_n, ones], axis=-1)                # [B,3,3]
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]
    x1, x2, x3 = obj[:, 0], obj[:, 1], obj[:, 2]

    a2 = jnp.sum((x2 - x3) ** 2, axis=-1)                      # [B]
    b2 = jnp.sum((x1 - x3) ** 2, axis=-1)
    c2 = jnp.sum((x1 - x2) ** 2, axis=-1)
    b2s = jnp.where(b2 < 1e-18, 1e-18, b2)
    ca = jnp.sum(f2 * f3, axis=-1)                             # cos(alpha)
    cbe = jnp.sum(f1 * f3, axis=-1)                            # cos(beta)
    cg = jnp.sum(f1 * f2, axis=-1)                             # cos(gamma)

    acb = (a2 - c2) / b2s
    # u = N(v) / D(v): N = n2 v^2 + n1 v + n0, D = d1 v + d0
    n2 = 1.0 - acb
    n1 = 2.0 * cbe * acb
    n0 = -acb - 1.0
    d1 = 2.0 * ca
    d0 = -2.0 * cg
    # second constraint Q(v) = 1 + u^2 - 2 u cg - (c2/b2)(1 + v^2 - 2 v cbe)
    # = 0 with u substituted: N^2 - 2 cg N D + Q D^2 = 0, where
    # Q = q2 v^2 + q1 v + q0 (the u-free part)
    cb2 = c2 / b2s
    q2 = -cb2
    q1 = 2.0 * cb2 * cbe
    q0 = 1.0 - cb2

    n_poly = [n2, n1, n0]
    d_poly = [d1, d0]
    quart = _poly_mul(n_poly, n_poly)                          # degree 4
    cross = _poly_mul(n_poly, d_poly)                          # degree 3
    dd = _poly_mul(d_poly, d_poly)                             # degree 2
    qd2 = _poly_mul([q2, q1, q0], dd)                          # degree 4
    coeffs = [
        quart[0] + qd2[0],
        quart[1] - 2.0 * cg * cross[0] + qd2[1],
        quart[2] - 2.0 * cg * cross[1] + qd2[2],
        quart[3] - 2.0 * cg * cross[2] + qd2[3],
        quart[4] - 2.0 * cg * cross[3] + qd2[4],
    ]
    v = _quartic_roots(coeffs)                                 # [B,4]

    den_u = d1[..., None] * v + d0[..., None]
    den_u = jnp.where(jnp.abs(den_u) < 1e-12,
                      jnp.where(den_u < 0, -1e-12, 1e-12), den_u)
    u = (n2[..., None] * v * v + n1[..., None] * v + n0[..., None]) / den_u

    s1sq = b2s[..., None] / jnp.maximum(
        1.0 + v * v - 2.0 * v * cbe[..., None], 1e-12
    )
    s1 = jnp.sqrt(s1sq)
    s2 = u * s1
    s3 = v * s1
    # negative depths are geometrically invalid -> poison to NaN
    bad = (s1 <= 0) | (s2 <= 0) | (s3 <= 0)
    nan = jnp.full_like(s1, jnp.nan)
    s1 = jnp.where(bad, nan, s1)

    pc = jnp.stack(
        [s1[..., None] * f1[:, None, :],
         s2[..., None] * f2[:, None, :],
         s3[..., None] * f3[:, None, :]],
        axis=2,
    )                                                          # [B,4,3pts,3]
    b, _ = v.shape[0], v.shape[1]
    pw = jnp.broadcast_to(obj[:, None], pc.shape)
    from pose_estimation_tpu.ops.pnp import _procrustes

    r, t = _procrustes(
        pw.reshape(b * 4, 3, 3), pc.reshape(b * 4, 3, 3)
    )
    return r.reshape(b, 4, 3, 3), t.reshape(b, 4, 3)
