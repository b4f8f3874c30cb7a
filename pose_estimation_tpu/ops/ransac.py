"""Fixed-budget vectorized RANSAC: fundamental matrix (8-point) outlier
rejection, replacing `cv::findFundamentalMat(..., FM_RANSAC)`.

The reference gates every matcher output through fundamental-matrix RANSAC
(`/root/reference/src/feature-tracker.cpp:189,279,476`; OpenCV defaults:
3px reprojection threshold, 0.99 confidence, adaptive iteration count).
Adaptive, data-dependent iteration counts are hostile to XLA, so this runs a
FIXED batch of hypotheses entirely in parallel: sample B 8-tuples, solve all
8-point problems as one batched eigenproblem, score all hypotheses against
all points with one matmul-shaped reduction, pick the best. B=64 hypotheses
exceed the 0.99-confidence iteration count for inlier ratios >= 0.5 (the
regime these gated matches live in).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.utils.precision import full_precision


class RansacResult(NamedTuple):
    inliers: jnp.ndarray   # [N] bool
    model: jnp.ndarray     # [3,3] best fundamental matrix
    n_inliers: jnp.ndarray


def _normalize(pts, mask):
    """Hartley normalization over valid points: zero mean, mean dist sqrt2."""
    wsum = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / wsum
    d = jnp.linalg.norm(pts - mean, axis=1)
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sum(jnp.where(mask, d, 0.0)) / wsum, 1e-9
    )
    t = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], pts.dtype,
    )
    return (pts - mean) * scale, t


def _adjugate3(m):
    """adj(M) for [..., 3, 3] — cross products of column pairs, transposed."""

    def cof(i, j):
        r = [a for a in range(3) if a != i]
        c = [a for a in range(3) if a != j]
        return (
            m[..., r[0], c[0]] * m[..., r[1], c[1]]
            - m[..., r[0], c[1]] * m[..., r[1], c[0]]
        ) * ((-1.0) ** (i + j))

    cofm = jnp.stack(
        [jnp.stack([cof(i, j) for j in range(3)], -1) for i in range(3)], -2
    )
    return jnp.swapaxes(cofm, -1, -2)


def _null8(a):
    """Exact null vector of each [8, 9] constraint matrix via batched
    Gauss-Jordan elimination with FULL pivoting (8 unrolled steps).

    With exactly 8 sampled correspondences the 8-point system A f = 0 has a
    generic one-dimensional EXACT nullspace, so the minimal-residual
    eigenvector of A^T A *is* the null vector — no spectral machinery
    needed. `jnp.linalg.eigh` on the batched 9x9 normal matrices was
    measured at 982 us/frame on-chip (80% of internal_match, the single
    largest item in the whole VIO step — benchmarks/match_exp.py); this
    elimination is a few dozen elementwise passes over [B, 8, 9].

    Full pivoting (argmax |entry| over the remaining submatrix) keeps f32
    growth in check; a degenerate sample (near-collinear points) yields a
    garbage hypothesis that simply loses the inlier vote, exactly as the
    eigh-based hypothesis from the same degenerate sample would.

    After Gauss-Jordan, each pivot row r reads x[c_r] + m[r, free] *
    x[free] = 0 (its pivot column normalized to 1, all other pivot columns
    eliminated), so x[free] = 1, x[c_r] = -m[r, free].
    """
    b = a.shape[0]
    m = a
    dtype = a.dtype
    row_avail = jnp.ones((b, 8), dtype)
    col_avail = jnp.ones((b, 9), dtype)
    pivots = []
    for _ in range(8):
        absm = jnp.abs(m) * row_avail[:, :, None] * col_avail[:, None, :]
        pidx = jnp.argmax(absm.reshape(b, 72), axis=1)
        prow_oh = jax.nn.one_hot(pidx // 9, 8, dtype=dtype)      # [B, 8]
        pcol_oh = jax.nn.one_hot(pidx % 9, 9, dtype=dtype)       # [B, 9]
        piv = jnp.einsum("br,brc,bc->b", prow_oh, m, pcol_oh)
        safe = jnp.where(jnp.abs(piv) < 1e-30, 1.0, piv)
        prow = jnp.einsum("br,brc->bc", prow_oh, m) / safe[:, None]  # [B,9]
        colv = jnp.einsum("brc,bc->br", m, pcol_oh)              # [B, 8]
        factor = colv * (1.0 - prow_oh)       # eliminate all non-pivot rows
        m = m - factor[:, :, None] * prow[:, None, :]
        # pivot row <- its normalized form (Gauss-Jordan)
        m = (m * (1.0 - prow_oh)[:, :, None]
             + prow_oh[:, :, None] * prow[:, None, :])
        row_avail = row_avail * (1.0 - prow_oh)
        col_avail = col_avail * (1.0 - pcol_oh)
        pivots.append((prow_oh, pcol_oh))
    free_oh = col_avail                                          # [B, 9]
    mf = jnp.einsum("brc,bc->br", m, free_oh)                    # [B, 8]
    x = free_oh
    for prow_oh, pcol_oh in pivots:
        coeff = jnp.einsum("br,br->b", prow_oh, mf)
        x = x - coeff[:, None] * pcol_oh
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x = x / jnp.maximum(norm, 1e-30)

    # One ridged inverse-iteration step to clean the f32 elimination error:
    # the 8-point spectrum is ill-separated (second-smallest singular value
    # down to ~3e-5 of the largest), so the GE null vector carries an
    # eps/sigma_8-sized error component that measurably degrades the
    # hypotheses (LM iters 13.0 -> 19.5 on the bench replay when used
    # bare — benchmarks/ransac_ab.py; a 3-seed sweep later showed that
    # particular gap to be chaotic pool-composition variance, null8
    # {19.2,13.6,14.6} vs eigh {13.0,16.0,17.7}). Solving
    # (A^T A + ridge I) w = x amplifies the true null direction by
    # ~1/ridge vs >= sigma_8^2 for every other component; one step from
    # the GE seed beats even f32 eigh against an f64 oracle (median
    # direction error 2e-8 vs 5.6e-5 on-chip) at batched 9x9-Cholesky
    # cost instead of the iterative eigh (982 us/frame).
    # ridge = 1e-10 * tr sits between the f32 noise floor (~1e-14 tr) and
    # genuine sigma_8^2 (~1e-9 tr).
    ata = jnp.einsum("bri,brj->bij", a, a)
    tr = jnp.trace(ata, axis1=-2, axis2=-1)
    eye = jnp.eye(9, dtype=dtype)
    h = ata + (1e-10 * tr)[:, None, None] * eye
    chol = jnp.linalg.cholesky(h)
    w = jax.scipy.linalg.cho_solve((chol, True), x[..., None])[..., 0]
    wn = jnp.linalg.norm(w, axis=-1, keepdims=True)
    ok = jnp.isfinite(w).all(axis=-1, keepdims=True) & (wn > 1e-30)
    return jnp.where(ok, w / jnp.maximum(wn, 1e-30), x)


def _null_eigh(a):
    """eigh-based oracle null vector (debug / A-B escape hatch: set
    PE_RANSAC_EIGH=1 to route _eight_point through the original batched
    9x9 eigh instead of `_null8` — used to bisect accuracy regressions).
    The flag is read ONCE at module import (`_USE_EIGH` below): set it in
    the environment BEFORE importing pose_estimation_tpu. Toggling it later
    in-process has no effect — callers' jit caches would keep the traced
    variant anyway, so import-time read makes the semantics explicit."""
    ata = jnp.einsum("bij,bik->bjk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[..., 0]


def _eight_point(x1, x2):
    """Batched 8-point algorithm. x1, x2: [B, 8, 2] -> F [B, 3, 3].

    The rank-2 projection removes the smallest singular component
    u3 (u3^T F) with u3 from the adjugate of F F^T (near-rank-2 F =>
    adj(F F^T) ~ sigma1^2 sigma2^2 u3 u3^T), replacing the iterative
    batched-SVD lowering; hypothesis-level F error vs eigh+SVD measured
    <= 1.2e-2 worst-case over 300 random noisy samples, far inside what
    the 3px Sampson inlier gate resolves."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    # constraint rows: x2^T F x1 = 0
    a = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # [B, 8, 9]
    # exact nullspace by elimination (see _null8) — replaces the batched
    # 9x9 eigh, which dominated the whole front-end's on-chip cost
    import os

    nullv = _null_eigh if os.environ.get("PE_RANSAC_EIGH") == "1" else _null8
    f = nullv(a).reshape(-1, 3, 3)
    # rank-2 projection: F - u3 (u3^T F)
    fft = jnp.einsum("bij,bkj->bik", f, f)
    adj = _adjugate3(fft)
    diag = jnp.abs(jnp.diagonal(adj, axis1=-2, axis2=-1))     # [B, 3]
    hot = diag == jnp.max(diag, axis=-1, keepdims=True)
    hot = hot & (jnp.cumsum(hot, axis=-1) == 1)
    u3 = jnp.sum(adj * hot[..., None, :].astype(adj.dtype), axis=-1)
    u3 = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-30)
    return f - u3[..., :, None] * jnp.einsum("bi,bij->bj", u3, f)[:, None, :]


def _sampson_dist(f, pts1, pts2):
    """Sampson epipolar distance. f [B,3,3], pts [N,2] -> [B, N]."""
    ones = jnp.ones((pts1.shape[0], 1), pts1.dtype)
    x1 = jnp.concatenate([pts1, ones], axis=1)      # [N,3]
    x2 = jnp.concatenate([pts2, ones], axis=1)
    fx1 = jnp.einsum("bij,nj->bni", f, x1)          # [B,N,3]
    ftx2 = jnp.einsum("bji,nj->bni", f, x2)
    num = jnp.einsum("ni,bni->bn", x2, fx1) ** 2
    den = (
        fx1[..., 0] ** 2 + fx1[..., 1] ** 2 + ftx2[..., 0] ** 2 + ftx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


@full_precision
def fundamental_ransac(
    pts1: jnp.ndarray,    # [N, 2]
    pts2: jnp.ndarray,    # [N, 2]
    mask: jnp.ndarray,    # [N] candidate validity
    key: jax.Array,
    n_hypotheses: int = 64,
    threshold: float = 3.0,
) -> RansacResult:
    """Vectorized RANSAC inlier mask for the correspondence set."""
    n = pts1.shape[0]
    dtype = pts1.dtype

    p1n, t1 = _normalize(pts1, mask)
    p2n, t2 = _normalize(pts2, mask)

    # sample valid indices with replacement, biased away from invalid slots
    probs = mask.astype(dtype)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-9)
    idx = jax.random.choice(key, n, shape=(n_hypotheses, 8), p=probs)
    f_n = _eight_point(p1n[idx], p2n[idx])
    # denormalize: F = T2^T Fn T1
    f = jnp.einsum("ji,bjk,kl->bil", t2, f_n, t1)

    d = _sampson_dist(f, pts1, pts2)                 # [B, N]
    inl = (d < threshold * threshold) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return RansacResult(
        inliers=inl[best], model=f[best], n_inliers=counts[best]
    )
