"""Grunert P3P minimal solver vs synthetic exact poses (VERDICT r2 #8).

Oracle protocol: random rotations/translations with points in front of the
camera; exact normalized projections. One of the (up to) 4 closed-form
solutions must reproduce the pose to tight tolerance, and `pnp_ransac`
with solver="p3p" must recover poses through outliers at least as well as
the epnp_min fallback it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.ops import pnp as pnp_mod
from pose_estimation_tpu.ops.p3p import p3p_solve
from pose_estimation_tpu.utils import lie


def random_pose(rng):
    rv = rng.normal(size=3) * 0.6
    r = np.asarray(lie.so3_exp(jnp.asarray(rv)))
    t = rng.normal(size=3) * np.array([1.0, 1.0, 0.5]) + np.array([0, 0, 4.0])
    return r, t


def project(r, t, x):
    xc = x @ r.T + t
    return xc[:, :2] / xc[:, 2:3], xc[:, 2]


class TestP3PMinimal:
    def test_exact_recovery_batch(self):
        """>= 97% of random exact triplets yield a solution within 1e-4 of
        the true pose (the remainder are near-degenerate triplets, which
        RANSAC scoring discards naturally)."""
        rng = np.random.default_rng(0)
        n_cases = 200
        objs, imgs, rs, ts = [], [], [], []
        for _ in range(n_cases):
            r, t = random_pose(rng)
            while True:
                x = rng.normal(size=(3, 3)) * 2.0
                img, z = project(r, t, x)
                if np.all(z > 0.5) and np.all(np.abs(img) < 1.5):
                    break
            objs.append(x), imgs.append(img), rs.append(r), ts.append(t)
        r4, t4 = p3p_solve(
            jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(imgs))
        )
        r4, t4 = np.asarray(r4), np.asarray(t4)
        hits = 0
        for i in range(n_cases):
            errs = []
            for k in range(4):
                if not np.all(np.isfinite(r4[i, k])):
                    continue
                dr = np.linalg.norm(
                    np.asarray(lie.so3_log(jnp.asarray(r4[i, k].T @ rs[i])))
                )
                dt = np.linalg.norm(t4[i, k] - ts[i])
                errs.append(dr + dt)
            if errs and min(errs) < 1e-4:
                hits += 1
        assert hits >= 0.97 * n_cases, f"only {hits}/{n_cases} recovered"

    def test_all_roots_satisfy_projection(self):
        """Every finite returned solution reprojects its own 3 sample points
        exactly (each quartic root IS a geometrically consistent pose for
        the triplet; they differ on OTHER points)."""
        rng = np.random.default_rng(1)
        r, t = random_pose(rng)
        x = rng.normal(size=(3, 3)) * 2.0
        img, z = project(r, t, x)
        assert np.all(z > 0)
        r4, t4 = p3p_solve(jnp.asarray(x)[None], jnp.asarray(img)[None])
        r4, t4 = np.asarray(r4[0]), np.asarray(t4[0])
        n_checked = 0
        for k in range(4):
            if not np.all(np.isfinite(r4[k])):
                continue
            proj, zz = project(r4[k], t4[k], x)
            if np.any(zz <= 0):
                continue
            np.testing.assert_allclose(proj, img, atol=5e-5)
            n_checked += 1
        assert n_checked >= 1

    @pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
    def test_ransac_with_outliers(self, outlier_frac):
        rng = np.random.default_rng(2)
        r, t = random_pose(rng)
        n = 120
        x = rng.normal(size=(n, 3)) * 2.0
        x[:, 2] = np.abs(x[:, 2])
        img, z = project(r, t, x)
        keep = z > 0.5
        n_out = int(outlier_frac * n)
        img[:n_out] += rng.normal(size=(n_out, 2)) * 0.3
        k_mat = jnp.asarray(
            [[450.0, 0, 376.0], [0, 450.0, 240.0], [0, 0, 1.0]]
        )
        px = np.asarray(img) * 450.0 + np.array([376.0, 240.0])
        res = pnp_mod.pnp_ransac(
            jnp.asarray(x), jnp.asarray(px), jnp.asarray(keep), k_mat,
            jax.random.PRNGKey(3), solver="p3p",
        )
        r_est = np.asarray(lie.so3_exp(res.rvec))
        dr = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(r_est.T @ r))))
        dt = np.linalg.norm(np.asarray(res.tvec) - t)
        assert dr < 1e-3 and dt < 5e-3, (dr, dt)
        # inliers found among the clean correspondences
        assert int(res.n_inliers) > 0.8 * (keep.sum() - n_out)
