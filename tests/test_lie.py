"""Lie-group unit tests against scipy.spatial.transform as oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pose_estimation_tpu.utils import lie


def rand_omegas(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_omegas(64, 2.0)
        r = np.asarray(lie.so3_exp(jnp.asarray(w)))
        r_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(r, r_ref, atol=1e-12)

    def test_exp_small_angle(self):
        w = rand_omegas(16, 1e-9)
        r = np.asarray(lie.so3_exp(jnp.asarray(w)))
        r_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(r, r_ref, atol=1e-14)

    def test_log_roundtrip(self):
        for scale in (1e-8, 1e-3, 1.0, 3.0):
            w = rand_omegas(64, scale, seed=1)
            # keep |w| < pi for uniqueness
            norm = np.linalg.norm(w, axis=-1, keepdims=True)
            w = np.where(norm > 3.1, w / norm * 3.1, w)
            r = lie.so3_exp(jnp.asarray(w))
            w2 = np.asarray(lie.so3_log(r))
            np.testing.assert_allclose(w2, w, atol=1e-9)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = axis * (np.pi - 1e-7)
        r = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(r))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_quat_roundtrip(self):
        w = rand_omegas(64, 2.0, seed=2)
        r = lie.so3_exp(jnp.asarray(w))
        q = lie.mat_to_quat(r)
        r2 = lie.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-12)
        # against scipy (scipy quats are xyzw; ours wxyz)
        q_ref = ScipyRot.from_matrix(np.asarray(r)).as_quat()
        q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
        q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-12)

    def test_hat_vee(self):
        w = rand_omegas(8)
        np.testing.assert_allclose(
            np.asarray(lie.vee(lie.hat(jnp.asarray(w)))), w, atol=0
        )


class TestJacobians:
    def test_right_jacobian_closed_form(self):
        """Jr from finite differences of exp: exp(w+dw) ~ exp(w) exp(Jr dw)."""
        w = rand_omegas(16, 1.5, seed=3)
        jr = np.asarray(lie.right_jacobian(jnp.asarray(w)))
        eps = 1e-7
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            r1 = ScipyRot.from_rotvec(w + dw).as_matrix()
            r0 = ScipyRot.from_rotvec(w).as_matrix()
            # d = log(r0^T r1) / eps  ==> Jr e_k
            d = ScipyRot.from_matrix(np.einsum("nij,njk->nik", r0.transpose(0, 2, 1), r1)).as_rotvec() / eps
            np.testing.assert_allclose(jr[:, :, k], d, atol=1e-5)

    def test_right_jacobian_inverse(self):
        w = rand_omegas(32, 2.0, seed=4)
        jr = np.asarray(lie.right_jacobian(jnp.asarray(w)))
        jri = np.asarray(lie.right_jacobian_inverse(jnp.asarray(w)))
        eye = np.broadcast_to(np.eye(3), jr.shape)
        np.testing.assert_allclose(jri @ jr, eye, atol=1e-10)

    def test_small_angle_identity(self):
        w = rand_omegas(8, 1e-10, seed=5)
        eye = np.broadcast_to(np.eye(3), (8, 3, 3))
        np.testing.assert_allclose(np.asarray(lie.right_jacobian(jnp.asarray(w))), eye, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(lie.right_jacobian_inverse(jnp.asarray(w))), eye, atol=1e-9
        )

    def test_grad_safe_at_zero(self):
        """No NaNs in gradients through exp/Jr at omega == 0."""
        def f(w):
            return jnp.sum(lie.so3_exp(w)) + jnp.sum(lie.right_jacobian(w))

        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_compose_inverse(self):
        w = rand_omegas(8, 1.0, seed=6)
        p = rand_omegas(8, 5.0, seed=7)
        r = lie.so3_exp(jnp.asarray(w))
        ri, pi_ = lie.se3_inverse(r, jnp.asarray(p))
        rc, pc = lie.se3_compose(r, jnp.asarray(p), ri, pi_)
        np.testing.assert_allclose(np.asarray(rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(pc), np.zeros((8, 3)), atol=1e-12)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(8)
        xi = rng.normal(size=(16, 6))
        xi[:, 3:] *= 0.8
        r, p = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(r, p))
        np.testing.assert_allclose(xi2, xi, atol=1e-9)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
