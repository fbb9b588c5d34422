"""Lie core unit tests against scipy closed forms (SURVEY.md section 4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from islam_tpu import lie
from islam_tpu.lie import SE3, SO3

jax.config.update("jax_enable_x64", False)

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(0)


def rand_quat(n):
    q = RNG.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def rand_se3(n):
    q = rand_quat(n)
    t = RNG.normal(size=(n, 3)).astype(np.float32)
    return np.concatenate([t, q], axis=-1)


class TestSO3:
    def test_exp_matches_scipy(self):
        phi = RNG.normal(size=(64, 3)).astype(np.float32)
        q = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        q_ref = R.from_rotvec(phi).as_quat()  # scipy is (x,y,z,w) too
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)

    def test_log_matches_scipy(self):
        q = rand_quat(64)
        phi = np.asarray(lie.so3_log(jnp.asarray(q)))
        phi_ref = R.from_quat(q).as_rotvec()
        np.testing.assert_allclose(phi, phi_ref, atol=1e-5)

    def test_exp_log_roundtrip_small_angle(self):
        phi = np.asarray([[1e-8, 0, 0], [0, 0, 0], [1e-4, -1e-4, 1e-5]], np.float32)
        out = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(phi))))
        np.testing.assert_allclose(out, phi, atol=1e-7)

    def test_rotate_matches_matrix(self):
        q = rand_quat(32)
        v = RNG.normal(size=(32, 3)).astype(np.float32)
        out = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        ref = np.einsum("nij,nj->ni", R.from_quat(q).as_matrix(), v)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_matrix_roundtrip(self):
        q = rand_quat(128)
        m = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m, R.from_quat(q).as_matrix(), atol=1e-5)
        q2 = np.asarray(lie.matrix_to_quat(jnp.asarray(m)))
        sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)

    def test_mul_inv(self):
        q1, q2 = rand_quat(16), rand_quat(16)
        a = SO3(q1) @ SO3(q2)
        ref = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
        sign = np.sign(np.sum(np.asarray(a.data) * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(a.data), ref * sign, atol=1e-5)
        ident = (SO3(q1) @ SO3(q1).Inv()).data
        np.testing.assert_allclose(
            np.abs(np.asarray(ident)[:, 3]), np.ones(16), atol=1e-5
        )


class TestSE3:
    def test_mul_matches_matrix(self):
        T1, T2 = rand_se3(32), rand_se3(32)
        out = SE3(T1) @ SE3(T2)
        m = np.asarray(out.matrix())
        m_ref = np.asarray(SE3(T1).matrix()) @ np.asarray(SE3(T2).matrix())
        np.testing.assert_allclose(m, m_ref, atol=1e-5)

    def test_inv(self):
        T = rand_se3(32)
        ident = (SE3(T) @ SE3(T).Inv()).data
        np.testing.assert_allclose(np.asarray(ident)[:, :3], 0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(ident)[:, 6]), 1, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = (RNG.normal(size=(64, 6)) * 0.8).astype(np.float32)
        # Log returns the minimal-angle twist: keep |phi| < pi for identity.
        norm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 2.8 / norm)
        back = np.asarray(lie.se3_log(lie.se3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_log_exp_roundtrip(self):
        T = rand_se3(64)
        back = np.asarray(lie.se3_exp(lie.se3_log(jnp.asarray(T))))
        sign = np.sign(back[:, 6:] * T[:, 6:])
        np.testing.assert_allclose(back[:, :3], T[:, :3], atol=1e-4)
        np.testing.assert_allclose(back[:, 3:] * sign, T[:, 3:] * np.sign(T[:, 6:]) ** 0, atol=1e-4)

    def test_exp_matches_matrix_expm(self):
        from scipy.linalg import expm

        xi = (RNG.normal(size=(8, 6)) * 0.5).astype(np.float64)
        for x in xi:
            tau, phi = x[:3], x[3:]
            X = np.zeros((4, 4))
            X[:3, :3] = np.asarray(lie.so3_hat(jnp.asarray(phi)))
            X[:3, 3] = tau
            ref = expm(X)
            out = np.asarray(SE3.exp(jnp.asarray(x, dtype=jnp.float32)).matrix())
            np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_act(self):
        T = rand_se3(16)
        p = RNG.normal(size=(16, 3)).astype(np.float32)
        out = np.asarray(SE3(T).Act(jnp.asarray(p)))
        Rm = R.from_quat(T[:, 3:]).as_matrix()
        ref = np.einsum("nij,nj->ni", Rm, p) + T[:, :3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_adjoint(self):
        T = rand_se3(4)
        xi = RNG.normal(size=(4, 6)).astype(np.float32) * 0.3
        lhs = np.asarray(
            (SE3(T) @ SE3.exp(jnp.asarray(xi)) @ SE3(T).Inv()).Log()
        )
        rhs = np.einsum(
            "nij,nj->ni", np.asarray(lie.se3_adjoint(jnp.asarray(T))), xi
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-3)

    def test_jacobian_inverse_consistency(self):
        phi = RNG.normal(size=(32, 3)).astype(np.float32)
        V = np.asarray(lie.so3_left_jacobian(jnp.asarray(phi)))
        Vinv = np.asarray(lie.so3_left_jacobian_inv(jnp.asarray(phi)))
        np.testing.assert_allclose(
            V @ Vinv, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4
        )

    def test_pytree_jit_vmap(self):
        T = SE3(jnp.asarray(rand_se3(8)))

        @jax.jit
        def f(x: SE3):
            return (x @ x.Inv()).Log()

        out = f(T)
        np.testing.assert_allclose(np.asarray(out), 0, atol=1e-5)

    def test_grad_through_log(self):
        T = jnp.asarray(rand_se3(4))

        def loss(x):
            return jnp.sum(lie.se3_log(x) ** 2)

        g = jax.grad(loss)(T)
        assert np.all(np.isfinite(np.asarray(g)))
