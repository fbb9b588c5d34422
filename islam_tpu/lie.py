"""Quaternion-backed SO(3)/SE(3) Lie-group library for JAX on TPU.

This module is the TPU-native replacement for the PyPose LieTensor runtime the
reference depends on (see /root/reference/pvgo.py:7, imu_integrator.py:2,
Datasets/transformation.py:3).  It follows PyPose's storage conventions so that
trajectories, checkpoints and test vectors interchange directly:

- SO3: ``[..., 4]`` quaternion in ``(x, y, z, w)`` order (Hamilton, unit norm).
- SE3: ``[..., 7]`` as ``[tx, ty, tz, qx, qy, qz, qw]``.
- so3: ``[..., 3]`` rotation vector (axis * angle).
- se3: ``[..., 6]`` as ``[tau (3), phi (3)]`` -- translation part first, matching
  PyPose's ``Log`` layout consumed by the reference at pvgo.py:75-76
  (``error[:, :3]`` = translation, ``error[:, 3:]`` = rotation).

Everything is a pure function on ``jnp`` arrays with full batch support; the
``SO3``/``SE3`` wrapper classes are registered pytrees so they pass through
``jit``/``vmap``/``scan`` unchanged.  All trig paths have Taylor guards so the
functions are safe (and differentiable) at the identity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Small-angle threshold: below this, use Taylor expansions. float32-safe.
_EPS = 1e-6


# ---------------------------------------------------------------------------
# Quaternion primitives (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of quaternions stored as (x, y, z, w)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v`` by unit quaternions ``q`` (active rotation R v)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # v' = v + 2 qw (qv x v) + 2 qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix ``[..., 3, 3]``."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion (x, y, z, w).

    Branch-free Shepperd's method via jnp.where (safe for autodiff away from
    the branch boundaries; inputs are assumed to be valid rotation matrices).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best per element.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack(
        [m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + tr))[..., None]
    q1 = jnp.stack(
        [1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + m00 - m11 - m22))[..., None]
    q2 = jnp.stack(
        [m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 + m11 - m22))[..., None]
    q3 = jnp.stack(
        [m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 - m11 + m22))[..., None]

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# so(3) <-> SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """Rotation vector ``[..., 3]`` -> unit quaternion (x, y, z, w).

    Taylor-guarded with the double-where trick so both value AND gradients
    (any order) are NaN-free at phi = 0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < _EPS
    # Safe theta: 1.0 in the small branch so the exact branch never sees 0.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    # sin(t/2)/t: Taylor 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector with angle in [0, pi].

    Double-where guarded: at the identity the exact branch would divide by
    ||qv|| = 0 whose REVERSE-MODE gradient is NaN even when masked, so the
    norm is computed on a safe surrogate in the small branch.
    """
    # Force positive scalar part so the returned angle is minimal.
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)
    qv = q[..., :3]
    qw = q[..., 3:4]
    nv2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv2 < _EPS * _EPS
    nv_safe = jnp.sqrt(jnp.where(small, 1.0, nv2))
    qw_safe = jnp.where(jnp.abs(qw) < 1e-12, 1.0, qw)
    # angle/nv ~ 2/qw * (1 - nv^2/(3 qw^2)) for small nv
    scale = jnp.where(
        small,
        2.0 / qw_safe * (1.0 - nv2 / (3.0 * qw_safe * qw_safe)),
        2.0 * jnp.arctan2(nv_safe, qw) / nv_safe,
    )
    return qv * scale


def so3_hat(phi: jax.Array) -> jax.Array:
    """Rotation vector -> skew-symmetric matrix ``[..., 3, 3]``."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _so3_left_jacobian_coeffs(phi: jax.Array):
    """Returns (A, B) with V = I + A [phi]x + B [phi]x^2. Double-where safe."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS
    t2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(t2_safe)
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta_safe)) / t2_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta_safe - jnp.sin(theta_safe)) / (t2_safe * theta_safe))
    return a, b


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    a, b = _so3_left_jacobian_coeffs(phi)
    k = so3_hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS
    t2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(t2_safe)
    half = 0.5 * theta_safe
    # c = 1/theta^2 - (1 + cos t) / (2 t sin t) = 1/t^2 - cot(t/2)/(2t)
    sin_half = jnp.sin(half)
    sin_safe = jnp.where(jnp.abs(sin_half) < 1e-12, 1.0, sin_half)
    cot_half = jnp.cos(half) / sin_safe
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / t2_safe - cot_half / (2.0 * theta_safe),
    )
    k = so3_hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * k + c[..., None, None] * (k @ k)


# ---------------------------------------------------------------------------
# se(3) <-> SE(3)   (storage: [t(3), q(4)]; tangent: [tau(3), phi(3)])
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist ``[..., 6]`` = [tau, phi] -> SE3 ``[..., 7]``."""
    tau, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(T: jax.Array) -> jax.Array:
    """SE3 ``[..., 7]`` -> twist ``[..., 6]`` = [tau, phi]."""
    t, q = T[..., :3], T[..., 3:]
    phi = so3_log(q)
    tau = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_mul(T1: jax.Array, T2: jax.Array) -> jax.Array:
    t1, q1 = T1[..., :3], T1[..., 3:]
    t2, q2 = T2[..., :3], T2[..., 3:]
    return jnp.concatenate(
        [t1 + quat_rotate(q1, t2), quat_mul(q1, q2)], axis=-1
    )


def se3_inv(T: jax.Array) -> jax.Array:
    t, q = T[..., :3], T[..., 3:]
    qinv = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qinv, t), qinv], axis=-1)


def se3_act(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply transform to points ``[..., 3]``."""
    return quat_rotate(T[..., 3:], p) + T[..., :3]


def se3_to_matrix(T: jax.Array) -> jax.Array:
    R = quat_to_matrix(T[..., 3:])
    t = T[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(m: jax.Array) -> jax.Array:
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def se3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def so3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.asarray([0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (4,))


def se3_adjoint(T: jax.Array) -> jax.Array:
    """Adjoint matrix ``[..., 6, 6]`` mapping twists: Ad_T xi.

    Layout matches the [tau, phi] tangent ordering:
        [[R, [t]x R], [0, R]]
    """
    R = quat_to_matrix(T[..., 3:])
    tx = so3_hat(T[..., :3])
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Retractions (for manifold optimization, cf. pvgo back-end)
# ---------------------------------------------------------------------------

def se3_retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative retraction: Exp(xi) o T."""
    return se3_mul(se3_exp(xi), T)


def so3_retract(q: jax.Array, phi: jax.Array) -> jax.Array:
    return quat_mul(so3_exp(phi), q)


# ---------------------------------------------------------------------------
# Pytree wrapper classes (ergonomic API mirroring pp.SO3 / pp.SE3)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class SO3:
    """Batched SO(3) wrapper over quaternion arrays (x, y, z, w)."""

    __slots__ = ("data",)

    def __init__(self, data: Any):
        self.data = jnp.asarray(data)

    # pytree protocol
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    # --- algebra ---
    def __matmul__(self, other):
        if isinstance(other, SO3):
            return SO3(quat_mul(self.data, other.data))
        other = jnp.asarray(other)
        return quat_rotate(self.data, other)

    def Inv(self) -> "SO3":
        return SO3(quat_conj(self.data))

    def Log(self) -> jax.Array:
        return so3_log(self.data)

    def Act(self, p: jax.Array) -> jax.Array:
        return quat_rotate(self.data, p)

    def matrix(self) -> jax.Array:
        return quat_to_matrix(self.data)

    def tensor(self) -> jax.Array:
        return self.data

    def normalized(self) -> "SO3":
        return SO3(quat_normalize(self.data))

    # --- shape sugar ---
    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def dtype(self):
        return self.data.dtype

    def __getitem__(self, idx):
        return SO3(self.data[idx])

    def __len__(self):
        return self.data.shape[0]

    def reshape(self, *shape):
        return SO3(self.data.reshape(*shape, 4))

    def __repr__(self):
        return f"SO3({self.data})"

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SO3":
        return SO3(so3_identity(shape, dtype))

    @staticmethod
    def exp(phi: jax.Array) -> "SO3":
        return SO3(so3_exp(phi))


@jax.tree_util.register_pytree_node_class
class SE3:
    """Batched SE(3) wrapper over ``[t(3), q(4)]`` arrays."""

    __slots__ = ("data",)

    def __init__(self, data: Any):
        self.data = jnp.asarray(data)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return SE3(se3_mul(self.data, other.data))
        other = jnp.asarray(other)
        return se3_act(self.data, other)

    def Inv(self) -> "SE3":
        return SE3(se3_inv(self.data))

    def Log(self) -> jax.Array:
        return se3_log(self.data)

    def Act(self, p: jax.Array) -> jax.Array:
        return se3_act(self.data, p)

    def rotation(self) -> SO3:
        return SO3(self.data[..., 3:])

    def translation(self) -> jax.Array:
        return self.data[..., :3]

    def matrix(self) -> jax.Array:
        return se3_to_matrix(self.data)

    def tensor(self) -> jax.Array:
        return self.data

    def normalized(self) -> "SE3":
        q = quat_normalize(self.data[..., 3:])
        return SE3(jnp.concatenate([self.data[..., :3], q], axis=-1))

    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def dtype(self):
        return self.data.dtype

    def __getitem__(self, idx):
        return SE3(self.data[idx])

    def __len__(self):
        return self.data.shape[0]

    def __repr__(self):
        return f"SE3({self.data})"

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(se3_identity(shape, dtype))

    @staticmethod
    def exp(xi: jax.Array) -> "SE3":
        return SE3(se3_exp(xi))

    @staticmethod
    def from_matrix(m: jax.Array) -> "SE3":
        return SE3(se3_from_matrix(m))

    @staticmethod
    def from_rot_trans(rot: SO3, trans: jax.Array) -> "SE3":
        return SE3(jnp.concatenate([trans, rot.data], axis=-1))
