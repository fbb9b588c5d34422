"""SE(3) trajectory / frame-convention utilities.

TPU-native counterpart of the reference's Datasets/transformation.py:9-124.
The numpy/scipy helpers keep their host-side role (GT motion preparation);
the chain ops are device-side: ``motion2pose`` replaces the python loop at
transformation.py:100-114 with an associative scan, and ``pose2motion``
(transformation.py:116-124) is a single batched composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from islam_tpu import lie
from islam_tpu.lie import SE3


# ---------------------------------------------------------------------------
# Host-side GT-motion preparation
# ---------------------------------------------------------------------------

def relative_twists(poses: np.ndarray, links=None, skip: int = 0) -> np.ndarray:
    """Ground-truth pose rows -> relative motion twists, fully vectorized.

    ``poses``: (N, 7) rows of [pos(3), quat(x, y, z, w)].
    ``links``: (L, 2) frame-index pairs; defaults to consecutive pairs with
    ``skip`` intermediate frames skipped.

    Returns (L, 6) rows of [trans(3), rotvec(3)] where, for a link (i, j),

        trans  = R_i^T (p_j - p_i)          (translation in frame i)
        rotvec = Log(R_i^T R_j)

    i.e. the se(3)-style [t, phi] parameterization the datasets feed as GT
    motion (the reference prepares the same quantity through a chain of
    per-row 4x4 matrix loops, Datasets/transformation.py:9-67; one batched
    scipy Rotation pass replaces all of it).
    """
    poses = np.asarray(poses)
    if links is None:
        links = [(i, i + skip + 1) for i in range(poses.shape[0] - skip - 1)]
    links = np.asarray(links)
    i, j = links[:, 0], links[:, 1]
    rots = R.from_quat(poses[:, 3:7])
    inv_i = rots[i].inv()
    trans = inv_i.apply(poses[j, :3] - poses[i, :3])
    rotvec = (inv_i * rots[j]).as_rotvec()
    return np.concatenate([trans, rotvec], axis=1)


# ---------------------------------------------------------------------------
# Device-side (JAX) helpers, mirroring transformation.py:72-124
# ---------------------------------------------------------------------------

def cvt_se3(motion) -> SE3:
    """Accept SE3 wrapper, (..., 7) quaternion-pose, or (..., 6) twist.

    Mirrors cvtSE3_pypose (transformation.py:72-87) including its 6-vector
    convention: [trans, so3] where trans is used DIRECTLY (not V(phi) tau).
    """
    if isinstance(motion, SE3):
        return motion
    motion = jnp.asarray(motion)
    if motion.shape[-1] == 6:
        trans = motion[..., :3]
        rot = lie.so3_exp(motion[..., 3:])
        return SE3(jnp.concatenate([trans, rot], axis=-1))
    elif motion.shape[-1] == 7:
        return SE3(motion)
    raise ValueError(f"Not a valid SE3/se3 input with trailing dim {motion.shape[-1]}")


# NED (TartanAir) <-> camera-forward (KITTI) axis permutation, a pure rotation
# conjugation: T = [[0,1,0],[0,0,1],[1,0,0]] (transformation.py:89-98).
_T2K = np.array(
    [[0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 0.0],
     [1.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    dtype=np.float32,
)


def tartan2kitti(motion) -> SE3:
    motion = cvt_se3(motion)
    T = SE3.from_matrix(jnp.asarray(_T2K, dtype=motion.dtype))
    return T @ motion @ T.Inv()


def motion2pose(motion, T0=None) -> SE3:
    """Chain relative motions into absolute poses: pose[0]=T0, pose[i+1]=pose[i] @ m[i].

    Replaces the sequential python loop at transformation.py:100-114 with an
    associative scan (O(log N) depth on device).
    """
    motion = cvt_se3(motion)
    if T0 is None:
        T0 = SE3.identity(dtype=motion.dtype)
    else:
        T0 = cvt_se3(T0)
    chain = jnp.concatenate([T0.data[None], motion.data], axis=0)
    poses = jax.lax.associative_scan(lie.se3_mul, chain, axis=0)
    return SE3(poses)


def pose2motion_se3(pose) -> SE3:
    """Relative motions between consecutive poses (transformation.py:116-124)."""
    pose = cvt_se3(pose)
    return SE3(lie.se3_mul(lie.se3_inv(pose.data[:-1]), pose.data[1:]))
