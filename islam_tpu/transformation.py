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
# Host-side (numpy/scipy) helpers, mirroring transformation.py:9-67
# ---------------------------------------------------------------------------

def line2mat(line_data: np.ndarray) -> np.ndarray:
    mat = np.eye(4)
    mat[0:3, :] = line_data.reshape(3, 4)
    return mat


def pose2motion(data: np.ndarray, skip: int = 0, links=None) -> np.ndarray:
    """GT pose rows (N, 12) -> relative motions (L, 12)."""
    if links is None:
        links = [(i, i + skip + 1) for i in range(data.shape[0] - skip - 1)]
    all_motion = np.zeros((len(links), 12))
    for i, l in enumerate(links):
        pose_curr = line2mat(data[l[0], :])
        pose_next = line2mat(data[l[1], :])
        motion = np.linalg.inv(pose_curr) @ pose_next
        all_motion[i, :] = motion[0:3, :].reshape(12)
    return all_motion


def SO2so(SO_data):
    return R.from_matrix(SO_data).as_rotvec()


def so2SO(so_data):
    return R.from_rotvec(so_data).as_matrix()


def SE2se(SE_data: np.ndarray) -> np.ndarray:
    result = np.zeros(6)
    result[0:3] = np.asarray(SE_data)[0:3, 3]
    result[3:6] = SO2so(np.asarray(SE_data)[0:3, 0:3])
    return result


def se2SE(se_data: np.ndarray) -> np.ndarray:
    result_mat = np.eye(4)
    result_mat[0:3, 0:3] = so2SO(se_data[3:6])
    result_mat[0:3, 3] = se_data[0:3]
    return result_mat


def SEs2ses(motion_data: np.ndarray) -> np.ndarray:
    data_size = motion_data.shape[0]
    ses = np.zeros((data_size, 6))
    for i in range(data_size):
        SE = np.eye(4)
        SE[0:3, :] = motion_data[i, :].reshape(3, 4)
        ses[i, :] = SE2se(SE)
    return ses


def pos_quat2SE(quat_data: np.ndarray) -> np.ndarray:
    SO = R.from_quat(quat_data[3:7]).as_matrix()
    SE = np.eye(4)
    SE[0:3, 0:3] = SO
    SE[0:3, 3] = quat_data[0:3]
    return SE[0:3, :].reshape(1, 12)


def pos_quats2SEs(quat_datas: np.ndarray) -> np.ndarray:
    data_len = quat_datas.shape[0]
    SEs = np.zeros((data_len, 12))
    for i_data in range(data_len):
        SEs[i_data, :] = pos_quat2SE(quat_datas[i_data, :])
    return SEs


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
