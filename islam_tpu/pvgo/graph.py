"""Pose-velocity factor graph residuals and upper-level (imperative) losses.

TPU-native rebuild of ``PoseVelGraph`` (pvgo.py:15-119).  Nodes are B+1 SE3
poses plus B+1 world velocities; the four residual blocks follow
pvgo.py:26-64 exactly:

  (a) VO relative pose:      (vo.Inv() @ n1.Inv() @ n2).Log()        -> (E, 6)
  (b) IMU delta velocity:    imu_dvels - diff(vels)                  -> (M, 3)
  (c) IMU relative rotation: (drot.Inv() @ r1.Inv() @ r2).Log()      -> (M, 3)
  (d) translation-velocity:  diff(trans) - (vels[:-1]*dt + dtrans)   -> (M, 3)

The upper-level losses reproduce the one-step/detached-solution coupling
(pvgo.py:67-111): the converged nodes are constants (lax.stop_gradient) and
gradients reach the front-end only through the residual expression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from islam_tpu import lie


def pvgo_residuals(nodes: jax.Array, vels: jax.Array,
                   edges: jax.Array, poses: jax.Array,
                   imu_drots: jax.Array, imu_dtrans: jax.Array,
                   imu_dvels: jax.Array, dts: jax.Array):
    """Residual blocks. nodes (N,7), vels (N,3), poses (E,7) VO motions,
    imu_drots (M,4) quats, dts (M,) or (M,1).  Returns tuple of 4 blocks."""
    dts = jnp.reshape(dts, (-1, 1)).astype(vels.dtype)

    n1 = nodes[edges[:, 0]]
    n2 = nodes[edges[:, 1]]
    pgerr = lie.se3_log(
        lie.se3_mul(lie.se3_inv(poses),
                    lie.se3_mul(lie.se3_inv(n1), n2)))

    adjvelerr = imu_dvels - (vels[1:] - vels[:-1])

    r1 = nodes[:-1, 3:]
    r2 = nodes[1:, 3:]
    imuroterr = lie.so3_log(
        lie.quat_mul(lie.quat_conj(imu_drots),
                     lie.quat_mul(lie.quat_conj(r1), r2)))

    trans = nodes[:, :3]
    transvelerr = (trans[1:] - trans[:-1]) - (vels[:-1] * dts + imu_dtrans)

    return pgerr, adjvelerr, imuroterr, transvelerr


def reproj_residual(nodes: jax.Array, reproj) -> jax.Array:
    """Optional 5th factor (pvgo.py:53-61): reprojection error of the
    consecutive-node motions.  ``reproj`` is a callable SE3 batch -> error
    (e.g. Dense/SparseReprojectionLoss); output flattened to (M, N*2) when
    3-D.  (The reference's stray debug write ``motion[0] = 0.1`` at
    pvgo.py:57 is not reproduced -- the path is dead code in its trainer.)
    """
    from islam_tpu.lie import SE3

    motion = SE3(lie.se3_mul(lie.se3_inv(nodes[:-1]), nodes[1:]))
    err = reproj(motion)
    if err.ndim == 3:
        err = err.reshape(err.shape[0], -1)
    elif err.ndim == 1:  # dense loss: per-frame mean, one residual per edge
        err = err[:, None]
    return err


def vo_loss(nodes: jax.Array, edges: jax.Array, poses: jax.Array,
            detach_nodes: bool = True):
    """Upper-level VO loss (pvgo.py:67-78).

    With ``detach_nodes`` (default, the reference's semantics) gradients
    flow to ``poses`` only; with False this is vo_loss_unroll
    (pvgo.py:81-92) and node gradients propagate (used by the implicit /
    unrolled bi-level modes).  Returns per-edge (trans_loss, rot_loss).
    """
    n1 = nodes[edges[:, 0]]
    n2 = nodes[edges[:, 1]]
    if detach_nodes:
        n1 = jax.lax.stop_gradient(n1)
        n2 = jax.lax.stop_gradient(n2)
    err = lie.se3_log(
        lie.se3_mul(lie.se3_inv(poses),
                    lie.se3_mul(lie.se3_inv(n1), n2)))
    trans_loss = jnp.sum(err[:, :3] ** 2, axis=1)
    rot_loss = jnp.sum(err[:, 3:] ** 2, axis=1)
    return trans_loss, rot_loss


def imu_loss(nodes: jax.Array, vels: jax.Array,
             imu_drots: jax.Array, imu_dvels: jax.Array):
    """Upper-level IMU loss on DETACHED nodes/vels (pvgo.py:95-111).

    Gradients flow to ``imu_drots``/``imu_dvels`` (through the denoiser).
    """
    nodes = jax.lax.stop_gradient(nodes)
    vels = jax.lax.stop_gradient(vels)

    adjvelerr = imu_dvels - (vels[1:] - vels[:-1])

    r1 = nodes[:-1, 3:]
    r2 = nodes[1:, 3:]
    imuroterr = lie.so3_log(
        lie.quat_mul(lie.quat_conj(imu_drots),
                     lie.quat_mul(lie.quat_conj(r1), r2)))

    trans_loss = jnp.sum(adjvelerr ** 2, axis=1)
    rot_loss = jnp.sum(imuroterr ** 2, axis=1)
    return trans_loss, rot_loss


def align_to(nodes: jax.Array, vels: jax.Array, target: jax.Array,
             idx: int = 0):
    """Re-anchor the solution so nodes[idx] == target (pvgo.py:114-119)."""
    source = nodes[idx]
    tq = target[3:]
    sq_inv = lie.quat_conj(source[3:])
    vels_out = lie.quat_rotate(tq, lie.quat_rotate(sq_inv, vels))
    correction = lie.se3_mul(target, lie.se3_inv(source))
    nodes_out = lie.se3_mul(correction[None], nodes)
    return nodes_out, vels_out
