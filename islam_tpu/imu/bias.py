"""IMU bias calibration (the alternative path when no denoiser is given).

TPU-native rebuild of ``IMUFwd``/``optm_bias`` (imu_integrator.py:167-237):
learn constant accel/gyro biases by full-trajectory preintegration against
anchor poses, with Adam + plateau LR decay.  The whole objective (a scan
over the full IMU stream) is one jitted program; the epoch loop runs on the
host exactly like the reference's.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from islam_tpu import lie
from islam_tpu.imu.preintegrator import IMUState, preintegrate


@functools.partial(jax.jit, static_argnames=())
def bias_objective(biases: Dict[str, jax.Array], accels, gyros, dts,
                   poses, sync, init: IMUState, gravity):
    """Rot + trans error of the preintegrated trajectory at anchor frames.

    Mirrors IMUFwd.forward (imu_integrator.py:186-196): rotation error is
    the norm of the stacked Log residuals at synced frames; translation is
    MSE against anchor positions.
    """
    acc = accels - biases["accel"][None, :]
    gyr = gyros - biases["gyro"][None, :]
    states = preintegrate(dts, gyr, acc, init, gravity)
    # init-prepended: full[j] = world state after j samples, so full[sync[i]]
    # is the state at RGB frame i.
    pos = jnp.concatenate([init.pos[None], states.pos])[sync]
    rot = jnp.concatenate([init.rot[None], states.rot])[sync]

    roterr = lie.so3_log(
        lie.quat_mul(lie.quat_conj(poses[:, 3:]), rot))
    rot_loss = jnp.linalg.norm(roterr.reshape(-1))
    trans_loss = jnp.mean((poses[:, :3] - pos) ** 2)
    return rot_loss + trans_loss


def optimize_bias(lr: float, epochs: int, poses, sync, accels, gyros,
                  accel_bias, gyro_bias, dts, init, gravity,
                  verbose: bool = False):
    """Adam loop with ReduceLROnPlateau(factor=0.2, patience=2)
    (imu_integrator.py:212-237).  Returns (accel_bias, gyro_bias, history).
    """
    accels = jnp.asarray(np.asarray(accels), jnp.float32)
    gyros = jnp.asarray(np.asarray(gyros), jnp.float32)
    dts = np.asarray(dts, np.float32).reshape(-1)
    if dts.shape[0] < accels.shape[0]:
        dts = np.concatenate([dts, np.zeros(1, np.float32)])
    dts = jnp.asarray(dts)
    poses = jnp.asarray(np.asarray(poses), jnp.float32)
    sync = jnp.asarray(np.asarray(sync), jnp.int32)

    init_state = IMUState(
        pos=jnp.asarray(np.asarray(init["pos"]), jnp.float32),
        rot=jnp.asarray(np.asarray(init["rot"]), jnp.float32),
        vel=jnp.asarray(np.asarray(init["vel"]), jnp.float32))
    gravity = jnp.asarray(float(gravity), jnp.float32)

    biases = {"accel": jnp.asarray(np.asarray(accel_bias), jnp.float32),
              "gyro": jnp.asarray(np.asarray(gyro_bias), jnp.float32)}

    grad_fn = jax.jit(jax.value_and_grad(
        lambda b: bias_objective(b, accels, gyros, dts, poses, sync,
                                 init_state, gravity)))

    cur_lr = lr
    opt = optax.adam(cur_lr)
    opt_state = opt.init(biases)
    best = np.inf
    plateau = 0
    history = []
    for ep in range(epochs):
        loss, grads = grad_fn(biases)
        loss = float(loss)
        history.append(loss)
        updates, opt_state = opt.update(grads, opt_state, biases)
        biases = optax.apply_updates(biases, updates)
        # ReduceLROnPlateau(factor=0.2, patience=2)
        if loss < best - 1e-8:
            best = loss
            plateau = 0
        else:
            plateau += 1
            if plateau > 2:
                cur_lr *= 0.2
                opt = optax.adam(cur_lr)
                opt_state = opt.init(biases)
                plateau = 0
        if verbose:
            print(f"IMU bias loss: {loss:.6f}\tlr={cur_lr:g}")
    return biases["accel"], biases["gyro"], history
