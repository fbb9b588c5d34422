"""Multi-sequence scale-out over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2: no DP/TP/PP, no
torch.distributed anywhere).  The natural TPU parallel axis for iSLAM is
INDEPENDENT SEQUENCES: each trajectory window carries sequential state, so
time cannot be split, but distinct sequences (or distinct trajectory shards
with their own carry) are embarrassingly parallel.  This module shards that
axis over ICI:

    mesh = make_mesh(n)                    # 1-D 'seq' mesh
    step = multi_sequence_train_step(...)  # pjit'd: per-device local window,
                                           # psum-averaged gradients

Parameters are replicated; per-sequence batches/IMU windows/init states are
sharded on axis 0; the gradient mean over sequences is the only collective
(one psum over ICI per step).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from islam_tpu.train import train_step


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "seq") -> Any:
    """Place a pytree with a leading sequence dim onto the mesh, sharded on
    axis 0."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


def multi_sequence_train_step(mesh: Mesh, **static_kwargs):
    """Build the pjit'd multi-sequence step.

    Returns step(vo_variables, dn_params, batches, imu_wins, init_states,
                 rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias)
    where every array in ``batches``/``imu_wins``/``init_states`` has a
    leading sequence axis sharded over the mesh.  Output grads are averaged
    over sequences (XLA lowers the mean to an all-reduce over ICI).
    """
    axis = mesh.axis_names[0]

    def step(vo_variables, dn_params, batches, imu_wins, init_states,
             rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias):
        def one(batch, win, init):
            return train_step(
                vo_variables, dn_params, batch, win, init,
                rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
                **static_kwargs)

        losses, grads, aux = jax.vmap(one)(batches, imu_wins, init_states)
        loss = jnp.mean(losses)
        if grads is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.mean(g, axis=0), grads)
        return loss, grads, aux

    data_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, repl, data_sharding, data_sharding,
                      data_sharding, repl, repl, repl, repl, repl),
        out_shardings=(repl, repl, data_sharding),
    )
