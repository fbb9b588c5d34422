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

from islam_tpu.train import train_scan, train_step


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host (pod / DCN) bring-up: one process per host.

    Thin wrapper over ``jax.distributed.initialize`` — on TPU pods all
    arguments are discovered from the environment; on other setups pass
    ``coordinator_address='host:port'`` plus the process count/id.  After
    this, ``jax.devices()`` spans every host and ``make_global_mesh``
    builds the sequence mesh over the full slice.  No-ops if the
    distributed runtime is already initialized (single-process tests).
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        # Belt and braces: jax 0.9 raises "distributed.initialize should
        # only be called once", older versions said "already initialized".
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def make_global_mesh(axis: str = "seq") -> Mesh:
    """Mesh over ALL devices of a (possibly multi-host) slice.

    Device order follows ``jax.devices()`` (process-major), so neighboring
    sequence shards stay on the same host's ICI domain and the single
    gradient all-reduce crosses DCN only at host boundaries — the layout
    the scaling-book recipe prescribes for pure data parallelism.  Use
    ``jax.process_index()``-strided slices of the dataset to feed each
    host its local sequences (per-host data loading; arrays assembled with
    ``jax.make_array_from_process_local_data``).
    """
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch_slice(n_sequences: int) -> slice:
    """The contiguous block of the global sequence axis owned by this host.

    ``n_sequences`` must divide evenly over processes — the same requirement
    ``global_shard_batch``'s assembly has — otherwise trailing sequences
    would be silently owned by no host.
    """
    procs = max(jax.process_count(), 1)
    if n_sequences % procs != 0:
        raise ValueError(
            f"n_sequences={n_sequences} does not divide over "
            f"{procs} processes; pad or drop the remainder explicitly")
    per = n_sequences // procs
    start = jax.process_index() * per
    return slice(start, start + per)


def shard_batch(mesh: Mesh, tree: Any, axis: str = "seq") -> Any:
    """Place a pytree with a leading sequence dim onto the mesh, sharded on
    axis 0.  Single-process meshes only (device_put needs every device
    addressable); multi-host feeding goes through ``global_shard_batch``."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


def global_shard_batch(mesh: Mesh, local_tree: Any, axis: str = "seq") -> Any:
    """Assemble GLOBAL arrays from per-process local sequence shards.

    Each process passes only the rows of the sequence axis it owns
    (``host_local_batch_slice``); the result is a global jax.Array sharded
    on ``axis`` over the (multi-host) mesh, the multi-controller analogue
    of ``shard_batch``.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_tree)


def global_replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree over a (multi-host) mesh; every process must pass
    identical values (params, constants)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        tree)


def multi_sequence_train_step(mesh: Mesh, **static_kwargs):
    """Build the pjit'd multi-sequence step.

    Returns step(vo_variables, dn_params, batches, imu_wins, init_states,
                 rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
                 prev_motions)
    where every array in ``batches``/``imu_wins``/``init_states`` has a
    leading sequence axis sharded over the mesh.  The calibration constants
    are PER-SEQUENCE too — ``rgb2imu_pose`` (N, 7), ``gravity`` (N,),
    ``accel_bias``/``gyro_bias`` (N, 3), ``subtract_bias`` (N,) — each
    sequence trains against its own dataset's calibration (KITTI drives from
    different dates have different T_BS/biases; replicating sequence-0's
    would silently corrupt the rest).  ``prev_motions`` is None on VO epochs
    or a sharded (N, B, 7) replay of the previous VO epoch's motions on IMU
    epochs (the reference's motion replay, train.py:204-215).  Output grads
    are averaged over sequences (XLA lowers the mean to an all-reduce over
    ICI).
    """
    axis = mesh.axis_names[0]

    def step(vo_variables, dn_params, batches, imu_wins, init_states,
             rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
             prev_motions):
        def one(batch, win, init, t_il, g, ab, gb, sb, prev):
            return train_step(
                vo_variables, dn_params, batch, win, init,
                t_il, g, ab, gb, sb, prev_motions=prev, **static_kwargs)

        losses, grads, aux = jax.vmap(one)(
            batches, imu_wins, init_states, rgb2imu_pose, gravity,
            accel_bias, gyro_bias, subtract_bias, prev_motions)
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
                      data_sharding, data_sharding, data_sharding,
                      data_sharding, data_sharding, data_sharding,
                      data_sharding),
        out_shardings=(repl, repl, data_sharding),
    )


def multi_sequence_train_scan(mesh: Mesh, **static_kwargs):
    """Fused-chunk variant of ``multi_sequence_train_step``: each sequence
    runs K sequential windows as one lax.scan (on-device state carry + grad
    accumulation, islam_tpu.train.train_scan), vmapped over the sharded
    sequence axis — N x K windows per XLA program, the production scale-out
    structure.  ``batches``/``imu_wins`` carry (N, K, ...) leading axes;
    calibration constants are per-sequence (N-leading, sharded) and
    ``prev_motions`` is None or (N, K, B, 7) — see
    ``multi_sequence_train_step``.

    Returns (losses (N, K), grads summed over windows and averaged over
    sequences, aux with ``aux['carry']`` = per-sequence tail states, sharded).
    """
    axis = mesh.axis_names[0]

    def step(vo_variables, dn_params, batches, imu_wins, init_states,
             rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
             prev_motions):
        def one(batch, win, init, t_il, g, ab, gb, sb, prev):
            return train_scan(
                vo_variables, dn_params, batch, win, init,
                t_il, g, ab, gb, sb, prev_motions=prev, **static_kwargs)

        losses, grads, aux = jax.vmap(one)(
            batches, imu_wins, init_states, rgb2imu_pose, gravity,
            accel_bias, gyro_bias, subtract_bias, prev_motions)
        if grads is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.mean(g, axis=0), grads)
        return losses, grads, aux

    data_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, repl, data_sharding, data_sharding,
                      data_sharding, data_sharding, data_sharding,
                      data_sharding, data_sharding, data_sharding,
                      data_sharding),
        out_shardings=(data_sharding, repl, data_sharding),
    )
