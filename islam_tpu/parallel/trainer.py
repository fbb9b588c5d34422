"""Multi-sequence imperative trainer over a device mesh.

The scale-out driver for BASELINE.json config 5 ("batched multi-sequence
imperative training across a slice"): N independent trajectories train
simultaneously, one per mesh position -- each carries its own sequential
PVGO state (time cannot be split, SURVEY.md section 2), parameters are
replicated, and the per-epoch update averages gradients across sequences
with a single ICI all-reduce.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu.imu.module import IMUModule
from islam_tpu.imu.preintegrator import IMUState
from islam_tpu.models import tartanvo as tvo
from islam_tpu.parallel.mesh import (make_mesh, multi_sequence_train_scan,
                                     multi_sequence_train_step,
                                     replicate, shard_batch)
from islam_tpu.testing import device_batch


def _stack(trees):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


class MultiSequenceTrainer:
    """Trains the shared VO model on N sequences in parallel.

    ``datasets``: list of TrajFolderDataset-likes, one per mesh position.
    """

    def __init__(self, datasets: List[Any], batch_size: int = 8,
                 lr: float = 3e-6, loss_weight=(1., 0.1, 10., 0.1),
                 rot_w: float = 1.0, trans_w: float = 0.1,
                 correct_scale: bool = False, bf16: bool = False,
                 mesh=None, vo_variables=None, dn_params=None):
        import optax

        self.datasets = datasets
        self.B = batch_size
        n = len(datasets)
        self.mesh = mesh if mesh is not None else make_mesh(n)
        assert len(self.mesh.devices.ravel()) == n

        peek = datasets[0][0]
        h, w = peek["img0"].shape[0], peek["img0"].shape[1]
        if vo_variables is None:
            vo_variables = tvo.init_params(jax.random.PRNGKey(0), h, w)
        self.vo_variables = replicate(self.mesh, vo_variables)
        self.dn_params = (replicate(self.mesh, dn_params)
                          if dn_params is not None else None)

        self.imus = [IMUModule(
            ds.accels, ds.gyros, ds.imu_dts, ds.accel_bias, ds.gyro_bias,
            init=ds.imu_init, gravity=ds.gravity,
            rgb2imu_sync=ds.rgb2imu_sync, denoise_params=None,
            denoise_accel=True, denoise_gyro=(ds.datatype != "kitti"),
            batch_frames=batch_size) for ds in datasets]
        # All sequences must share the padded IMU window size (one program).
        S = max(m.S for m in self.imus)
        for m in self.imus:
            m.S = S

        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(vo_variables["params"]["flowPoseNet"])

        datatype = datasets[0].datatype
        self._static_kwargs = dict(
            target="vo", datatype=datatype,
            correct_scale=correct_scale,
            use_kitti_coord=(datatype != "tartanair"),
            denoise_accel=True, denoise_gyro=(datatype != "kitti"),
            loss_weight=tuple(float(x) for x in loss_weight),
            rot_w=rot_w, trans_w=trans_w, bf16=bf16)
        self.step_fn = multi_sequence_train_step(
            self.mesh, **self._static_kwargs)
        self._scan_fn = None  # built on first scan_chunk use

        self._aux_consts = (
            replicate(self.mesh, jnp.asarray(
                np.asarray(datasets[0].rgb2imu_pose), jnp.float32)),
            replicate(self.mesh, self.imus[0].gravity),
            replicate(self.mesh, self.imus[0].accel_bias),
            replicate(self.mesh, self.imus[0].gyro_bias),
            replicate(self.mesh, jnp.asarray(False)),
        )
        self._init_states = [dict(ds.imu_init) for ds in datasets]

    def _window_inputs(self, start):
        """Collate window [start, start+B) of every sequence."""
        from islam_tpu.data.dataset import collate

        batches, wins = [], []
        for ds, imu in zip(self.datasets, self.imus):
            sample = collate([ds[i] for i in range(start, start + self.B)])
            batches.append(device_batch(sample, start))
            wins.append(imu.window_inputs(start, start + self.B))
        return batches, wins

    def run_epoch(self, scan_chunk: int = 0):
        """One epoch over all sequences in parallel.

        ``scan_chunk`` > 1 fuses that many sequential windows per sequence
        into one lax.scan program (multi_sequence_train_scan).  The
        per-sequence state carry stays ON DEVICE between windows
        (aux['carry']); only the epoch-end states are fetched.
        """
        import optax

        n_batches = min(len(ds) for ds in self.datasets) // self.B
        grad_accum = None
        losses = []
        # per-epoch reset to the dataset init states (the reference's
        # init_epoch, train.py:195-196)
        inits_s = shard_batch(self.mesh, _stack([IMUState(
            pos=jnp.asarray(np.asarray(ds.imu_init["pos"]), jnp.float32),
            rot=jnp.asarray(np.asarray(ds.imu_init["rot"]), jnp.float32),
            vel=jnp.asarray(np.asarray(ds.imu_init["vel"]), jnp.float32))
            for ds in self.datasets]))

        if scan_chunk > 1:
            if self._scan_fn is None:
                self._scan_fn = multi_sequence_train_scan(
                    self.mesh, **self._static_kwargs)
            bi = 0
            while bi < n_batches:
                K = min(scan_chunk, n_batches - bi)
                per_win = [self._window_inputs((bi + k) * self.B)
                           for k in range(K)]
                # (N, K, ...): stack windows per sequence, then sequences
                batches_s = shard_batch(self.mesh, _stack(
                    [_stack([per_win[k][0][s] for k in range(K)])
                     for s in range(len(self.datasets))]))
                wins_s = shard_batch(self.mesh, _stack(
                    [_stack([per_win[k][1][s] for k in range(K)])
                     for s in range(len(self.datasets))]))
                loss_nk, grads, aux = self._scan_fn(
                    self.vo_variables, self.dn_params, batches_s, wins_s,
                    inits_s, *self._aux_consts)
                inits_s = aux["carry"]
                losses.extend(np.asarray(loss_nk).mean(axis=0).tolist())
                if grads is not None:
                    grad_accum = grads if grad_accum is None else (
                        jax.tree_util.tree_map(jnp.add, grad_accum, grads))
                bi += K
        else:
            for bi in range(n_batches):
                batches, wins = self._window_inputs(bi * self.B)
                batches_s = shard_batch(self.mesh, _stack(batches))
                wins_s = shard_batch(self.mesh, _stack(wins))

                loss, grads, aux = self.step_fn(
                    self.vo_variables, self.dn_params, batches_s, wins_s,
                    inits_s, *self._aux_consts)
                losses.append(float(loss))
                if grads is not None:
                    grad_accum = grads if grad_accum is None else (
                        jax.tree_util.tree_map(jnp.add, grad_accum, grads))
                # per-sequence state carry, device-resident
                inits_s = aux["carry"]

        # one fetch at epoch end, for inspection/checkpointing
        carry = jax.tree_util.tree_map(np.asarray, inits_s)
        self._init_states = [
            {"pos": carry.pos[s], "rot": carry.rot[s], "vel": carry.vel[s]}
            for s in range(len(self.datasets))]

        if grad_accum is not None:
            params = self.vo_variables["params"]["flowPoseNet"]
            updates, self.opt_state = self.opt.update(
                grad_accum, self.opt_state, params)
            new_pose = optax.apply_updates(params, updates)
            p = dict(self.vo_variables["params"])
            p["flowPoseNet"] = new_pose
            out = dict(self.vo_variables)
            out["params"] = p
            self.vo_variables = out
        return losses
