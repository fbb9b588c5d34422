"""Multi-sequence imperative trainer over a device mesh.

The scale-out driver for BASELINE.json config 5 ("batched multi-sequence
imperative training across a slice"): N independent trajectories train
simultaneously, one per mesh position -- each carries its own sequential
PVGO state (time cannot be split, SURVEY.md section 2), parameters are
replicated, and the per-epoch update averages gradients across sequences
with a single ICI all-reduce.

Production parity with the single-chip Trainer (islam_tpu/train.py):
the full alternating bi-level schedule (epoch -> vo / imu target with
VO-motion replay on IMU epochs, reference train.py:151,204-215),
PER-SEQUENCE calibration constants (T_BS, gravity, biases sharded with the
batches — mixed-date KITTI drives differ), per-sequence trajectory
snapshots (the reference's snapshot(), train.py:51-61), checkpoint
save/resume with optimizer state, and a tail-chunk fallback so a
non-dividing --scan-chunk reuses the per-window program instead of
compiling a second scan program per tail length.
"""

from __future__ import annotations

import os
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
from islam_tpu.utils import checkpoints as ckpt


def _stack(trees):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


class MultiSequenceTrainer:
    """Trains the shared VO model on N sequences in parallel.

    ``datasets``: list of TrajFolderDataset-likes, one per mesh position.
    """

    def __init__(self, datasets: List[Any], batch_size: int = 8,
                 lr: float = 3e-6, imu_lr: float = 3e-5,
                 loss_weight=(1., 0.1, 10., 0.1),
                 rot_w: float = 1.0, trans_w: float = 0.1,
                 correct_scale: bool = False, bf16: bool = False,
                 mesh=None, vo_variables=None, dn_params=None):
        import optax

        self.datasets = datasets
        self.B = batch_size
        n = len(datasets)
        self.mesh = mesh if mesh is not None else make_mesh(n)
        assert len(self.mesh.devices.ravel()) == n
        datatype = datasets[0].datatype
        assert all(ds.datatype == datatype for ds in datasets), (
            "datatype is a static compile-time config; mixed-datatype "
            "sequence sets need one trainer per datatype")

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
            rgb2imu_sync=ds.rgb2imu_sync, denoise_params=dn_params,
            denoise_accel=True, denoise_gyro=(ds.datatype != "kitti"),
            batch_frames=batch_size) for ds in datasets]
        # All sequences must share the padded IMU window size (one program).
        S = max(m.S for m in self.imus)
        for m in self.imus:
            m.S = S

        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(vo_variables["params"]["flowPoseNet"])
        self._imu_lr = imu_lr
        if dn_params is not None:
            # same default as the single-chip trainer / the reference's
            # hard-coded denoiser lr (train.py:142)
            self.imu_opt = optax.adam(imu_lr)
            self.imu_opt_state = self.imu_opt.init(dn_params)

        self._static_kwargs = dict(
            datatype=datatype,
            correct_scale=correct_scale,
            use_kitti_coord=(datatype != "tartanair"),
            denoise_accel=True, denoise_gyro=(datatype != "kitti"),
            loss_weight=tuple(float(x) for x in loss_weight),
            rot_w=rot_w, trans_w=trans_w, bf16=bf16)
        self._step_fns = {}  # (target, scanned) -> compiled program
        # alternating bi-level schedule, indexable by epoch (train.py:151)
        self.train_target = [""] + ["vo", "imu"] * 100
        self.prev_vo_motions = None  # (N, windows*B, 7) after a VO epoch

        # Per-sequence calibration constants, SHARDED like the batches:
        # each sequence trains against its own dataset's T_BS / gravity /
        # biases (KITTI drives from different dates differ; replicating
        # sequence-0's would silently corrupt every other sequence).
        self._aux_consts = tuple(
            shard_batch(self.mesh, c) for c in (
                _stack([jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32)
                        for ds in datasets]),
                _stack([m.gravity for m in self.imus]),
                _stack([m.accel_bias for m in self.imus]),
                _stack([m.gyro_bias for m in self.imus]),
                _stack([jnp.asarray(m.optm_bias) for m in self.imus]),
            ))
        self._init_states = [dict(ds.imu_init) for ds in datasets]

    def _get_step_fn(self, target: str, scanned: bool):
        key = (target, scanned)
        if key not in self._step_fns:
            build = (multi_sequence_train_scan if scanned
                     else multi_sequence_train_step)
            self._step_fns[key] = build(
                self.mesh, target=(target or "none"), **self._static_kwargs)
        return self._step_fns[key]

    def _window_inputs(self, start):
        """Collate window [start, start+B) of every sequence."""
        from islam_tpu.data.dataset import collate

        batches, wins = [], []
        for ds, imu in zip(self.datasets, self.imus):
            sample = collate([ds[i] for i in range(start, start + self.B)])
            batches.append(device_batch(sample, start))
            wins.append(imu.window_inputs(start, start + self.B))
        return batches, wins

    def run_epoch(self, scan_chunk: int = 0, epoch: int = 1,
                  snapshot_dir=None, snapshot_interval=None):
        """One epoch over all sequences in parallel.

        ``epoch`` indexes the alternating bi-level schedule
        (``self.train_target``, the reference's train.py:151): epoch 0 is
        the gradient-free inference pass, odd epochs train the VO pose head,
        even epochs train the IMU denoiser — with the VO forward replaced by
        a replay of the previous VO epoch's cached motions
        (train.py:204-215), per sequence.

        ``scan_chunk`` > 1 fuses that many sequential windows per sequence
        into one lax.scan program (multi_sequence_train_scan).  Only
        full-size chunks go through the scan program; the remainder falls
        through to the already-compiled per-window step (the same
        tail-recompile hazard train.py:443-447 avoids: a tail chunk with a
        different static K would compile ANOTHER full XLA program per
        distinct tail length).

        ``snapshot_dir``: per-sequence trajectory snapshots are written to
        ``{snapshot_dir}/seq{i}/{epoch}/`` in the reference's layout
        (vo/pgo/imu pose+motion text files, train.py:51-61).
        """
        import optax

        from islam_tpu.train import _TrajLogs

        target = self.train_target[epoch]
        if target == "imu" and self.dn_params is None:
            raise ValueError(
                "epoch {} targets the IMU denoiser but no dn_params were "
                "given; pass dn_params= at construction".format(epoch))
        N = len(self.datasets)
        n_batches = min(len(ds) for ds in self.datasets) // self.B
        grad_accum = None
        losses = []
        epoch_motions = []  # (N, K, B, 7) blocks in window order
        prev_np = None
        if target not in ("vo", "") and self.prev_vo_motions is not None:
            prev_np = np.asarray(self.prev_vo_motions)
        # per-epoch reset to the dataset init states (the reference's
        # init_epoch, train.py:195-196)
        inits_s = shard_batch(self.mesh, _stack([IMUState(
            pos=jnp.asarray(np.asarray(ds.imu_init["pos"]), jnp.float32),
            rot=jnp.asarray(np.asarray(ds.imu_init["rot"]), jnp.float32),
            vel=jnp.asarray(np.asarray(ds.imu_init["vel"]), jnp.float32))
            for ds in self.datasets]))

        trajs = [_TrajLogs(dict(ds.imu_init)) for ds in self.datasets]
        pending = []  # deferred aux fetches (one device->host sync per flush)

        def flush():
            for aux in pending:
                m = np.asarray(aux["motions"])
                pg = np.asarray(aux["pgo_poses"])
                pv = np.asarray(aux["pgo_vels"])
                ip = np.asarray(aux["imu_poses"])
                if m.ndim == 3:  # per-window (N, B, 7); scanned (N, K, B, 7)
                    m, pg, pv, ip = m[:, None], pg[:, None], pv[:, None], ip[:, None]
                epoch_motions.append(m)
                for s in range(len(self.datasets)):
                    for k in range(m.shape[1]):
                        trajs[s].extend(m[s, k], pg[s, k], pv[s, k], ip[s, k])
            pending.clear()

        def save_snapshots():
            if not snapshot_dir:
                return
            flush()
            for s, t in enumerate(trajs):
                t.save(os.path.join(snapshot_dir, f"seq{s}"), epoch)

        bi = 0
        last_snap = 0
        # Same guard as the single-chip trainer (train.py): the scan
        # program accumulates grads with tree_map(add, ...), which assumes
        # a trainable target — epoch 0 ('' / inference) with a denoiser
        # present would pass trainable=dn_params into a grads=None step and
        # crash at trace time.  Inference epochs fall through to the
        # per-window step below.
        if scan_chunk > 1 and target in ("vo", "imu"):
            scan_fn = self._get_step_fn(target, scanned=True)
            K = scan_chunk
            while bi + K <= n_batches:
                per_win = [self._window_inputs((bi + k) * self.B)
                           for k in range(K)]
                # (N, K, ...): stack windows per sequence, then sequences
                batches_s = shard_batch(self.mesh, _stack(
                    [_stack([per_win[k][0][s] for k in range(K)])
                     for s in range(len(self.datasets))]))
                wins_s = shard_batch(self.mesh, _stack(
                    [_stack([per_win[k][1][s] for k in range(K)])
                     for s in range(len(self.datasets))]))
                prev = None
                if prev_np is not None:
                    prev = shard_batch(self.mesh, jnp.asarray(
                        prev_np[:, bi * self.B:(bi + K) * self.B].reshape(
                            N, K, self.B, 7)))
                loss_nk, grads, aux = scan_fn(
                    self.vo_variables, self.dn_params, batches_s, wins_s,
                    inits_s, *self._aux_consts, prev)
                inits_s = aux["carry"]
                pending.append(
                    {k: aux[k] for k in ("motions", "pgo_poses", "pgo_vels",
                                         "imu_poses")})
                losses.extend(np.asarray(loss_nk).mean(axis=0).tolist())
                if grads is not None:
                    grad_accum = grads if grad_accum is None else (
                        jax.tree_util.tree_map(jnp.add, grad_accum, grads))
                bi += K
                if snapshot_interval and bi // snapshot_interval > last_snap:
                    last_snap = bi // snapshot_interval
                    save_snapshots()

        # Per-window loop: everything when not scanned (bi == 0), the tail
        # remainder (n_batches % scan_chunk windows) when scanned -- on the
        # cached per-window program for this target, no tail recompile.
        step_fn = None
        for bi in range(bi, n_batches):
            if step_fn is None:
                step_fn = self._get_step_fn(target, scanned=False)
            batches, wins = self._window_inputs(bi * self.B)
            batches_s = shard_batch(self.mesh, _stack(batches))
            wins_s = shard_batch(self.mesh, _stack(wins))
            prev = None
            if prev_np is not None:
                prev = shard_batch(self.mesh, jnp.asarray(
                    prev_np[:, bi * self.B:(bi + 1) * self.B]))

            loss, grads, aux = step_fn(
                self.vo_variables, self.dn_params, batches_s, wins_s,
                inits_s, *self._aux_consts, prev)
            losses.append(float(loss))
            if grads is not None:
                grad_accum = grads if grad_accum is None else (
                    jax.tree_util.tree_map(jnp.add, grad_accum, grads))
            # per-sequence state carry, device-resident
            inits_s = aux["carry"]
            pending.append(
                {k: aux[k] for k in ("motions", "pgo_poses", "pgo_vels",
                                     "imu_poses")})
            if snapshot_interval and (bi + 1) % snapshot_interval == 0:
                save_snapshots()

        # one fetch at epoch end, for inspection/checkpointing
        carry = jax.tree_util.tree_map(np.asarray, inits_s)
        self._init_states = [
            {"pos": carry.pos[s], "rot": carry.rot[s], "vel": carry.vel[s]}
            for s in range(len(self.datasets))]

        # ONE optimizer update per epoch on the epoch's target
        # (train.py:172-179), from the sequence-averaged accumulated grads.
        if grad_accum is not None and target == "vo":
            params = self.vo_variables["params"]["flowPoseNet"]
            updates, self.opt_state = self.opt.update(
                grad_accum, self.opt_state, params)
            new_pose = optax.apply_updates(params, updates)
            p = dict(self.vo_variables["params"])
            p["flowPoseNet"] = new_pose
            out = dict(self.vo_variables)
            out["params"] = p
            self.vo_variables = out
        elif grad_accum is not None and target == "imu":
            updates, self.imu_opt_state = self.imu_opt.update(
                grad_accum, self.imu_opt_state, self.dn_params)
            self.dn_params = optax.apply_updates(self.dn_params, updates)

        save_snapshots()
        flush()
        # Cache this epoch's motions for the next IMU epoch's replay
        # (train.py:204-215): (N, total_windows*B, 7).
        if epoch_motions:
            self.prev_vo_motions = np.concatenate(
                [m.reshape(N, -1, 7) for m in epoch_motions], axis=1)
        return losses

    # ---- checkpointing (parity with Trainer.save_models/resume) ----

    def _ckpt_state(self):
        state = {
            "vo_variables": jax.tree_util.tree_map(
                np.asarray, self.vo_variables),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.opt_state),
            "seq_states": [
                {k: np.asarray(v) for k, v in st.items()}
                for st in self._init_states],
        }
        if self.dn_params is not None:
            state["dn_params"] = jax.tree_util.tree_map(
                np.asarray, self.dn_params)
            state["imu_opt_state"] = jax.tree_util.tree_map(
                np.asarray, self.imu_opt_state)
        return state

    def save_models(self, directory, epoch):
        ckpt.save_checkpoint(directory, epoch, self._ckpt_state())

    def resume(self, directory, start_epoch):
        """Restore the most recent checkpoint before ``start_epoch``:
        replicated parameters and optimizer state.  Per-sequence carry
        states are checkpointed for inspection only — like the reference's
        ``init_epoch`` (train.py:195-196), every epoch restarts each
        trajectory from the dataset's init states, so the restored carries
        are never consumed by training."""
        step = ckpt.latest_checkpoint_step(directory, start_epoch)
        if step is None:
            return None
        template = self._ckpt_state()
        stored = ckpt.checkpoint_top_keys(directory, step)
        if stored is not None:
            template = {k: v for k, v in template.items() if k in stored}
            if "dn_params" in stored and "dn_params" not in template:
                # The checkpoint carries a denoiser this trainer was
                # constructed without; widen the restore template (the
                # denoiser architecture is fixed, so a fresh init provides
                # the pytree structure) instead of silently dropping it.
                from islam_tpu.imu import denoiser as dn
                tpl_dn = jax.tree_util.tree_map(
                    np.asarray, dn.init_params(jax.random.PRNGKey(0)))
                template["dn_params"] = tpl_dn
                if "imu_opt_state" in stored:
                    import optax
                    template["imu_opt_state"] = jax.tree_util.tree_map(
                        np.asarray, optax.adam(self._imu_lr).init(tpl_dn))
        state = ckpt.restore_checkpoint(directory, step, template)
        self.vo_variables = replicate(self.mesh, state["vo_variables"])
        if state.get("opt_state") is not None:
            self.opt_state = jax.tree_util.tree_map(
                jnp.asarray, state["opt_state"])
        if state.get("dn_params") is not None:
            self.dn_params = replicate(self.mesh, state["dn_params"])
            if not hasattr(self, "imu_opt"):
                # The checkpoint carries a denoiser this trainer was
                # constructed without: build the IMU optimizer now so the
                # next IMU epoch can update (round-4 advisor — previously
                # the dn_params-is-None guard passed and the epoch crashed
                # at self.imu_opt.update with AttributeError).
                import optax
                self.imu_opt = optax.adam(self._imu_lr)
                self.imu_opt_state = self.imu_opt.init(state["dn_params"])
        if state.get("imu_opt_state") is not None:
            self.imu_opt_state = jax.tree_util.tree_map(
                jnp.asarray, state["imu_opt_state"])
        if state.get("seq_states") is not None:
            self._init_states = [
                {k: np.asarray(v) for k, v in st.items()}
                for st in state["seq_states"]]
        return step
