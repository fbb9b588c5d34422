"""Imperative bi-level training driver.

Rebuild of the reference orchestrator (train.py:28-311) around ONE jitted
XLA program per training step: VO forward -> IMU preintegration scan -> PVGO
LM solve -> upper-level loss -> parameter gradients, with no host round-trips
inside the step (the north-star requirement, SURVEY.md section 7.7).

Reference semantics preserved:
- epoch schedule [''] + ['vo', 'imu'] * 100 alternating targets (train.py:151)
- gradient ACCUMULATION across all windows of an epoch, ONE optimizer step
  per epoch (train.py:172-179)
- VO forward replayed from the previous epoch's cached motions during IMU
  epochs (train.py:204-215)
- sequential state carry: each window's init state is the previous window's
  PVGO tail (train.py:296-299), quaternion renormalized
- trajectory snapshots + per-epoch checkpoints
"""

from __future__ import annotations

import functools
import os
import time
from os import makedirs
from os.path import isdir

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu import lie
from islam_tpu.imu.module import IMUModule, integrate_window
from islam_tpu.imu.preintegrator import IMUState
from islam_tpu.models import tartanvo as tvo
from islam_tpu.pvgo.run import run_pvgo
from islam_tpu.utils.timer import Timer
from islam_tpu.utils import checkpoints as ckpt


# ---------------------------------------------------------------------------
# Jitted train step
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("target", "datatype", "correct_scale", "use_kitti_coord",
                     "denoise_accel", "denoise_gyro", "loss_weight",
                     "rot_w", "trans_w", "bf16", "use_reproj",
                     "concat_free", "bilevel", "frozen_bn_eval"))
def train_step(vo_variables, dn_params, batch, imu_win, init_state,
               rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
               target="vo", datatype="kitti", correct_scale=False,
               use_kitti_coord=True, denoise_accel=True, denoise_gyro=True,
               loss_weight=(1., 1., 1., 1.), rot_w=1.0, trans_w=1.0,
               prev_motions=None, bf16=False, use_reproj=False,
               concat_free=False, bilevel="detached", frozen_bn_eval=False):
    """One imperative step over a window of B frame-pairs.

    batch: dict of device arrays (img0, img1, img0_norm, img0_r_norm,
        intrinsic, intrinsic_calib, extrinsic, links, dts, motion?).
    imu_win: (dts, gyros, accels, n_valid, frame_ends, has_frame) padded
        window inputs from IMUModule.window_inputs.
    init_state: IMUState world init for this window.
    prev_motions: (B, 7) cached motions for replay epochs (target != 'vo').
    bilevel: 'detached' (reference semantics, pvgo.py:146-168) or
        'implicit'/'unrolled' — upper-level gradients flow THROUGH the LM
        solve (IFT / unrolled iterations, the north-star alternatives).

    Returns (loss, grads, aux) where grads matches the trainable pytree of
    the target ('vo' -> flowPoseNet params, 'imu' -> denoiser params).
    """
    links = batch["links"]
    dts = batch["dts"]

    def compute(trainable):
        if target == "vo":
            variables = _merge_pose_params(vo_variables, trainable)
            dn = dn_params
        elif target == "imu":
            variables = vo_variables
            dn = trainable
        else:  # inference (epoch-0 '' target): nothing is trainable
            variables = vo_variables
            dn = dn_params

        # ----- VO forward (skipped and replayed during IMU epochs,
        # train.py:204-215) -----
        reproj = None
        if target == "vo" or prev_motions is None:
            baseline = jnp.linalg.norm(batch["extrinsic"][:, :3], axis=1)
            res = tvo.forward(
                variables, batch["img0"], batch["img1"], batch["img0_norm"],
                batch["img0_r_norm"], batch["intrinsic"],
                batch["intrinsic_calib"], baseline,
                gt_motion=batch.get("motion"),
                frames=batch.get("frames"),
                datatype=datatype, correct_scale=correct_scale,
                use_kitti_coord=use_kitti_coord, is_train=True,
                has_given_scale=False, has_precalc_flow=False, bf16=bf16,
                concat_free=concat_free, frozen_bn_eval=frozen_bn_eval)
            motions = res["motion"]
            # camera -> IMU frame conjugation (train.py:214-215)
            T_IL = rgb2imu_pose
            motions = lie.se3_mul(
                T_IL[None], lie.se3_mul(motions, lie.se3_inv(T_IL)[None]))
            # ----- optional 5th PVGO factor (live here; the reference
            # parses --reproj-points but never wires it) -----
            if use_reproj and not correct_scale:
                from islam_tpu.ops.dense_ba import DenseReprojectionLoss
                k = res["intrinsic"]
                reproj = DenseReprojectionLoss(
                    res["depth"], jnp.moveaxis(res["flow"], -1, 1),
                    k[0], k[1], k[2], k[3],
                    jnp.logical_and(res["mask"], res["depth_mask"]),
                    rgb2imu_pose)
        else:
            motions = prev_motions

        # ----- IMU preintegration (both modes from one scan) -----
        win_dts, win_gyros, win_accels, n_valid, frame_ends, has_frame = imu_win
        imu = integrate_window(
            dn, win_dts, win_gyros, win_accels, n_valid, frame_ends,
            has_frame, init_state, gravity, accel_bias, gyro_bias,
            subtract_bias,
            denoise_accel=denoise_accel, denoise_gyro=denoise_gyro)

        imu_poses = jnp.concatenate([imu["pos"], imu["rot"]], axis=1)
        imu_vels = imu["vel"]

        # ----- PVGO -----
        trans_loss, rot_loss, pgo_poses, pgo_vels, _ = run_pvgo(
            imu_poses, imu_vels, motions, links, dts,
            imu["drot"], imu["dpos"], imu["dvel"],
            radius=1e4, loss_weight=loss_weight, reproj=reproj,
            target=target, bilevel=bilevel)

        loss = jnp.sum(rot_w * rot_loss) + jnp.sum(trans_w * trans_loss)
        # Next-window init state computed IN-JIT (quaternion renorm,
        # train.py:296-299) so the host can chain windows without any
        # device->host round trip on the critical path.
        tail_q = pgo_poses[-1, 3:]
        carry = IMUState(
            pos=pgo_poses[-1, :3],
            rot=tail_q / jnp.linalg.norm(tail_q),
            vel=pgo_vels[-1])
        aux = {
            "motions": jax.lax.stop_gradient(motions),
            "imu_poses": imu_poses, "imu_vels": imu_vels,
            "pgo_poses": pgo_poses, "pgo_vels": pgo_vels,
            "trans_loss": jnp.sum(trans_loss), "rot_loss": jnp.sum(rot_loss),
            "carry": carry,
        }
        return loss, aux

    if target == "vo":
        trainable = _get_pose_params(vo_variables)
    elif target == "imu":
        trainable = dn_params
    else:
        loss, aux = compute(_get_pose_params(vo_variables))
        return loss, None, _guard_nonfinite(loss, None, aux, init_state)[1]

    (loss, aux), grads = jax.value_and_grad(
        compute, has_aux=True)(trainable)
    grads, aux = _guard_nonfinite(loss, grads, aux, init_state)
    return loss, grads, aux


def _guard_nonfinite(loss, grads, aux, init_state):
    """In-jit bad-window containment (beyond the reference, which would let
    one nonfinite window poison the epoch's accumulated gradient AND every
    downstream state carry, train.py:172-179,296-299): if the loss or any
    gradient is nonfinite, the window's gradients are zeroed and the carry
    falls back to the window's init state.  ``aux['ok']`` reports it."""
    ok = jnp.isfinite(loss)
    if grads is not None:
        for g in jax.tree_util.tree_leaves(grads):
            ok = ok & jnp.all(jnp.isfinite(g))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    aux = dict(aux)
    aux["carry"] = jax.tree_util.tree_map(
        lambda c, i: jnp.where(ok, c, i), aux["carry"], init_state)
    aux["ok"] = ok
    return grads, aux


def _get_pose_params(variables):
    return variables["params"]["flowPoseNet"]


def _merge_pose_params(variables, pose_params):
    params = dict(variables["params"])
    params["flowPoseNet"] = pose_params
    out = dict(variables)
    out["params"] = params
    return out


@functools.partial(
    jax.jit,
    static_argnames=("target", "datatype", "correct_scale", "use_kitti_coord",
                     "denoise_accel", "denoise_gyro", "loss_weight",
                     "rot_w", "trans_w", "bf16", "use_reproj",
                     "concat_free", "bilevel", "frozen_bn_eval"))
def train_scan(vo_variables, dn_params, batches, imu_wins, init_state,
               rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
               target="vo", datatype="kitti", correct_scale=False,
               use_kitti_coord=True, denoise_accel=True, denoise_gyro=True,
               loss_weight=(1., 1., 1., 1.), rot_w=1.0, trans_w=1.0,
               prev_motions=None, bf16=False, use_reproj=False,
               concat_free=False, bilevel="detached", frozen_bn_eval=False):
    """Fully-jitted chunk of K sequential windows (docs/TODO.md item 4).

    ``batches``/``imu_wins``/``prev_motions`` carry a leading (K, ...) window
    axis; the scan threads the PVGO-tail state and accumulates gradients
    on device, so an entire chunk is ONE XLA program with zero host
    involvement between windows (the reference's host loop, train.py:162-299,
    disappears entirely for the chunk).

    Returns (losses (K,), grads summed over windows, aux stacked (K, ...)).
    """
    if target not in ("vo", "imu"):
        # The scan body accumulates grads with tree_map(add, ...), which
        # requires a trainable target; inference epochs must use the
        # per-window train_step (both trainers guard this — the check here
        # makes the contract the function's own, not caller convention).
        raise ValueError(
            f"train_scan requires target 'vo' or 'imu', got {target!r}; "
            "use train_step for inference epochs")
    trainable = (_get_pose_params(vo_variables) if target == "vo"
                 else dn_params)
    gacc0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)

    def body(carry, xs):
        init, gacc = carry
        batch, win, prev = xs
        loss, grads, aux = train_step(
            vo_variables, dn_params, batch, win, init,
            rgb2imu_pose, gravity, accel_bias, gyro_bias, subtract_bias,
            target=target, datatype=datatype, correct_scale=correct_scale,
            use_kitti_coord=use_kitti_coord, denoise_accel=denoise_accel,
            denoise_gyro=denoise_gyro, loss_weight=loss_weight,
            rot_w=rot_w, trans_w=trans_w, prev_motions=prev, bf16=bf16,
            use_reproj=use_reproj, concat_free=concat_free, bilevel=bilevel,
            frozen_bn_eval=frozen_bn_eval)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
        out_aux = {k: aux[k] for k in ("motions", "imu_poses", "imu_vels",
                                       "pgo_poses", "pgo_vels", "ok")}
        return (aux["carry"], gacc), (loss, out_aux)

    (final_state, grads), (losses, aux) = jax.lax.scan(
        body, (init_state, gacc0), (batches, imu_wins, prev_motions))
    aux["carry"] = final_state
    return losses, grads, aux


# ---------------------------------------------------------------------------
# Host-side trainer
# ---------------------------------------------------------------------------

class Prefetcher:
    """One-deep keyed background prefetch with exception propagation.

    ``start(k)`` computes ``fn(k)`` on a worker thread; ``take(k)`` joins and
    returns the result — or re-raises with the worker's traceback chained, so
    a failing loader surfaces its real error instead of dying silently and
    crashing the consumer later with an unrelated KeyError.
    """

    def __init__(self, fn):
        self._fn = fn
        self._slots = {}
        self._threads = {}

    def start(self, key):
        import threading

        def run():
            try:
                self._slots[key] = (True, self._fn(key))
            except BaseException as e:  # noqa: BLE001 - re-raised in take()
                self._slots[key] = (False, e)

        t = threading.Thread(target=run, daemon=True)
        self._threads[key] = t
        t.start()

    def pending(self, key) -> bool:
        return key in self._threads

    def take(self, key):
        self._threads.pop(key).join()
        ok, value = self._slots.pop(key)
        if not ok:
            raise RuntimeError(f"prefetch of item {key} failed") from value
        return value


class Trainer:
    """Owns dataset iteration, state carry, grad accumulation, snapshots."""

    def __init__(self, args, dataset):
        import optax

        self.args = args
        self.dataset = dataset
        self.timer = Timer()

        # ----- VO model -----
        peek = dataset[0]
        h, w = peek["img0"].shape[0], peek["img0"].shape[1]
        self.vo_variables = tvo.init_params(jax.random.PRNGKey(0), h, w)
        if args.vo_model_name:
            sd = ckpt.load_torch_state_dict(args.vo_model_name)
            self.vo_variables = ckpt.import_torch_weights(self.vo_variables, sd)
        if args.pose_model_name:
            sd = ckpt.load_torch_state_dict(args.pose_model_name)
            self.vo_variables = ckpt.import_torch_weights(self.vo_variables, sd)

        opt = {
            "adam": optax.adam, "rmsprop": optax.rmsprop, "sgd": optax.sgd,
        }[args.vo_optimizer]
        base_opt = opt(args.lr)
        # fix_parts freezing (VONet.py:20-26 / VOFlowNet.py:95-102): flow and
        # stereo are frozen structurally (only the pose head is optimized,
        # mirroring train.py:116); pose-head sub-parts freeze via masking.
        fix_parts = tuple(getattr(args, "fix_model_parts", ()) or ())
        # Eval-mode BN for the frozen StereoNet (--frozen-bn-eval): the
        # per-channel running-average affine fuses into the conv epilogue,
        # removing the batch-statistics reductions (docs/PARITY.md
        # deviation note).  Only applies when stereo is actually frozen —
        # training stereo with frozen BN would silently stop updating its
        # statistics.
        self.frozen_bn_eval = bool(
            getattr(args, "frozen_bn_eval", False) and "stereo" in fix_parts)
        pose_fix = {"feat": "feat_net", "rot": "rot_", "trans": "trans_"}
        frozen_prefixes = [pose_fix[p] for p in fix_parts if p in pose_fix]
        if frozen_prefixes:
            def trainable_mask(params):
                def mask_one(path, leaf):
                    top = path[0].key if hasattr(path[0], "key") else str(path[0])
                    return not any(top.startswith(p) for p in frozen_prefixes)
                return jax.tree_util.tree_map_with_path(mask_one, params)

            self.vo_opt = optax.masked(
                base_opt, trainable_mask(_get_pose_params(self.vo_variables)))
        else:
            self.vo_opt = base_opt
        self.vo_opt_state = self.vo_opt.init(
            _get_pose_params(self.vo_variables))

        # ----- IMU module -----
        dn_params = None
        if args.imu_denoise_model_name:
            from islam_tpu.imu import denoiser as dn
            dn_params = dn.init_params(jax.random.PRNGKey(1))
            sd = ckpt.load_torch_state_dict(args.imu_denoise_model_name)
            dn_params = _import_denoiser(dn_params, sd)
        self.dn_params = dn_params

        self.imu_module = IMUModule(
            dataset.accels, dataset.gyros, dataset.imu_dts,
            dataset.accel_bias, dataset.gyro_bias,
            init=dataset.imu_init, gravity=dataset.gravity,
            rgb2imu_sync=dataset.rgb2imu_sync,
            denoise_params=dn_params, denoise_accel=True,
            denoise_gyro=(dataset.datatype != "kitti"),
            batch_frames=args.batch_size)

        if dn_params is not None:
            # --imu-lr, default 3e-5 = the reference's hard-coded denoiser
            # lr (train.py:142; it never reads its own flag).
            self.imu_opt = optax.adam(getattr(args, "imu_lr", 3e-5))
            self.imu_opt_state = self.imu_opt.init(dn_params)

        self.rgb2imu_pose = jnp.asarray(np.asarray(dataset.rgb2imu_pose),
                                        jnp.float32)
        self.train_target = [""] + ["vo", "imu"] * 100
        self.prev_vo_motions = None
        self.profile_dir = getattr(args, "profile_dir", "")
        self._profiled = False

    # ---- batch prep ----
    def device_batch(self, sample, current_idx):
        from islam_tpu.testing import device_batch as _db
        return _db(sample, current_idx)

    def run_epoch(self, epoch, snapshot_dir=None, snapshot_interval=None,
                  max_steps=None):
        args = self.args
        target = self.train_target[epoch]
        B = args.batch_size
        n_batches = len(self.dataset) // B
        if max_steps is not None:
            n_batches = min(n_batches, max_steps)

        init_state_np = dict(self.dataset.imu_init)
        grad_accum = None
        traj = _TrajLogs(init_state_np)
        epoch_motions = []
        epoch_losses = []  # per-window upper-level losses, fetched lazily
        bad_windows = [0]  # nonfinite windows contained by _guard_nonfinite

        # Device-resident state carry + deferred bookkeeping: the next
        # window's init state is computed in-jit (aux["carry"]), so the host
        # never blocks on step k before dispatching step k+1; trajectory
        # logging fetches are batched at snapshot/epoch boundaries (the bench
        # pipelining pattern, docs/TODO.md item 7).
        init_state = IMUState(
            pos=jnp.asarray(init_state_np["pos"], jnp.float32),
            rot=jnp.asarray(init_state_np["rot"], jnp.float32),
            vel=jnp.asarray(init_state_np["vel"], jnp.float32))
        pending = []

        def flush():
            for a in pending:
                m = np.asarray(a["motions"])
                pg = np.asarray(a["pgo_poses"])
                pv = np.asarray(a["pgo_vels"])
                ip = np.asarray(a["imu_poses"])
                if "ok" in a:
                    bad_windows[0] += int(
                        (~np.asarray(a["ok"]).reshape(-1)).sum())
                if m.ndim == 2:  # single window; scanned chunks are (K, ...)
                    m, pg, pv, ip = m[None], pg[None], pv[None], ip[None]
                for k in range(m.shape[0]):
                    traj.extend(m[k], pg[k], pv[k], ip[k])
                    epoch_motions.append(m[k])
            pending.clear()

        # One-deep host prefetch: window k+1's data prep (decode, transforms,
        # collate, IMU padding, H2D) overlaps window k's device step.  Only
        # the init state depends on the previous window's PVGO tail, and it
        # is tiny -- the reference gets the same overlap from DataLoader
        # workers (train.py:95-96).  Disabled on single-core hosts where the
        # thread merely contends with the main loop (measured 2x slower).
        import os as _os

        use_prefetch = (getattr(args, "worker_num", 1) >= 1
                        and (_os.cpu_count() or 1) > 1)

        def prepare(bi):
            current_idx = bi * B
            sample = self._collate(current_idx, B)
            batch = self.device_batch(sample, current_idx)
            imu_win = self.imu_module.window_inputs(
                current_idx, current_idx + B)
            return batch, imu_win

        prefetcher = Prefetcher(prepare) if use_prefetch else None

        # ---- fully-jitted chunked scan over windows (train_scan) ----
        # K sequential windows become ONE XLA program: state carry and grad
        # accumulation happen inside lax.scan, removing all per-window host
        # work.  Chunk size bounds device memory (K windows of images live
        # in HBM at once).
        scan_chunk = int(getattr(args, "scan_chunk", 0) or 0)
        scanned = scan_chunk > 1 and target in ("vo", "imu")
        bi = 0
        last_snap = [0]
        last_print = [0]
        # Only full-K chunks go through the scan program: a tail chunk with a
        # different static K would compile another full XLA program (~30-60 s
        # on this setup) for every distinct tail length, while the per-window
        # train_step the remainder falls through to compiles once and serves
        # any tail length.
        K = scan_chunk if scanned else 1

        def prepare_chunk(ci):
            items = [prepare(ci * K + k) for k in range(K)]
            return (jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *[it[0] for it in items]),
                    jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *[it[1] for it in items]))

        # Chunk-level prefetch: the NEXT chunk's K windows are loaded and
        # H2D-transferred on a worker thread while the device executes the
        # current scan program (round-4 review item 7 — previously the scan
        # path prepared all K windows synchronously, serializing host prep
        # against the device and losing the overlap the per-window path
        # already had).
        chunk_pf = Prefetcher(prepare_chunk) if use_prefetch else None
        n_chunks = (n_batches // K) if scanned else 0
        while scanned and bi + scan_chunk <= n_batches:
            self.timer.tic("step")
            ci = bi // K
            if chunk_pf is not None and chunk_pf.pending(ci):
                batches, wins = chunk_pf.take(ci)
            else:
                batches, wins = prepare_chunk(ci)
            if chunk_pf is not None and ci + 1 < n_chunks:
                chunk_pf.start(ci + 1)
            prev = None
            if target != "vo" and self.prev_vo_motions is not None:
                prev = jnp.asarray(
                    self.prev_vo_motions[bi * B:(bi + K) * B].reshape(
                        K, B, -1))
            losses, grads, aux = train_scan(
                self.vo_variables, self.dn_params, batches, wins, init_state,
                self.rgb2imu_pose, self.imu_module.gravity,
                self.imu_module.accel_bias, self.imu_module.gyro_bias,
                jnp.asarray(self.imu_module.optm_bias),
                target=target, datatype=self.dataset.datatype,
                correct_scale=args.use_gt_scale,
                use_kitti_coord=(self.dataset.datatype != "tartanair"),
                denoise_accel=True,
                denoise_gyro=(self.dataset.datatype != "kitti"),
                loss_weight=tuple(float(w) for w in args.loss_weight),
                rot_w=args.rot_w, trans_w=args.trans_w,
                prev_motions=prev, bf16=getattr(args, "bf16", False),
                use_reproj=getattr(args, "reproj_points", 0) > 0,
                bilevel=getattr(args, "bilevel", "detached"),
                frozen_bn_eval=self.frozen_bn_eval)
            init_state = aux.pop("carry")
            pending.append(aux)
            epoch_losses.append(losses)  # (K,) device array, fetched lazily
            if grads is not None:
                grad_accum = grads if grad_accum is None else (
                    jax.tree_util.tree_map(jnp.add, grad_accum, grads))
            bi += K
            self.timer.toc("step")
            # bi advances by K, so exact-modulo checks could miss every
            # interval boundary; fire whenever a boundary was crossed.
            if snapshot_dir and (bi <= 10 or (
                    snapshot_interval
                    and bi // snapshot_interval > last_snap[0])):
                last_snap[0] = bi // max(snapshot_interval or 1, 1)
                flush()
                traj.save(snapshot_dir, epoch)
            pint = getattr(self.args, "print_interval", 0)
            if pint and bi // pint > last_print[0]:
                last_print[0] = bi // pint
                print(f"[window {bi}/{n_batches}] target={target} "
                      f"loss={float(jnp.sum(losses)):.6f} "
                      f"chunk={self.timer.last('step'):.3f}s")

        # Per-window loop: everything when not scanned (bi == 0), the
        # tail remainder (n_batches % scan_chunk windows) when scanned.
        for bi in range(bi, n_batches):
            self.timer.tic("step")
            current_idx = bi * B
            if prefetcher is not None and prefetcher.pending(bi):
                batch, imu_win = prefetcher.take(bi)
            else:
                batch, imu_win = prepare(bi)
            if prefetcher is not None and bi + 1 < n_batches:
                prefetcher.start(bi + 1)

            prev = None
            if target != "vo" and self.prev_vo_motions is not None:
                prev = jnp.asarray(
                    self.prev_vo_motions[current_idx:current_idx + B])

            # jax.profiler trace of the second step (first is compile),
            # the TPU analogue of the reference's per-stage Timer prints.
            profiling = (self.profile_dir and bi == 1 and not self._profiled)
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
                self._profiled = True

            loss, grads, aux = train_step(
                self.vo_variables, self.dn_params, batch, imu_win, init_state,
                self.rgb2imu_pose, self.imu_module.gravity,
                self.imu_module.accel_bias, self.imu_module.gyro_bias,
                jnp.asarray(self.imu_module.optm_bias),
                target=target or "none",
                datatype=self.dataset.datatype,
                correct_scale=args.use_gt_scale,
                use_kitti_coord=(self.dataset.datatype != "tartanair"),
                denoise_accel=True,
                denoise_gyro=(self.dataset.datatype != "kitti"),
                loss_weight=tuple(float(w) for w in args.loss_weight),
                rot_w=args.rot_w, trans_w=args.trans_w,
                prev_motions=prev, bf16=getattr(args, "bf16", False),
                use_reproj=getattr(args, "reproj_points", 0) > 0,
                bilevel=getattr(args, "bilevel", "detached"),
                frozen_bn_eval=self.frozen_bn_eval)

            if profiling:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()

            if grads is not None:
                grad_accum = grads if grad_accum is None else jax.tree_util.tree_map(
                    jnp.add, grad_accum, grads)

            # ---- state carry stays on device (train.py:296-299) ----
            init_state = aux["carry"]
            pending.append(aux)
            epoch_losses.append(loss)  # device scalar, fetched lazily
            self.timer.toc("step")

            if snapshot_dir and (bi < 10 or (
                    snapshot_interval and (bi + 1) % snapshot_interval == 0)):
                flush()
                traj.save(snapshot_dir, epoch)

            if getattr(self.args, "print_interval", 0) and (
                    (bi + 1) % self.args.print_interval == 0):
                print(f"[step {bi + 1}/{n_batches}] target={target} "
                      f"loss={float(loss):.6f} "
                      f"step={self.timer.last('step'):.3f}s "
                      f"avg={self.timer.avg('step'):.3f}s")

        flush()
        if bad_windows[0]:
            print(f"WARNING: {bad_windows[0]} window(s) produced nonfinite "
                  "loss/grads this epoch; their gradients were zeroed and "
                  "state carries reset (aux['ok'])")
        # ---- ONE optimizer update per epoch (train.py:172-179) ----
        if grad_accum is not None:
            if target == "vo":
                updates, self.vo_opt_state = self.vo_opt.update(
                    grad_accum, self.vo_opt_state,
                    _get_pose_params(self.vo_variables))
                import optax
                new_pose = optax.apply_updates(
                    _get_pose_params(self.vo_variables), updates)
                self.vo_variables = _merge_pose_params(
                    self.vo_variables, new_pose)
            elif target == "imu" and self.dn_params is not None:
                import optax
                updates, self.imu_opt_state = self.imu_opt.update(
                    grad_accum, self.imu_opt_state, self.dn_params)
                self.dn_params = optax.apply_updates(self.dn_params, updates)
                self.imu_module.denoise_params = self.dn_params

        self.prev_vo_motions = np.concatenate(epoch_motions, axis=0)
        # Per-window upper-level losses of this epoch (test/diagnostic
        # surface: the imperative-improvement tests assert these decrease).
        self.last_epoch_losses = [
            float(x) for l in epoch_losses
            for x in np.atleast_1d(np.asarray(l))]
        if snapshot_dir:
            traj.save(snapshot_dir, epoch)
        return traj

    def _collate(self, start, B):
        from islam_tpu.data.dataset import collate
        return collate([self.dataset[i] for i in range(start, start + B)])

    def _ckpt_state(self):
        """Checkpoint pytree: params AND optimizer states (beyond the
        reference, whose state_dict-only saves lose the Adam moments on
        --start-epoch resume, train.py:181-189)."""
        state = {"vo_variables": self.vo_variables,
                 "vo_opt_state": self.vo_opt_state}
        if self.dn_params is not None:
            state["dn_params"] = self.dn_params
            state["imu_opt_state"] = self.imu_opt_state
        return state

    def save_models(self, directory, epoch):
        ckpt.save_checkpoint(directory, epoch, self._ckpt_state())

    def resume(self, directory, start_epoch):
        """Scan {dir}/{k} for k < start_epoch and restore the most recent
        checkpoint (the reference's resume scan, train.py:102-107,124-129).
        Optimizer states restore too when present; params-only checkpoints
        (older saves, imported weights) still load."""
        step = ckpt.latest_checkpoint_step(directory, start_epoch)
        if step is None:
            return None
        # Pick the restore template from what the checkpoint actually
        # contains (params-only saves lack the opt-state keys) instead of
        # falling back on ANY restore error -- a blanket except here used to
        # mask genuine corruption as a silent opt-state drop.
        template = self._ckpt_state()
        stored = ckpt.checkpoint_top_keys(directory, step)
        if stored is not None:
            dropped = sorted(set(template) - stored)
            template = {k: v for k, v in template.items() if k in stored}
            if dropped:
                print(f"Checkpoint {directory}/{step} has no {dropped}; "
                      "restoring without them (fresh optimizer state)")
            if "dn_params" in stored and "dn_params" not in template:
                # Checkpoint carries a denoiser this trainer lacks: widen
                # the template (fixed architecture -> fresh init provides
                # the structure) rather than silently dropping it.
                from islam_tpu.imu import denoiser as dn
                tpl_dn = dn.init_params(jax.random.PRNGKey(0))
                template["dn_params"] = tpl_dn
                if "imu_opt_state" in stored:
                    import optax
                    template["imu_opt_state"] = optax.adam(
                        getattr(self.args, "imu_lr", 3e-5)).init(tpl_dn)
        state = ckpt.restore_checkpoint(directory, step, template)
        self.vo_variables = state["vo_variables"]
        if state.get("vo_opt_state") is not None:
            self.vo_opt_state = state["vo_opt_state"]
        if state.get("dn_params") is not None:
            self.dn_params = state["dn_params"]
            self.imu_module.denoise_params = self.dn_params
            if not hasattr(self, "imu_opt"):
                import optax
                self.imu_opt = optax.adam(getattr(self.args, "imu_lr", 3e-5))
                self.imu_opt_state = self.imu_opt.init(self.dn_params)
        if state.get("imu_opt_state") is not None:
            self.imu_opt_state = state["imu_opt_state"]
        print(f"Resumed from {directory}/{step}")
        return step


def _import_denoiser(params, sd):
    out = {
        "conv1": {"weight": jnp.asarray(sd["conv1.weight"]),
                  "bias": jnp.asarray(sd["conv1.bias"])},
        "gru": {k: jnp.asarray(sd[f"gru.{k}"])
                for k in ("weight_ih_l0", "weight_hh_l0",
                          "bias_ih_l0", "bias_hh_l0")},
        "decoder": {
            "0": {"weight": jnp.asarray(sd["pose_decoder.0.weight"]),
                  "bias": jnp.asarray(sd["pose_decoder.0.bias"])},
            "2": {"weight": jnp.asarray(sd["pose_decoder.2.weight"]),
                  "bias": jnp.asarray(sd["pose_decoder.2.bias"])},
        },
    }
    return out


class _TrajLogs:
    """Trajectory recording + np.savetxt snapshots (train.py:51-61)."""

    def __init__(self, init_state):
        init_pose = np.concatenate([init_state["pos"], init_state["rot"]])
        self.vo_motions = []
        self.vo_poses = [init_pose]
        self.pgo_motions = []
        self.pgo_poses = [init_pose]
        self.pgo_vels = [np.asarray(init_state["vel"])]
        self.imu_poses = [init_pose]
        self.imu_motions = []

    def extend(self, motions, pgo_poses, pgo_vels, imu_poses):
        from scipy.spatial.transform import Rotation as R

        self.vo_motions.extend(motions)
        # chain VO poses from last
        T = _se3_np(self.vo_poses[-1])
        for m in motions:
            T = T @ _se3_np(m)
            self.vo_poses.append(_se3_flat(T))
        for i in range(1, len(pgo_poses)):
            self.pgo_poses.append(pgo_poses[i])
            self.pgo_vels.append(pgo_vels[i])
            self.pgo_motions.append(_se3_flat(
                np.linalg.inv(_se3_np(pgo_poses[i - 1])) @ _se3_np(pgo_poses[i])))
        for i in range(1, len(imu_poses)):
            self.imu_poses.append(imu_poses[i])
            self.imu_motions.append(_se3_flat(
                np.linalg.inv(_se3_np(imu_poses[i - 1])) @ _se3_np(imu_poses[i])))

    def save(self, trainroot, epoch):
        d = f"{trainroot}/{epoch}"
        if not isdir(d):
            makedirs(d)
        np.savetxt(f"{d}/vo_pose.txt", np.stack(self.vo_poses))
        np.savetxt(f"{d}/pgo_pose.txt", np.stack(self.pgo_poses))
        np.savetxt(f"{d}/pgo_vel.txt", np.stack(self.pgo_vels))
        np.savetxt(f"{d}/imu_pose.txt", np.stack(self.imu_poses))
        if self.vo_motions:
            np.savetxt(f"{d}/vo_motion.txt", np.stack(self.vo_motions))
        if self.pgo_motions:
            np.savetxt(f"{d}/pgo_motion.txt", np.stack(self.pgo_motions))
        if self.imu_motions:
            np.savetxt(f"{d}/imu_motion.txt", np.stack(self.imu_motions))


def _se3_np(p):
    from scipy.spatial.transform import Rotation as R

    T = np.eye(4)
    T[:3, :3] = R.from_quat(np.asarray(p[3:])).as_matrix()
    T[:3, 3] = np.asarray(p[:3])
    return T


def _se3_flat(T):
    from scipy.spatial.transform import Rotation as R

    q = R.from_matrix(T[:3, :3]).as_quat()
    return np.concatenate([T[:3, 3], q]).astype(np.float32)


def main(argv=None):
    from islam_tpu.arguments import get_args
    from islam_tpu.data.dataset import TrajFolderDataset
    from islam_tpu.data.synthetic import SyntheticTrajDataset
    from islam_tpu.data.transforms import (Compose, CropCenter, DownscaleFlow,
                                           Normalize, ToNHWCTensor)

    args = get_args(argv)
    print(args)

    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    transform = Compose([
        CropCenter((args.image_height, args.image_width), fix_ratio=True),
        DownscaleFlow(),
        Normalize(mean=mean, std=std, keep_old=True),
        ToNHWCTensor(),
    ])

    if args.data_type == "synthetic":
        dataset = SyntheticTrajDataset(
            num_frames=args.synthetic_frames, height=args.image_height,
            width=args.image_width, transform=transform)
    else:
        dataset = TrajFolderDataset(
            datadir=args.data_root, datatype=args.data_type,
            transform=transform, start_frame=args.start_frame,
            end_frame=args.end_frame)

    trainer = Trainer(args, dataset)
    if args.start_epoch > 1 and args.save_model_dir:
        trainer.resume(args.save_model_dir, args.start_epoch)

    trainroot = args.result_dir or "."
    if args.result_dir:
        os.makedirs(trainroot, exist_ok=True)
        with open(trainroot + "/args.txt", "w") as f:
            f.write(str(args))
        np.savetxt(trainroot + "/gt_pose.txt", dataset.poses)
        np.savetxt(trainroot + "/timestamp.txt", dataset.rgb_ts, fmt="%.3f")

    if getattr(args, "eval_only", False):
        # Inference: epoch 0 has target '' (train_target schedule,
        # train.py:151) -- full VO forward + IMU + PVGO fusion per window,
        # no gradients, no parameter updates.
        t0 = time.time()
        trainer.run_epoch(0, snapshot_dir=args.result_dir or None,
                          snapshot_interval=args.snapshot_interval)
        print(f"eval-only pass time={time.time() - t0:.1f}s "
              f"(snapshots under {trainroot}/0)")
        return

    for epoch in range(args.start_epoch, args.train_epoch + 1):
        t0 = time.time()
        trainer.run_epoch(epoch, snapshot_dir=args.result_dir or None,
                          snapshot_interval=args.snapshot_interval)
        if args.save_model_dir:
            trainer.save_models(args.save_model_dir, epoch)
        print(f"epoch {epoch} target={trainer.train_target[epoch]} "
              f"time={time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
