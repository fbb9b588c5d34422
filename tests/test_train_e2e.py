"""End-to-end bi-level training tests on tiny synthetic trajectories."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islam_tpu import testing
from islam_tpu.imu import denoiser as dn
from islam_tpu.models import tartanvo as tvo
from islam_tpu.train import Trainer, train_step

H, W, B = 64, 128, 2


@pytest.fixture(scope="module")
def tiny():
    ds = testing.make_dataset(num_frames=2 * B + 1, height=H, width=W)
    imu = testing.make_imu_module(ds, batch_frames=B)
    variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
    dn_params = dn.init_params(jax.random.PRNGKey(1))
    return ds, imu, variables, dn_params


def _step(tiny, target, dn_params=None):
    ds, imu, variables, dn_p = tiny
    batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
    return train_step(
        variables, dn_params if dn_params is not None else dn_p,
        batch, win, init,
        jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
        imu.gravity, imu.accel_bias, imu.gyro_bias, jnp.asarray(False),
        target=target, datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=(1.0, 0.1, 10.0, 0.1), rot_w=1.0, trans_w=0.1)


class TestTrainStep:
    def test_vo_target(self, tiny):
        loss, grads, aux = _step(tiny, "vo")
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert leaves
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert np.isfinite(total) and total > 0
        assert aux["motions"].shape == (B, 7)
        assert aux["pgo_poses"].shape == (B + 1, 7)

    def test_imu_target(self, tiny):
        loss, grads, aux = _step(tiny, "imu")
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert np.isfinite(total) and total > 0

    def test_vo_target_with_reproj_factor(self, tiny):
        """--reproj-points wiring: the dense reprojection 5th factor is
        built in-jit from the VO forward's depth/flow and the step stays
        finite.  (On this synthetic input the scale-recovery masks are
        empty -- an untrained stereo net yields sub-threshold disparity --
        so the factor's numeric no-op-ness is expected; its influence on
        the solve is covered at the PVGO level in
        tests/test_variants.py::TestReprojFactor.)"""
        ds, imu, variables, dn_p = tiny
        batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
        args = (jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
                imu.gravity, imu.accel_bias, imu.gyro_bias,
                jnp.asarray(False))
        common = dict(
            target="vo", datatype="kitti", correct_scale=False,
            use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
            rot_w=1.0, trans_w=0.1)
        loss_r, grads_r, aux_r = train_step(
            variables, dn_p, batch, win, init, *args,
            loss_weight=(1.0, 0.1, 10.0, 0.1, 5.0), use_reproj=True,
            **common)
        assert np.isfinite(float(loss_r)) and bool(aux_r["ok"])
        total = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads_r))
        assert np.isfinite(total) and total > 0

    def test_none_target_inference(self, tiny):
        """Epoch-0 '' target (--eval-only): forward + PVGO only, no grads.
        Regression test: this path once routed pose params into the
        denoiser slot."""
        loss, grads, aux = _step(tiny, "none")
        assert grads is None
        assert np.isfinite(float(loss))
        assert bool(aux["ok"])
        assert np.isfinite(np.asarray(aux["pgo_poses"])).all()

    def test_outputs_consistent_chain(self, tiny):
        _, _, aux = _step(tiny, "vo")
        pgo = np.asarray(aux["pgo_poses"])
        # first pose anchored to the window init (run_pvgo align_to)
        imu_poses = np.asarray(aux["imu_poses"])
        np.testing.assert_allclose(pgo[0], imu_poses[0], atol=1e-5)


class TestTrainerEpochs:
    def test_two_epochs_vo_then_imu(self, tiny, tmp_path):
        ds, _, _, dn_params = tiny

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        trainer = Trainer(Args(), ds)
        trainer.dn_params = dn_params
        trainer.imu_module.denoise_params = dn_params
        import optax
        trainer.imu_opt = optax.adam(3e-5)
        trainer.imu_opt_state = trainer.imu_opt.init(dn_params)

        pose_before = jax.tree_util.tree_leaves(
            trainer.vo_variables["params"]["flowPoseNet"])[0].copy()

        traj = trainer.run_epoch(1, snapshot_dir=str(tmp_path))  # 'vo'
        assert trainer.prev_vo_motions is not None
        assert trainer.prev_vo_motions.shape[0] == len(ds) // B * B

        pose_after = jax.tree_util.tree_leaves(
            trainer.vo_variables["params"]["flowPoseNet"])[0]
        assert float(jnp.sum(jnp.abs(pose_after - pose_before))) > 0

        dn_before = jax.tree_util.tree_leaves(trainer.dn_params)[0].copy()
        trainer.run_epoch(2, snapshot_dir=str(tmp_path))  # 'imu' (replay VO)
        dn_after = jax.tree_util.tree_leaves(trainer.dn_params)[0]
        assert float(jnp.sum(jnp.abs(dn_after - dn_before))) > 0

        # snapshot files written (train.py:51-61 equivalents)
        for f in ("vo_pose.txt", "pgo_pose.txt", "pgo_vel.txt",
                  "imu_pose.txt", "vo_motion.txt", "pgo_motion.txt"):
            assert (tmp_path / "1" / f).exists(), f
        poses = np.loadtxt(tmp_path / "1" / "pgo_pose.txt")
        assert poses.shape[1] == 7 and np.isfinite(poses).all()


class TestImperativeImprovement:
    """The system's headline claim (ref README.md:15,33): the bi-level loop
    REDUCES trajectory error over epochs, not merely moves parameters
    (round-4 review item 3).

    Setup notes (measured on this box): with free-scale random nets the
    POSE_STD-scaled pose head outputs near-zero translations and the loop
    settles into a degenerate self-consistent equilibrium (loss -> 0, ATE
    frozen) — the reference's improvement claim presupposes a sane VO
    starting point.  --use-gt-scale gives translations the right magnitude
    (one of the reference's own operating modes, TartanVO.py:118-127), and
    then the IMU-pinned rotations (weight 10) give the upper loss a real
    signal: measured ATE_pgo 0.0173 -> 0.0052 and loss 0.0057 -> 5e-5 over
    8 epochs at lr 5e-4."""

    N_EPOCHS = 4

    @pytest.mark.parametrize("bilevel", ["detached", "implicit"])
    def test_vo_epochs_reduce_ate_and_loss(self, bilevel):
        from islam_tpu.utils.evaluation import ate_rmse

        ds = testing.make_dataset(num_frames=4 * B + 1, height=H, width=W,
                                  seed=5)

        class Args:
            batch_size = B
            lr = 5e-4
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = True

        Args.bilevel = bilevel
        trainer = Trainer(Args(), ds)
        gt = np.asarray(ds.poses)
        ates, losses = [], []
        for e in range(1, self.N_EPOCHS + 1):
            traj = trainer.run_epoch(2 * e - 1)  # 'vo' target each epoch
            pgo = np.stack(traj.pgo_poses)
            ates.append(ate_rmse(pgo, gt[:len(pgo)]))
            losses.append(sum(trainer.last_epoch_losses))

        # material improvement, not noise: the best of the last two epochs
        # must beat epoch 1 by >30% on ATE and >80% on epoch loss
        # (measured margins are ~65% / ~95%)
        assert min(ates[-2:]) < 0.7 * ates[0], (bilevel, ates)
        assert min(losses[-2:]) < 0.2 * losses[0], (bilevel, losses)

    def test_alternating_schedule_improves_fused_trajectory(self):
        """The PRODUCTION alternating schedule (vo, imu, vo, imu, ... —
        reference train.py:151) with BOTH imperfections at once: random
        nets (gt-scale mode) AND a constant accel bias.  The fused PGO
        trajectory must improve materially over the first vo epoch
        (measured: ate_pgo 0.0173 -> 0.0041..0.0063 across epochs 5-8)."""
        from islam_tpu.imu import denoiser as dnet
        from islam_tpu.utils.evaluation import ate_rmse

        ds = testing.make_dataset(num_frames=4 * B + 1, height=H, width=W,
                                  seed=5)
        rng = np.random.default_rng(1)
        ds.accels = (ds.accels + np.array([0.6, -0.4, 0.3], np.float32)
                     + 0.05 * rng.standard_normal(ds.accels.shape)
                     ).astype(np.float32)

        class Args:
            batch_size = B
            lr = 5e-4
            imu_lr = 1e-3
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = True

        import optax
        trainer = Trainer(Args(), ds)
        trainer.dn_params = dnet.init_params(jax.random.PRNGKey(3))
        trainer.imu_module.denoise_params = trainer.dn_params
        trainer.imu_opt = optax.adam(Args.imu_lr)
        trainer.imu_opt_state = trainer.imu_opt.init(trainer.dn_params)

        gt = np.asarray(ds.poses)
        ates = []
        for e in range(1, 7):
            traj = trainer.run_epoch(e)  # '', vo, imu alternation by index
            pgo = np.stack(traj.pgo_poses)
            ates.append(ate_rmse(pgo, gt[:len(pgo)]))
        # epochs 5/6 (third vo pass + its replay) vs epoch 1
        assert min(ates[-2:]) < 0.6 * ates[0], ates

    def test_imu_epochs_denoiser_removes_injected_bias(self):
        """The IMU half of the imperative claim: with a constant accel
        bias injected into the synthetic IMU (zero-mean 100 Hz noise
        integrates away; a bias compounds), IMU-target epochs against
        replayed GT VO motions teach the denoiser to remove it — the RAW
        IMU trajectory's ATE and the epoch loss both drop monotonically
        (measured over 10 epochs at imu_lr 1e-3: ate_imu 0.0101 ->
        0.0065, loss -67%)."""
        from scipy.spatial.transform import Rotation as R

        from islam_tpu.imu import denoiser as dnet
        from islam_tpu.utils.evaluation import ate_rmse

        ds = testing.make_dataset(num_frames=4 * B + 1, height=H, width=W,
                                  seed=9)
        rng = np.random.default_rng(1)
        ds.accels = (ds.accels + np.array([0.6, -0.4, 0.3], np.float32)
                     + 0.05 * rng.standard_normal(ds.accels.shape)
                     ).astype(np.float32)

        P = np.asarray(ds.poses, np.float64)
        motions = np.empty((len(ds.poses) - 1, 7), np.float32)
        for i in range(len(motions)):
            Ra, Rb = R.from_quat(P[i, 3:]), R.from_quat(P[i + 1, 3:])
            motions[i, :3] = Ra.inv().apply(P[i + 1, :3] - P[i, :3])
            motions[i, 3:] = (Ra.inv() * Rb).as_quat()

        class Args:
            batch_size = B
            lr = 3e-6
            imu_lr = 1e-3
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        import optax
        trainer = Trainer(Args(), ds)
        trainer.dn_params = dnet.init_params(jax.random.PRNGKey(3))
        trainer.imu_module.denoise_params = trainer.dn_params
        trainer.imu_opt = optax.adam(Args.imu_lr)
        trainer.imu_opt_state = trainer.imu_opt.init(trainer.dn_params)

        gt = np.asarray(ds.poses)
        ates, losses = [], []
        for _ in range(6):
            trainer.prev_vo_motions = motions  # replay GT VO each epoch
            traj = trainer.run_epoch(2)  # 'imu' target
            imu_traj = np.stack(traj.imu_poses)
            ates.append(ate_rmse(imu_traj, gt[:len(imu_traj)]))
            losses.append(sum(trainer.last_epoch_losses))

        # measured at epoch 6: ate ratio 0.70, loss ratio 0.39
        assert ates[-1] < 0.85 * ates[0], ates
        assert losses[-1] < 0.6 * losses[0], losses


class TestTrainerOnDiskLoader:
    def test_epoch_over_tartanair_fixture(self, tmp_path):
        """Loader -> transforms -> Trainer integration over an ON-DISK
        TartanAir fixture (the synthetic-dataset e2e tests bypass the file
        loaders entirely)."""
        from test_data import make_tartanair_fixture

        from islam_tpu.data.dataset import TrajFolderDataset
        from islam_tpu.data.transforms import (Compose, CropCenter,
                                               DownscaleFlow, Normalize,
                                               ToNHWCTensor)

        root = str(tmp_path / "P000")
        make_tartanair_fixture(root, n=5, h=96, w=192)
        transform = Compose([
            CropCenter((64, 128), fix_ratio=True),
            DownscaleFlow(),
            Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
                      keep_old=True),
            ToNHWCTensor(),
        ])
        ds = TrajFolderDataset(datadir=root, datatype="tartanair",
                               transform=transform)

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        trainer = Trainer(Args(), ds)
        trainer.run_epoch(1, snapshot_dir=str(tmp_path / "out"))
        poses = np.loadtxt(tmp_path / "out" / "1" / "pgo_pose.txt")
        assert poses.shape[1] == 7 and np.isfinite(poses).all()
        assert len(poses) == len(ds) // B * B + 1


    def test_epoch_over_kitti_fixture(self, tmp_path):
        """Loader -> transforms -> Trainer epoch off an ON-DISK KITTI
        drive fixture (round-4 review item 6: the OXTS/calib/timestamp glue
        — rgb2imu realignment, baseline from P_rect offsets — was only
        unit-tested, never driven through a full epoch)."""
        from test_data import make_kitti_fixture

        from islam_tpu.data.dataset import TrajFolderDataset
        from islam_tpu.data.transforms import (Compose, CropCenter,
                                               DownscaleFlow, Normalize,
                                               ToNHWCTensor)

        root = str(tmp_path / "2011_09_30" / "2011_09_30_drive_0018_sync")
        make_kitti_fixture(root, n=7, h=96, w=192)
        transform = Compose([
            CropCenter((64, 128), fix_ratio=True),
            DownscaleFlow(),
            Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
                      keep_old=True),
            ToNHWCTensor(),
        ])
        ds = TrajFolderDataset(datadir=root, datatype="kitti",
                               transform=transform)
        assert len(ds) >= 2 * B  # at least two windows

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        trainer = Trainer(Args(), ds)
        trainer.run_epoch(1, snapshot_dir=str(tmp_path / "out"))
        poses = np.loadtxt(tmp_path / "out" / "1" / "pgo_pose.txt")
        assert poses.shape[1] == 7 and np.isfinite(poses).all()
        assert len(poses) == len(ds) // B * B + 1

    def test_epoch_over_euroc_fixture(self, tmp_path):
        """Loader -> transforms -> Trainer epoch off an ON-DISK EuRoC mav0
        fixture (stereo rectification maps + timestamp intersection + T_BS
        driven end-to-end)."""
        from test_data import make_euroc_fixture

        from islam_tpu.data.dataset import TrajFolderDataset
        from islam_tpu.data.transforms import (Compose, CropCenter,
                                               DownscaleFlow, Normalize,
                                               ToNHWCTensor)

        root = str(tmp_path / "mav0")
        make_euroc_fixture(root, n=7, h=96, w=192)
        transform = Compose([
            CropCenter((64, 128), fix_ratio=True),
            DownscaleFlow(),
            Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
                      keep_old=True),
            ToNHWCTensor(),
        ])
        ds = TrajFolderDataset(datadir=root, datatype="euroc",
                               transform=transform)
        assert len(ds) >= 2 * B

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        trainer = Trainer(Args(), ds)
        trainer.run_epoch(1, snapshot_dir=str(tmp_path / "out"))
        poses = np.loadtxt(tmp_path / "out" / "1" / "pgo_pose.txt")
        assert poses.shape[1] == 7 and np.isfinite(poses).all()
        assert len(poses) == len(ds) // B * B + 1


class TestNanGuard:
    def test_guard_unit(self):
        """_guard_nonfinite zeroes grads and resets the carry when loss or
        any gradient is nonfinite; passes everything through untouched
        otherwise."""
        from islam_tpu.imu.preintegrator import IMUState
        from islam_tpu.train import _guard_nonfinite

        init = IMUState(pos=jnp.zeros(3), rot=jnp.asarray([0., 0., 0., 1.]),
                        vel=jnp.zeros(3))
        carry = IMUState(pos=jnp.ones(3), rot=jnp.asarray([0., 1., 0., 0.]),
                         vel=jnp.ones(3))
        grads = {"w": jnp.ones(3)}

        g2, a2 = _guard_nonfinite(jnp.asarray(jnp.nan), grads,
                                  {"carry": carry}, init)
        assert not bool(a2["ok"])
        assert float(jnp.sum(jnp.abs(g2["w"]))) == 0
        np.testing.assert_array_equal(np.asarray(a2["carry"].pos),
                                      np.asarray(init.pos))

        g3, a3 = _guard_nonfinite(jnp.asarray(1.0),
                                  {"w": jnp.asarray([1., jnp.inf, 0.])},
                                  {"carry": carry}, init)
        assert not bool(a3["ok"])
        assert float(jnp.sum(jnp.abs(g3["w"]))) == 0

        g4, a4 = _guard_nonfinite(jnp.asarray(1.0), grads,
                                  {"carry": carry}, init)
        assert bool(a4["ok"])
        np.testing.assert_array_equal(np.asarray(g4["w"]), np.ones(3))
        np.testing.assert_array_equal(np.asarray(a4["carry"].pos),
                                      np.asarray(carry.pos))

    def test_nonfinite_loss_contained_in_step(self, tiny):
        """Wiring through train_step: a nonfinite upper-level loss (forced
        via rot_w=nan -- NaN INPUTS are largely absorbed by the where-masked
        geometry, so the realistic failure is a diverged loss) must zero the
        gradients and reset the carry to the window's init state."""
        ds, imu, variables, dn_p = tiny
        batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
        args = (jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
                imu.gravity, imu.accel_bias, imu.gyro_bias,
                jnp.asarray(False))
        loss, grads, aux = train_step(
            variables, dn_p, batch, win, init, *args,
            target="vo", datatype="kitti", correct_scale=False,
            use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
            loss_weight=(1.0, 0.1, 10.0, 0.1), rot_w=float("nan"),
            trans_w=0.1)
        assert not np.isfinite(float(loss))
        assert not bool(aux["ok"])
        assert all(float(jnp.sum(jnp.abs(g))) == 0
                   for g in jax.tree_util.tree_leaves(grads))
        for c, i in zip(jax.tree_util.tree_leaves(aux["carry"]),
                        jax.tree_util.tree_leaves(init)):
            np.testing.assert_array_equal(np.asarray(c), np.asarray(i))


class TestScannedEpoch:
    def test_scan_chunk_matches_per_window(self, tiny, tmp_path):
        """--scan-chunk K (one lax.scan program per chunk) must reproduce the
        per-window stepping path: same motions, same updated parameters."""
        ds, _, _, _ = tiny

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False
            scan_chunk = 0

        t_ref = Trainer(Args(), ds)
        t_ref.run_epoch(1, snapshot_dir=str(tmp_path / "ref"))

        args2 = Args()
        args2.scan_chunk = 2
        t_scan = Trainer(args2, ds)
        t_scan.run_epoch(1, snapshot_dir=str(tmp_path / "scan"))

        np.testing.assert_allclose(t_scan.prev_vo_motions,
                                   t_ref.prev_vo_motions, atol=1e-5)
        for a, b in zip(
                jax.tree_util.tree_leaves(
                    t_scan.vo_variables["params"]["flowPoseNet"]),
                jax.tree_util.tree_leaves(
                    t_ref.vo_variables["params"]["flowPoseNet"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        ref_poses = np.loadtxt(tmp_path / "ref" / "1" / "pgo_pose.txt")
        scan_poses = np.loadtxt(tmp_path / "scan" / "1" / "pgo_pose.txt")
        np.testing.assert_allclose(scan_poses, ref_poses, atol=1e-4)

    def test_chunk_prefetch_matches_serial(self, tiny, monkeypatch,
                                           tmp_path):
        """The chunk-level prefetcher (round-4 review item 7: the NEXT
        chunk's windows load on a worker thread while the device runs the
        current scan program) must be a pure performance transform.
        Prefetch auto-disables on this 1-core box, so force-enable it by
        patching cpu_count and check bit-equal results vs the serial
        path."""
        import os as _os

        ds, _, _, _ = tiny

        class Args:
            batch_size = B
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False
            scan_chunk = 2
            worker_num = 1

        t_serial = Trainer(Args(), ds)
        t_serial.run_epoch(1)

        monkeypatch.setattr(_os, "cpu_count", lambda: 2)
        t_pf = Trainer(Args(), ds)
        t_pf.run_epoch(1)

        np.testing.assert_allclose(t_pf.prev_vo_motions,
                                   t_serial.prev_vo_motions, atol=0)
        for a, b in zip(
                jax.tree_util.tree_leaves(
                    t_pf.vo_variables["params"]["flowPoseNet"]),
                jax.tree_util.tree_leaves(
                    t_serial.vo_variables["params"]["flowPoseNet"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
