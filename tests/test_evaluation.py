"""ATE/RPE metrics + integration: PVGO fusion beats raw VO on synthetic."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from islam_tpu.utils.evaluation import ate_rmse, rpe, umeyama_alignment

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(41)


class TestMetrics:
    def test_umeyama_exact(self):
        x = RNG.normal(size=(50, 3))
        rot = R.random(random_state=1).as_matrix()
        t = np.asarray([1.0, -2.0, 0.5])
        y = (rot @ x.T).T + t
        Re, te, s = umeyama_alignment(x, y)
        np.testing.assert_allclose(Re, rot, atol=1e-6)
        np.testing.assert_allclose(te, t, atol=1e-6)
        assert s == 1.0

    def test_ate_zero_for_rigidly_moved(self):
        poses = np.concatenate(
            [RNG.normal(size=(30, 3)),
             R.random(30, random_state=2).as_quat()], axis=1)
        rot = R.random(random_state=3).as_matrix()
        moved = poses.copy()
        moved[:, :3] = (rot @ poses[:, :3].T).T + np.asarray([5, 5, 5])
        assert ate_rmse(moved, poses) < 1e-6

    def test_ate_scales_with_noise(self):
        poses = np.concatenate(
            [np.cumsum(RNG.normal(size=(40, 3)), axis=0),
             np.tile([0, 0, 0, 1.0], (40, 1))], axis=1)
        noisy = poses.copy()
        noisy[:, :3] += RNG.normal(size=(40, 3)) * 0.1
        a = ate_rmse(noisy, poses)
        assert 0.01 < a < 0.3

    def test_rpe_identity(self):
        poses = np.concatenate(
            [np.cumsum(RNG.normal(size=(20, 3)), axis=0),
             R.random(20, random_state=4).as_quat()], axis=1)
        t_err, r_err = rpe(poses, poses)
        assert t_err < 1e-6 and r_err < 1e-5


class TestFusionIntegration:
    def test_pgo_beats_raw_vo(self, tmp_path):
        """Full trainer epoch on synthetic data: the PVGO trajectory (fusing
        exact IMU) must have lower ATE than the raw (untrained) VO chain --
        the core claim of the back-end (README.md:33 of the reference)."""
        import jax
        from islam_tpu import testing
        from islam_tpu.train import Trainer

        ds = testing.make_dataset(num_frames=9, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            # IMU-heavy weights: with an untrained VO net, the fused
            # trajectory should track the (exact) IMU chain closely.
            loss_weight = (1.0, 10.0, 100.0, 10.0)
            rot_w = 1.0
            trans_w = 0.1
            # GT-scale mode: the stereo scale recovery degenerates to s=0 on
            # untrained nets + synthetic texture (empty disparity mask), and
            # a zero-translation VO chain is gauge-compatible with every IMU
            # factor (velocity offset freedom) -- same structure as the
            # reference.  GT scale gives the VO term sane magnitudes.
            use_gt_scale = True

        trainer = Trainer(Args(), ds)
        trainer.run_epoch(1, snapshot_dir=str(tmp_path))

        vo = np.loadtxt(tmp_path / "1" / "vo_pose.txt")
        pgo = np.loadtxt(tmp_path / "1" / "pgo_pose.txt")
        n = len(pgo)
        gt = ds.poses[:n]
        ate_vo = ate_rmse(vo[:n], gt)
        ate_pgo = ate_rmse(pgo, gt)
        # What the graph guarantees: rotation is anchored hard by the IMU
        # relative-rotation factor (weight 100 here), so fused rotations
        # must improve clearly.  Translation carries a velocity-offset gauge
        # that only the VO factor pins (inherent to the reference's graph,
        # pvgo.py:26-64), so assert the weaker ATE inequality there.
        assert ate_pgo < ate_vo, (ate_pgo, ate_vo)
        rpe_vo_t, rpe_vo_r = rpe(vo[:n], gt)
        rpe_pgo_t, rpe_pgo_r = rpe(pgo, gt)
        assert rpe_pgo_r < 0.7 * rpe_vo_r, (rpe_pgo_r, rpe_vo_r)
        assert rpe_pgo_t <= rpe_vo_t * 1.01, (rpe_pgo_t, rpe_vo_t)
