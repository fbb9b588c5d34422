"""PVGO back-end tests: LM convergence, gauge alignment, bi-level gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu import lie
from islam_tpu.lie import SE3
from islam_tpu.pvgo.run import run_pvgo
from islam_tpu.transformation import motion2pose, pose2motion_se3

RNG = np.random.default_rng(7)
B = 8


def make_problem(noise=0.0):
    """Ground-truth chain + consistent measurements (+ optional VO noise)."""
    # GT: smooth forward motion with slight rotation
    xi = np.tile(np.asarray([[0.5, 0.02, -0.01, 0.01, 0.03, 0.005]]), (B, 1))
    xi += RNG.normal(size=(B, 6)) * 0.01
    gt_motions = SE3(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
    gt_poses = motion2pose(gt_motions)
    dts = np.full((B,), 0.1, np.float32)
    gt_vels = np.zeros((B + 1, 3), np.float32)
    # velocity consistent with translation differences (transvel factor with
    # imu_dtrans = diff - vel*dt = 0 if vel = diff/dt)
    trans = np.asarray(gt_poses.data[:, :3])
    gt_vels[:-1] = (trans[1:] - trans[:-1]) / dts[:, None]
    gt_vels[-1] = gt_vels[-2]

    imu_drots = np.asarray(
        lie.quat_mul(lie.quat_conj(gt_poses.data[:-1, 3:]),
                     gt_poses.data[1:, 3:]))
    imu_dvels = gt_vels[1:] - gt_vels[:-1]
    imu_dtrans = (trans[1:] - trans[:-1]) - gt_vels[:-1] * dts[:, None]

    vo_noise = RNG.normal(size=(B, 6)) * noise
    vo_motions = SE3(lie.se3_mul(
        gt_motions.data, lie.se3_exp(jnp.asarray(vo_noise, jnp.float32))))

    links = np.stack([np.arange(B), np.arange(B) + 1], axis=1)
    return dict(gt_poses=gt_poses, gt_vels=gt_vels, vo_motions=vo_motions,
                links=jnp.asarray(links), dts=jnp.asarray(dts),
                imu_drots=jnp.asarray(imu_drots, jnp.float32),
                imu_dtrans=jnp.asarray(imu_dtrans, jnp.float32),
                imu_dvels=jnp.asarray(imu_dvels, jnp.float32))


class TestRunPVGO:
    def test_recovers_gt_from_perturbed_init(self):
        p = make_problem(noise=0.0)
        init_nodes = np.asarray(p["gt_poses"].data).copy()
        init_nodes[1:, :3] += RNG.normal(size=(B, 3)).astype(np.float32) * 0.05
        trans_loss, rot_loss, nodes, vels, covs = run_pvgo(
            jnp.asarray(init_nodes), jnp.asarray(p["gt_vels"]),
            p["vo_motions"], p["links"], p["dts"],
            p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
            loss_weight=(1.0, 0.1, 10.0, 0.1), target="vo")
        # anchored at init_nodes[0] == gt first pose -> should match GT
        np.testing.assert_allclose(np.asarray(nodes[:, :3]),
                                   np.asarray(p["gt_poses"].data[:, :3]),
                                   atol=2e-3)
        q, qr = np.asarray(nodes[:, 3:]), np.asarray(p["gt_poses"].data[:, 3:])
        dots = np.abs(np.sum(q * qr, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)

    def test_residual_decreases_with_noisy_vo(self):
        p = make_problem(noise=0.02)
        init_nodes = p["gt_poses"].data
        trans_loss, rot_loss, nodes, vels, _ = run_pvgo(
            init_nodes, jnp.asarray(p["gt_vels"]),
            p["vo_motions"], p["links"], p["dts"],
            p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
            loss_weight=(1.0, 0.1, 10.0, 0.1), target="vo")
        assert np.all(np.isfinite(np.asarray(nodes)))
        # anchor preserved
        np.testing.assert_allclose(np.asarray(nodes[0]),
                                   np.asarray(init_nodes[0]), atol=1e-5)
        # upper loss is positive (VO disagrees with fused estimate)
        assert float(jnp.sum(trans_loss) + jnp.sum(rot_loss)) > 0

    def test_vo_gradient_flows_only_to_motions(self):
        p = make_problem(noise=0.02)

        def loss_fn(vo_data):
            trans_loss, rot_loss, _, _, _ = run_pvgo(
                p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
                vo_data, p["links"], p["dts"],
                p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
                loss_weight=(1.0, 0.1, 10.0, 0.1), target="vo")
            return jnp.sum(trans_loss) + jnp.sum(rot_loss)

        g = jax.grad(loss_fn)(p["vo_motions"].data)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).sum() > 0

    def test_imu_target_gradients(self):
        p = make_problem(noise=0.02)

        def loss_fn(drots, dvels):
            trans_loss, rot_loss, _, _, _ = run_pvgo(
                p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
                p["vo_motions"].data, p["links"], p["dts"],
                drots, p["imu_dtrans"], dvels,
                loss_weight=(1.0, 0.1, 10.0, 0.1), target="imu")
            return jnp.sum(trans_loss) + jnp.sum(rot_loss)

        g1, g2 = jax.grad(loss_fn, argnums=(0, 1))(
            p["imu_drots"], p["imu_dvels"])
        assert np.all(np.isfinite(np.asarray(g1)))
        assert np.abs(np.asarray(g2)).sum() > 0

    def test_fuses_vo_and_imu(self):
        """With strong IMU weight, solution sits closer to IMU chain than
        the noisy VO chain."""
        p = make_problem(noise=0.05)
        init_nodes = p["gt_poses"].data
        _, _, nodes, _, _ = run_pvgo(
            init_nodes, jnp.asarray(p["gt_vels"]),
            p["vo_motions"], p["links"], p["dts"],
            p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
            loss_weight=(1.0, 10.0, 100.0, 10.0), target="vo")
        sol_motions = pose2motion_se3(SE3(nodes))
        gt_motions = pose2motion_se3(p["gt_poses"])
        err_sol = np.linalg.norm(
            np.asarray(lie.se3_log(lie.se3_mul(
                lie.se3_inv(gt_motions.data), sol_motions.data))), axis=-1)
        err_vo = np.linalg.norm(
            np.asarray(lie.se3_log(lie.se3_mul(
                lie.se3_inv(gt_motions.data), p["vo_motions"].data))), axis=-1)
        assert err_sol.mean() < err_vo.mean()
