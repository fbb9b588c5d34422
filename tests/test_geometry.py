"""Geometry ops: projections, scale recovery, trajectory chains."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from islam_tpu import lie
from islam_tpu.lie import SE3
from islam_tpu.ops.geometry import (edge_mask, intrinsics_matrix,
                                    make_intrinsics_layer, pixel2point,
                                    point2pixel, scale_from_disp_flow)
from islam_tpu.transformation import (motion2pose, pose2motion_se3,
                                      tartan2kitti, cvt_se3)

RNG = np.random.default_rng(11)


class TestProjection:
    def test_pixel2point_point2pixel_roundtrip(self):
        K = intrinsics_matrix(100.0, 110.0, 60.0, 50.0)
        pix = jnp.asarray(RNG.uniform(0, 100, (32, 2)), jnp.float32)
        depth = jnp.asarray(RNG.uniform(1, 10, (32,)), jnp.float32)
        pts = pixel2point(pix, depth, K)
        back = point2pixel(pts, K)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pix),
                                   atol=1e-3)

    def test_intrinsics_layer_matches_host(self):
        from islam_tpu.data.transforms import make_intrinsics_layer as host_il

        dev = np.asarray(make_intrinsics_layer(8, 6, 100.0, 110.0, 4.0, 3.0))
        host = host_il(8, 6, 100.0, 110.0, 4.0, 3.0)  # (H, W, 2)
        np.testing.assert_allclose(dev.transpose(1, 2, 0), host, atol=1e-6)


class TestScaleRecovery:
    def test_recovers_known_scale(self):
        """Exact flow/disp from a known motion -> recovered s == ||t||."""
        H, W = 48, 64
        fx = fy = 80.0
        cx, cy = W / 2, H / 2
        baseline = 0.5
        s_true = 0.8

        # GT: constant depth plane with mild variation
        z = 5.0 + RNG.uniform(-0.5, 0.5, (H, W)).astype(np.float32)
        t = np.asarray([0.9, 0.2, 0.4])
        t = t / np.linalg.norm(t) * s_true
        rot = R.from_rotvec([0.01, -0.02, 0.005])
        q = rot.as_quat()
        T = SE3(jnp.asarray(np.concatenate([t, q]), jnp.float32))

        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        Kinv = np.linalg.inv(K)
        uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
        P = z[..., None] * np.einsum("ij,hwj->hwi", Kinv, uv1)
        # second-view projection with T.Inv() (dense_ba.py:143,172)
        Rinv = rot.inv().as_matrix()
        tinv = -Rinv @ t
        P2 = np.einsum("ij,hwj->hwi", Rinv, P) + tinv
        p2 = np.einsum("ij,hwj->hwi", K, P2 / P2[..., 2:3])
        flow = (p2[..., :2] - np.stack([u, v], axis=-1)).astype(np.float32)
        flow = jnp.asarray(np.moveaxis(flow, -1, 0))
        disp = jnp.asarray(fx * baseline / z)

        s, zz, mask, dmask = scale_from_disp_flow(
            disp, flow, T, fx, fy, cx, cy, baseline, disp_th=1.0)
        assert abs(float(s) - s_true) < 0.02 * s_true

    def test_edge_mask_runs(self):
        img = jnp.asarray(RNG.uniform(0, 1, (2, 3, 32, 40)), jnp.float32)
        m = edge_mask(img)
        assert m.shape == (2, 32, 40) and m.dtype == jnp.bool_


class TestTrajectoryChains:
    def test_motion2pose_pose2motion_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(10, 6)) * 0.2, jnp.float32)
        motions = SE3(lie.se3_exp(xi))
        poses = motion2pose(motions)
        assert poses.data.shape == (11, 7)
        back = pose2motion_se3(poses)
        np.testing.assert_allclose(np.asarray(back.data[:, :3]),
                                   np.asarray(motions.data[:, :3]), atol=1e-4)

    def test_motion2pose_matches_sequential(self):
        xi = jnp.asarray(RNG.normal(size=(5, 6)) * 0.3, jnp.float32)
        motions = SE3(lie.se3_exp(xi))
        T0 = SE3(jnp.asarray([1.0, 2, 3, 0, 0, 0, 1]))
        poses = motion2pose(motions, T0)
        T = T0
        for i in range(5):
            T = T @ motions[i]
            np.testing.assert_allclose(np.asarray(poses.data[i + 1]),
                                       np.asarray(T.data), atol=1e-4)

    def test_tartan2kitti_is_conjugation(self):
        m = SE3(jnp.asarray(
            np.concatenate([RNG.normal(size=3),
                            R.random(random_state=3).as_quat()]), jnp.float32))
        out = tartan2kitti(m)
        # conjugation preserves rotation angle and translation norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.translation())),
            np.linalg.norm(np.asarray(m.translation())), rtol=1e-5)
        ang1 = np.linalg.norm(np.asarray(out.rotation().Log()))
        ang2 = np.linalg.norm(np.asarray(m.rotation().Log()))
        np.testing.assert_allclose(ang1, ang2, rtol=1e-4)
        # axis permutation: translation components permuted (z,x,y) -> NED
        t = np.asarray(m.translation())
        np.testing.assert_allclose(np.asarray(out.translation()),
                                   t[[1, 2, 0]], atol=1e-5)

    def test_cvt_se3_from_6vec(self):
        v = jnp.asarray([1.0, 2, 3, 0.1, 0.2, 0.3])
        out = cvt_se3(v)
        np.testing.assert_allclose(np.asarray(out.translation()), [1, 2, 3],
                                   atol=1e-6)
        q_ref = R.from_rotvec([0.1, 0.2, 0.3]).as_quat()
        q = np.asarray(out.data[3:])
        sign = np.sign(np.dot(q, q_ref))
        np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)


class TestDenseBA:
    def test_dense_reproj_zero_at_gt(self):
        from islam_tpu.ops.dense_ba import DenseReprojectionLoss

        H, W = 24, 32
        fx = fy = 40.0
        cx, cy = W / 2, H / 2
        z = 5.0 + RNG.uniform(-0.5, 0.5, (1, H, W)).astype(np.float32)
        t = np.asarray([0.3, 0.05, 0.1], np.float32)
        rot = R.from_rotvec([0.01, 0.02, -0.01])
        q = rot.as_quat().astype(np.float32)

        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        Kinv = np.linalg.inv(K)
        uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
        P = z[0][..., None] * np.einsum("ij,hwj->hwi", Kinv, uv1)
        Rinv = rot.inv().as_matrix()
        tinv = -Rinv @ t
        P2 = np.einsum("ij,hwj->hwi", Rinv, P) + tinv
        p2 = np.einsum("ij,hwj->hwi", K, P2 / P2[..., 2:3])
        flow = np.moveaxis(p2[..., :2] - np.stack([u, v], axis=-1), -1, 0)

        loss_fn = DenseReprojectionLoss(
            z, flow[None].astype(np.float32), fx, fy, cx, cy,
            np.ones((1, H, W), bool),
            np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))
        motion = SE3(jnp.asarray(np.concatenate([t, q]))[None])
        loss = loss_fn(motion)
        assert float(loss[0]) < 1e-2

    def test_sparse_reproj_zero_at_gt(self):
        from islam_tpu.ops.dense_ba import SparseReprojectionLoss

        H, W = 24, 32
        fx = fy = 40.0
        cx, cy = W / 2, H / 2
        z = 5.0 * np.ones((1, H, W), np.float32)
        t = np.asarray([0.2, 0.0, 0.05], np.float32)
        q = np.asarray([0, 0, 0, 1], np.float32)

        pts = np.stack([RNG.uniform(2, W - 3, 20),
                        RNG.uniform(2, H - 3, 20)], axis=-1)
        pts = np.floor(pts).astype(np.float32)[None]

        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        Kinv = np.linalg.inv(K)
        uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
        P = z[0][..., None] * np.einsum("ij,hwj->hwi", Kinv, uv1)
        P2 = P - t  # identity rotation, T.Inv() translation
        p2 = np.einsum("ij,hwj->hwi", K, P2 / P2[..., 2:3])
        flow = np.moveaxis(p2[..., :2] - np.stack([u, v], axis=-1), -1, 0)

        loss_fn = SparseReprojectionLoss(
            pts, z, flow[None].astype(np.float32), fx, fy, cx, cy,
            np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))
        motion = SE3(jnp.asarray(np.concatenate([t, q]))[None])
        err = loss_fn(motion)
        assert float(jnp.max(jnp.abs(err))) < 1e-2
