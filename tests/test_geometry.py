"""Geometry ops: projections, scale recovery, trajectory chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from islam_tpu import lie
from islam_tpu.lie import SE3
from islam_tpu.ops.geometry import (edge_mask, intrinsics_matrix,
                                    make_intrinsics_layer, pixel2point,
                                    point2pixel, scale_from_disp_flow)
from islam_tpu.transformation import (motion2pose, pose2motion_se3,
                                      tartan2kitti, cvt_se3)

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(11)


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

    def test_matches_gather_oracle(self):
        """The where-masked jit least squares equals the reference's
        boolean-gather form (dense_ba.py:159-173) on random noisy inputs,
        including the masks bit-for-bit."""
        from oracle_helpers import np_scale_from_disp_flow

        H, W = 40, 56
        fx, fy, cx, cy = 70.0, 75.0, W / 2, H / 2
        baseline = 0.5
        for seed in range(3):
            rng = np.random.default_rng(100 + seed)
            disp = rng.uniform(0.0, 20.0, (H, W)).astype(np.float32)
            flow = rng.normal(0, 4.0, (2, H, W)).astype(np.float32)
            t = rng.normal(size=3)
            q = R.from_rotvec(rng.normal(size=3) * 0.05).as_quat()
            motion = np.concatenate([t, q]).astype(np.float32)
            extra = rng.random((H, W)) > 0.3

            s, z, m, dm = scale_from_disp_flow(
                jnp.asarray(disp), jnp.asarray(flow),
                SE3(jnp.asarray(motion)), fx, fy, cx, cy, baseline,
                mask=jnp.asarray(extra), disp_th=1.0)
            s_o, z_o, m_o, dm_o = np_scale_from_disp_flow(
                disp, flow, motion, fx, fy, cx, cy, baseline,
                mask=extra, disp_th=1.0)

            np.testing.assert_array_equal(np.asarray(m), m_o)
            np.testing.assert_array_equal(np.asarray(dm), dm_o)
            np.testing.assert_allclose(np.asarray(z)[dm_o], z_o[dm_o],
                                       rtol=1e-5)
            np.testing.assert_allclose(float(s), s_o, rtol=2e-4)


def _blocky_scene(rng, H, W, block=8):
    """uint8 BGR frame of sharp-edged random blocks + mild sensor noise,
    plus the known block-boundary map (the 'textured pixels')."""
    low = rng.uniform(40, 215, (H // block, W // block, 3))
    img = np.repeat(np.repeat(low, block, axis=0), block, axis=1)
    img = np.clip(img + rng.normal(0, 2.0, img.shape), 0, 255)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    near_edge = ((xx % block) < 2) | ((xx % block) > block - 3) \
        | ((yy % block) < 2) | ((yy % block) > block - 3)
    return img.astype(np.uint8), near_edge


class TestCannyMaskDelta:
    """VERDICT round-1 item: quantify how much the recovered metric scale
    moves between the reference's cv2.Canny(50,100)+dilate(5x5) mask
    (TartanVO.py:150-154) and the on-device Sobel+dilate approximation.

    Setup: exactly consistent flow/disp from a known motion over a
    depth-varying scene, plus heteroscedastic noise — accurate matches near
    intensity edges, ~10x noisier in flat regions (the aperture-problem
    error model that makes edge masking worthwhile in the first place).
    Acceptance bound (documented in docs/RESULTS.md): both masks recover the
    true scale within 2%, and they differ from EACH OTHER by < 1%.
    """

    def test_scale_delta_canny_vs_sobel(self):
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        from oracle_helpers import cv2_canny_mask, np_scale_from_disp_flow

        H, W = 112, 160
        fx = fy = 120.0
        cx, cy = W / 2, H / 2
        baseline = 0.5
        s_true = 0.8

        deltas, errs = [], []
        for seed in range(4):
            rng = np.random.default_rng(50 + seed)
            img_u8, near_edge = _blocky_scene(rng, H, W)

            z = 6.0 + 2.0 * np.sin(np.arange(W) / 17.0)[None, :] \
                + rng.uniform(-0.3, 0.3, (H, W))
            t = np.asarray([0.8, 0.15, 0.3])
            t = t / np.linalg.norm(t) * s_true
            rot = R.from_rotvec([0.01, -0.015, 0.008])
            motion = np.concatenate([t, rot.as_quat()]).astype(np.float32)

            u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                               np.arange(H, dtype=np.float64))
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
            uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
            P = z[..., None] * np.einsum("ij,hwj->hwi", np.linalg.inv(K), uv1)
            Rinv = rot.inv().as_matrix()
            P2 = np.einsum("ij,hwj->hwi", Rinv, P) + (-Rinv @ t)
            p2 = np.einsum("ij,hwj->hwi", K, P2 / P2[..., 2:3])
            flow = np.moveaxis(p2[..., :2] - np.stack([u, v], -1), -1, 0)

            # heteroscedastic matching noise: 0.1 px near edges, 1 px flat
            sigma = np.where(near_edge, 0.1, 1.0)
            flow = flow + rng.normal(0, 1.0, flow.shape) * sigma[None]
            disp = fx * baseline / z + rng.normal(0, 1.0, z.shape) \
                * 0.1 * sigma

            m_canny = cv2_canny_mask(img_u8)
            m_sobel = np.asarray(edge_mask(
                jnp.asarray(img_u8.transpose(2, 0, 1)[None] / 255.0,
                            jnp.float32)))[0]

            s_c, *_ = np_scale_from_disp_flow(
                disp, flow, motion, fx, fy, cx, cy, baseline,
                mask=m_canny, disp_th=1.0)
            s_s, *_ = np_scale_from_disp_flow(
                disp, flow, motion, fx, fy, cx, cy, baseline,
                mask=m_sobel, disp_th=1.0)
            deltas.append(abs(s_c - s_s) / s_true)
            errs.append(max(abs(s_c - s_true), abs(s_s - s_true)) / s_true)

            inter = np.logical_and(m_canny, m_sobel).sum()
            union = np.logical_or(m_canny, m_sobel).sum()
            assert inter / union > 0.5, "masks diverged structurally"

        assert max(errs) < 0.02, f"scale error vs GT too large: {errs}"
        assert max(deltas) < 0.01, f"Canny-vs-Sobel delta: {deltas}"

    def test_masks_help_under_aperture_bias(self):
        """Under BIASED flat-region degradation (flow/disp shrink toward 0
        away from edges — the aperture problem, the error mode the
        reference's edge mask exists for), both masks beat no-mask and
        track each other within 0.1% of the true scale."""
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        from oracle_helpers import cv2_canny_mask, np_scale_from_disp_flow

        H, W = 112, 160
        fx = fy = 120.0
        cx, cy = W / 2, H / 2
        baseline = 0.5
        s_true = 0.8

        rng = np.random.default_rng(50)
        img_u8, near_edge = _blocky_scene(rng, H, W)
        z = 6.0 + 2.0 * np.sin(np.arange(W) / 17.0)[None, :] \
            + rng.uniform(-0.3, 0.3, (H, W))
        t = np.asarray([0.8, 0.15, 0.3])
        t = t / np.linalg.norm(t) * s_true
        rot = R.from_rotvec([0.01, -0.015, 0.008])
        motion = np.concatenate([t, rot.as_quat()]).astype(np.float32)

        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
        P = z[..., None] * np.einsum("ij,hwj->hwi", np.linalg.inv(K), uv1)
        Rinv = rot.inv().as_matrix()
        P2 = np.einsum("ij,hwj->hwi", Rinv, P) + (-Rinv @ t)
        p2 = np.einsum("ij,hwj->hwi", K, P2 / P2[..., 2:3])
        flow = np.moveaxis(p2[..., :2] - np.stack([u, v], -1), -1, 0)

        shrink = np.where(near_edge, 1.0, 0.7)
        flow = flow * shrink[None] + rng.normal(0, 0.1, flow.shape)
        disp = fx * baseline / z * np.where(near_edge, 1.0, 0.85) \
            + rng.normal(0, 0.05, z.shape)

        m_canny = cv2_canny_mask(img_u8)
        m_sobel = np.asarray(edge_mask(
            jnp.asarray(img_u8.transpose(2, 0, 1)[None] / 255.0,
                        jnp.float32)))[0]

        err = lambda s: abs(s - s_true) / s_true  # noqa: E731
        s_c, *_ = np_scale_from_disp_flow(
            disp, flow, motion, fx, fy, cx, cy, baseline,
            mask=m_canny, disp_th=1.0)
        s_s, *_ = np_scale_from_disp_flow(
            disp, flow, motion, fx, fy, cx, cy, baseline,
            mask=m_sobel, disp_th=1.0)
        s_n, *_ = np_scale_from_disp_flow(
            disp, flow, motion, fx, fy, cx, cy, baseline,
            mask=None, disp_th=1.0)
        assert err(s_c) < err(s_n) and err(s_s) < err(s_n)
        assert abs(s_c - s_s) / s_true < 1e-3


class TestTrajectoryChains:
    def test_relative_twists_matches_matrix_oracle(self):
        """Vectorized GT-motion prep == per-link 4x4 matrix algebra
        (inv(T_i) @ T_j decomposed to [trans, rotvec])."""
        from scipy.spatial.transform import Rotation as SR

        from islam_tpu.transformation import relative_twists

        n = 9
        pos = RNG.normal(size=(n, 3))
        quat = SR.random(n, random_state=5).as_quat()
        poses = np.concatenate([pos, quat], axis=1)
        links = [(0, 1), (2, 5), (7, 3), (4, 4)]
        got = relative_twists(poses, links=links)
        for k, (i, j) in enumerate(links):
            Ti, Tj = np.eye(4), np.eye(4)
            Ti[:3, :3] = SR.from_quat(quat[i]).as_matrix()
            Ti[:3, 3] = pos[i]
            Tj[:3, :3] = SR.from_quat(quat[j]).as_matrix()
            Tj[:3, 3] = pos[j]
            M = np.linalg.inv(Ti) @ Tj
            np.testing.assert_allclose(got[k, :3], M[:3, 3], atol=1e-10)
            np.testing.assert_allclose(
                got[k, 3:], SR.from_matrix(M[:3, :3]).as_rotvec(),
                atol=1e-10)
        # default consecutive links with skip
        got2 = relative_twists(poses, skip=1)
        assert got2.shape == (n - 2, 6)
        np.testing.assert_allclose(
            got2[0], relative_twists(poses, links=[(0, 2)])[0], atol=1e-12)

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

    def test_sparse_reproj_debug_overlay(self, tmp_path):
        """The dense_ba.py:308-344 diagnostic: writes one overlay PNG per
        batch element with keypoints + reprojection/target lines."""
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        from islam_tpu.ops.dense_ba import SparseReprojectionLoss

        H, W = 24, 32
        z = 5.0 * np.ones((1, H, W), np.float32)
        pts = np.stack([RNG.uniform(2, W - 3, 8),
                        RNG.uniform(2, H - 3, 8)], axis=-1)
        pts = np.floor(pts).astype(np.float32)[None]
        flow = np.zeros((1, 2, H, W), np.float32)
        loss_fn = SparseReprojectionLoss(
            pts, z, flow, 40.0, 40.0, W / 2, H / 2,
            np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))
        motion = SE3(jnp.asarray([0.1, 0, 0, 0, 0, 0, 1])[None])
        img = RNG.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
        loss_fn.debug(motion, img, img, W, H, scale=2,
                      out_dir=str(tmp_path))
        assert (tmp_path / "0_reproj.png").exists()

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
