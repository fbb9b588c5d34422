"""Secondary model/variant coverage: multicam pose head, PWC uncertainty,
PSMNet alternates, loss helpers, bias calibration, reproj factor in PVGO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(31)


class TestMulticamVOFlow:
    def test_forward_shapes(self):
        from islam_tpu.models.voflownet import VOFlowRes

        model = VOFlowRes(stereo=2.1)
        x = jnp.asarray(RNG.normal(size=(2, 112, 160, 6)), jnp.float32)
        ext = jnp.asarray(RNG.normal(size=(2, 6)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, ext)
        out = model.apply(variables, x, ext)
        assert out.shape == (2, 6)
        assert np.isfinite(np.asarray(out)).all()


class TestPWCUncertainty:
    def test_forward_with_uncertainty(self):
        from islam_tpu.models.pwcnet import PWCDCNet

        model = PWCDCNet(uncertainty=True)
        x = jnp.asarray(RNG.normal(size=(1, 64, 128, 6)) * 0.3, jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        flows, uncs = model.apply(variables, x)
        assert len(flows) == 5 and len(uncs) == 5
        assert flows[0].shape == (1, 16, 32, 2)
        assert uncs[0].shape == (1, 16, 32, 1)
        for u in uncs:
            assert u is not None and np.isfinite(np.asarray(u)).all()

    def test_concat_free_decoder_matches_default(self):
        """The concat-free decoder (sliced-kernel conv sums, no concat
        buffers) is numerically the default decoder with the SAME params:
        conv(cat(parts)) == sum_i conv_i(part_i) up to f32 sum order."""
        from islam_tpu.models.pwcnet import PWCDCNet

        x = jnp.asarray(RNG.normal(size=(2, 64, 128, 6)) * 0.3, jnp.float32)
        base = PWCDCNet()
        variables = base.init(jax.random.PRNGKey(1), x)
        flows, _ = base.apply(variables, x)
        flows_cf, _ = PWCDCNet(concat_free=True).apply(variables, x)
        for f, fc in zip(flows, flows_cf):
            np.testing.assert_allclose(np.asarray(f), np.asarray(fc),
                                       atol=2e-5)

        # gradients agree too (the decoder sits on the train path)
        def loss(v, model):
            fl, _ = model.apply(v, x)
            return sum(jnp.sum(f ** 2) for f in fl)

        g1 = jax.grad(loss)(variables, base)
        g2 = jax.grad(loss)(variables, PWCDCNet(concat_free=True))
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_flow_loss_helpers(self):
        from islam_tpu.models.pwcnet import calc_flow_loss

        flows = [jnp.zeros((1, 16 // (2 ** i) or 1, 32 // (2 ** i) or 1, 2))
                 for i in range(5)]
        target = jnp.ones((1, 64, 128, 2))
        crit = lambda a, b: jnp.mean(jnp.abs(a - b))
        loss, loss_nounc = calc_flow_loss(flows, target, crit, training=True)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(loss_nounc), 1.0, atol=1e-5)


class TestQuarterStereoHead:
    def test_matches_full_res_strided_slice(self):
        """StereoNet7(quarter_output=True) must be BIT-equal to the full-res
        output sampled at ``[:, ::4, ::4]`` with the same params -- i.e. to
        torch's F.interpolate(scale_factor=0.25, mode='nearest') of the full
        disparity (reference VONet.py:34).  Also checks the gradient path
        (the head sits on the frozen-but-traced stereo branch)."""
        from islam_tpu.models.stereonet import StereoNet7

        x = jnp.asarray(RNG.normal(size=(1, 64, 128, 6)) * 0.2, jnp.float32)
        full = StereoNet7(train_bn=True)  # train-mode BN keeps the untrained
        # activations O(1); eval-mode fresh stats blow up to ~1e7
        variables = full.init(jax.random.PRNGKey(2), x)
        quarter = StereoNet7(train_bn=True, quarter_output=True)
        out_full, _ = full.apply(variables, x, mutable=["batch_stats"])[0]
        out_q, _ = quarter.apply(variables, x, mutable=["batch_stats"])[0]
        assert out_q.shape == (1, 16, 32, 1)
        # Scale-aware tolerance: an untrained net's head activations can be
        # O(1e5) for some draws; absolute 1e-5 is meaningless there.
        ref = np.asarray(out_full[:, ::4, ::4])
        scale = max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(np.asarray(out_q), ref,
                                   rtol=1e-4, atol=1e-6 * scale)

        # Gradient path: the quarter head computes exactly the sampled
        # outputs, so grads of any function of full[::4, ::4] must match.
        def loss(v, model, sample):
            out, _ = model.apply(v, x, mutable=["batch_stats"])[0]
            if sample:
                out = out[:, ::4, ::4]
            return jnp.sum(out) / scale

        g_full = jax.grad(loss)(variables, full, True)["params"]
        g_q = jax.grad(loss)(variables, quarter, False)["params"]
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_q)):
            a, b = np.asarray(a), np.asarray(b)
            gs = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5 * gs)

    def test_convt2d_out_stride_general(self):
        """ConvT2d(out_stride=n) == full transposed conv sampled [::n, ::n],
        including the tuple-of-parts input path."""
        from islam_tpu.models.layers import ConvT2d

        a = jnp.asarray(RNG.normal(size=(2, 10, 14, 5)), jnp.float32)
        b = jnp.asarray(RNG.normal(size=(2, 10, 14, 3)), jnp.float32)
        m_full = ConvT2d(7, 4, 2, 1)
        variables = m_full.init(jax.random.PRNGKey(3), (a, b))
        y_full = m_full.apply(variables, (a, b))
        for n in (2, 4):
            y_n = ConvT2d(7, 4, 2, 1, out_stride=n).apply(variables, (a, b))
            np.testing.assert_allclose(np.asarray(y_n),
                                       np.asarray(y_full[:, ::n, ::n]),
                                       atol=1e-5)

    def test_convt2d_out_stride_right_pad(self):
        """k=3, s=2, p=1: the last subsampled output reads a tap from the
        transposed conv's RIGHT pad region — the lowering must zero-pad
        right, not just left (round-3 advisor finding)."""
        from islam_tpu.models.layers import ConvT2d

        rng = np.random.default_rng(32)
        a = jnp.asarray(rng.normal(size=(2, 9, 13, 5)), jnp.float32)
        m_full = ConvT2d(6, 3, 2, 1)
        variables = m_full.init(jax.random.PRNGKey(4), a)
        y_full = m_full.apply(variables, a)
        y_2 = ConvT2d(6, 3, 2, 1, out_stride=2).apply(variables, a)
        np.testing.assert_allclose(np.asarray(y_2),
                                   np.asarray(y_full[:, ::2, ::2]),
                                   atol=1e-5)

    def test_convt2d_out_stride_pad_formula_sweep(self):
        """Exact-output-size + right-pad formula sweep (round-4 advisor):
        (k=5, s=2, p=2, os=2) genuinely requires pr=1 -- the old formula
        under-padded by pb and tripped the shape assert; (k=4, s=2, p=2,
        os=2) is the case where in*s//os OVER-counted the subsampled rows
        (full output 2*in-2, not 2*in) and the under-pad used to silently
        yield a garbage last row.  Truth is the full transposed conv
        sampled [::os, ::os]."""
        from islam_tpu.models.layers import ConvT2d

        rng = np.random.default_rng(33)
        a = jnp.asarray(rng.normal(size=(2, 9, 13, 5)), jnp.float32)
        for k, s, p in ((5, 2, 2), (4, 2, 2), (3, 2, 1), (4, 2, 1),
                        (6, 2, 2), (5, 2, 1)):
            m_full = ConvT2d(6, k, s, p)
            variables = m_full.init(jax.random.PRNGKey(5), a)
            y_full = m_full.apply(variables, a)
            for os_ in (2, 4):
                y_n = ConvT2d(6, k, s, p, out_stride=os_).apply(variables, a)
                np.testing.assert_allclose(
                    np.asarray(y_n), np.asarray(y_full[:, ::os_, ::os_]),
                    atol=1e-5,
                    err_msg=f"k={k} s={s} p={p} out_stride={os_}")


class TestResizeFastPaths:
    """The x2 / x1/2 half-pixel resizes take layout-native TPU paths
    (depthwise dilated conv / 2x2 avg pool).  Both must match (a) the
    general matmul path and (b) torch F.interpolate itself."""

    def _torch_bilinear(self, x_nhwc, out_hw):
        import torch
        t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
        y = torch.nn.functional.interpolate(
            t, size=out_hw, mode="bilinear", align_corners=False)
        return y.permute(0, 2, 3, 1).numpy()

    def test_upsample2x_matches_matmul_and_torch(self):
        from islam_tpu.models.layers import (_resize_bilinear_matmul,
                                             resize_bilinear)
        x = jnp.asarray(RNG.normal(size=(2, 7, 10, 5)), jnp.float32)
        got = resize_bilinear(x, (14, 20), align_corners=False)
        ref = _resize_bilinear_matmul(x, (14, 20), False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got),
                                   self._torch_bilinear(x, (14, 20)),
                                   rtol=1e-5, atol=1e-6)

    def test_downsample2x_matches_matmul_and_torch(self):
        from islam_tpu.models.layers import (_resize_bilinear_matmul,
                                             resize_bilinear)
        x = jnp.asarray(RNG.normal(size=(2, 8, 12, 3)), jnp.float32)
        got = resize_bilinear(x, (4, 6), align_corners=False)
        ref = _resize_bilinear_matmul(x, (4, 6), False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got),
                                   self._torch_bilinear(x, (4, 6)),
                                   rtol=1e-5, atol=1e-6)

    def test_general_ratio_and_align_corners_keep_matmul_path(self):
        """Odd ratios and align_corners=True must not route to the fast
        paths (their sampling grids differ)."""
        from islam_tpu.models.layers import (_resize_bilinear_matmul,
                                             resize_bilinear)
        x = jnp.asarray(RNG.normal(size=(1, 6, 9, 4)), jnp.float32)
        for out_hw, ac in (((13, 17), False), ((12, 18), True)):
            got = resize_bilinear(x, out_hw, align_corners=ac)
            ref = _resize_bilinear_matmul(x, out_hw, ac)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)


class TestStereoLoss:
    def test_stereo_loss(self):
        from islam_tpu.models.stereonet import stereo_loss

        out = jnp.zeros((1, 8, 8, 1))
        tgt = jnp.ones((1, 8, 8, 1))
        crit = lambda a, b: jnp.mean(jnp.abs(a - b))
        loss, _ = stereo_loss(out, tgt, crit)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)
        loss_unc, plain = stereo_loss(out, tgt, crit, unc=jnp.zeros_like(out))
        np.testing.assert_allclose(float(plain), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(loss_unc), 0.5, atol=1e-6)


class TestPSMNet:
    def test_stackhourglass_shapes(self):
        from islam_tpu.models.psmnet import PSMNetStackHourglass

        model = PSMNetStackHourglass(maxdisp=16, train_bn=True)
        x = jnp.asarray(RNG.normal(size=(1, 64, 64, 6)) * 0.2, jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        (disp, _), _ = model.apply(variables, x, mutable=["batch_stats"])
        assert disp.shape == (1, 16, 64, 64)[0:1] + (1, 64, 64)
        arr = np.asarray(disp)
        assert np.isfinite(arr).all()
        assert arr.min() >= 0 and arr.max() <= 16

    def test_basic_shapes(self):
        from islam_tpu.models.psmnet import PSMNetBasic

        model = PSMNetBasic(maxdisp=16, train_bn=True)
        l = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)) * 0.2, jnp.float32)
        r = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)) * 0.2, jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), l, r)
        disp, _ = model.apply(variables, l, r, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(disp)).all()


class TestBiasCalibration:
    def test_recovers_constant_bias(self):
        from islam_tpu.data.synthetic import SyntheticTrajDataset
        from islam_tpu.imu.bias import optimize_bias

        ds = SyntheticTrajDataset(num_frames=21)
        true_bias = np.asarray([0.05, -0.03, 0.02], np.float32)
        corrupted = ds.accels + true_bias
        accel_bias, gyro_bias, hist = optimize_bias(
            lr=1e-2, epochs=40, poses=ds.poses, sync=ds.rgb2imu_sync,
            accels=corrupted, gyros=ds.gyros,
            accel_bias=np.zeros(3), gyro_bias=np.zeros(3),
            dts=ds.imu_dts, init=ds.imu_init, gravity=ds.gravity)
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(np.asarray(accel_bias), true_bias,
                                   atol=0.03)


class TestReprojFactor:
    def test_pvgo_with_sparse_reproj(self):
        from islam_tpu.ops.dense_ba import SparseReprojectionLoss
        from islam_tpu.pvgo.run import run_pvgo
        from tests.test_pvgo import make_problem, B

        p = make_problem(noise=0.02)
        H, W, N = 24, 32, 16
        fx = fy = 40.0
        depth = 5.0 * np.ones((B, H, W), np.float32)
        flow = np.zeros((B, 2, H, W), np.float32)
        pts = np.tile(np.stack([RNG.uniform(2, W - 3, N),
                                RNG.uniform(2, H - 3, N)],
                               axis=-1)[None], (B, 1, 1)).astype(np.float32)
        reproj = SparseReprojectionLoss(
            np.floor(pts), depth, flow, fx, fy, W / 2, H / 2,
            np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))

        trans_loss, rot_loss, nodes, vels, _ = run_pvgo(
            p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
            p["vo_motions"], p["links"], p["dts"],
            p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
            loss_weight=(1.0, 0.1, 10.0, 0.1, 0.5), reproj=reproj,
            target="vo")
        assert np.isfinite(np.asarray(nodes)).all()

    def test_pvgo_with_dense_reproj_influences_solution(self):
        """An ACTIVE dense reprojection factor (full masks, valid depth)
        shifts the PVGO solution -- covers the --reproj-points training
        wiring end to end at the solve level."""
        from islam_tpu.ops.dense_ba import DenseReprojectionLoss
        from islam_tpu.pvgo.run import run_pvgo
        from tests.test_pvgo import make_problem, B

        p = make_problem(noise=0.02)
        H, W = 16, 24
        fx = fy = 20.0
        depth = 5.0 * np.ones((B, H, W), np.float32)
        # flow inconsistent with the VO motions -> nonzero residual
        flow = 0.5 * np.ones((B, 2, H, W), np.float32)
        reproj = DenseReprojectionLoss(
            depth, flow, fx, fy, W / 2, H / 2,
            np.ones((B, H, W), bool),
            np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))
        common = (p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
                  p["vo_motions"], p["links"], p["dts"],
                  p["imu_drots"], p["imu_dtrans"], p["imu_dvels"])
        _, _, nodes_r, _, covs = run_pvgo(
            *common, loss_weight=(1.0, 0.1, 10.0, 0.1, 50.0),
            reproj=reproj, target="vo")
        _, _, nodes_0, _, _ = run_pvgo(
            *common, loss_weight=(1.0, 0.1, 10.0, 0.1), target="vo")
        assert np.isfinite(np.asarray(nodes_r)).all()
        assert "reproj" in covs
        assert not np.allclose(np.asarray(nodes_r), np.asarray(nodes_0),
                               atol=1e-6)


class TestJoinFlow:
    def test_zero_flows_interior(self):
        """The reference's join_flow normalizes without the half-pixel
        offset (TartanVO.py:231-232), so chaining k zero flows yields a
        constant -0.5 shift per hop in the interior -- reproduce exactly
        that, not zero."""
        from islam_tpu.ops.warp import join_flow

        flows = [jnp.zeros((2, 8, 12))]
        out = np.asarray(join_flow(flows, 8, 12))
        np.testing.assert_allclose(out[:, 2:-2, 2:-2], -0.5, atol=1e-4)
