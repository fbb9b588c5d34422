"""Bi-level coupling modes: detached (reference), implicit (IFT), unrolled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islam_tpu.pvgo.run import run_pvgo
from tests.test_pvgo import make_problem, B


def _loss(mode, vo_data, p, target="vo"):
    trans_loss, rot_loss, nodes, vels, _ = run_pvgo(
        p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
        vo_data, p["links"], p["dts"],
        p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
        loss_weight=(1.0, 0.1, 10.0, 0.1), target=target, bilevel=mode)
    return jnp.sum(trans_loss) + jnp.sum(rot_loss), nodes


class TestBilevelModes:
    @pytest.mark.parametrize("mode", ["implicit", "unrolled"])
    def test_solution_matches_detached(self, mode):
        p = make_problem(noise=0.02)
        _, nodes_det = _loss("detached", p["vo_motions"].data, p)
        _, nodes_alt = _loss(mode, p["vo_motions"].data, p)
        np.testing.assert_allclose(np.asarray(nodes_alt),
                                   np.asarray(nodes_det), atol=5e-3)

    @pytest.mark.parametrize("mode", ["implicit", "unrolled"])
    def test_gradients_flow_and_finite(self, mode):
        p = make_problem(noise=0.02)
        g = jax.grad(lambda v: _loss(mode, v, p)[0])(p["vo_motions"].data)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0

    def test_implicit_grad_differs_from_detached(self):
        """The implicit gradient includes the solution's dependence on the
        measurements; it must differ from the detached gradient."""
        p = make_problem(noise=0.05)
        g_det = np.asarray(jax.grad(
            lambda v: _loss("detached", v, p)[0])(p["vo_motions"].data))
        g_imp = np.asarray(jax.grad(
            lambda v: _loss("implicit", v, p)[0])(p["vo_motions"].data))
        assert np.abs(g_det - g_imp).max() > 1e-6

    def test_implicit_grad_correct_vs_unrolled(self):
        """IFT gradients should approximate fully-unrolled autodiff
        gradients at a converged solution."""
        p = make_problem(noise=0.02)
        g_imp = np.asarray(jax.grad(
            lambda v: _loss("implicit", v, p)[0])(p["vo_motions"].data))
        g_unr = np.asarray(jax.grad(
            lambda v: _loss("unrolled", v, p)[0])(p["vo_motions"].data))
        denom = np.abs(g_unr).max()
        assert np.abs(g_imp - g_unr).max() / max(denom, 1e-12) < 0.15


def _make_reproj(seed=3, n=6):
    """Tiny SparseReprojectionLoss consistent with the make_problem shapes
    (B edges)."""
    from islam_tpu.ops.dense_ba import SparseReprojectionLoss

    H_, W_ = 16, 24
    rng = np.random.default_rng(seed)
    depth = (5.0 + rng.uniform(0, 1, (B, H_, W_))).astype(np.float32)
    flow = (rng.normal(size=(B, 2, H_, W_)) * 0.5).astype(np.float32)
    pts = np.stack([rng.uniform(2, W_ - 3, (B, n)),
                    rng.uniform(2, H_ - 3, (B, n))], axis=-1).astype(np.float32)
    eye = jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)
    return SparseReprojectionLoss(pts, depth, flow, 10.0, 10.0,
                                  W_ / 2, H_ / 2, eye)


class TestBilevelReproj:
    """Round-4 advisor: implicit/unrolled modes must solve the SAME
    lower-level objective as detached mode when a reprojection factor is
    attached — previously residual_theta silently dropped the reproj block."""

    W5 = (1.0, 0.1, 10.0, 0.1, 0.5)

    def _solve(self, mode, vo_data, p, reproj):
        trans_loss, rot_loss, nodes, vels, _ = run_pvgo(
            p["gt_poses"].data, jnp.asarray(p["gt_vels"]),
            vo_data, p["links"], p["dts"],
            p["imu_drots"], p["imu_dtrans"], p["imu_dvels"],
            loss_weight=self.W5, reproj=reproj, target="vo", bilevel=mode)
        return jnp.sum(trans_loss) + jnp.sum(rot_loss), nodes

    @pytest.mark.parametrize("mode", ["implicit", "unrolled"])
    def test_same_objective_as_detached(self, mode):
        p = make_problem(noise=0.02)
        reproj = _make_reproj()
        _, nodes_det = self._solve("detached", p["vo_motions"].data, p, reproj)
        _, nodes_alt = self._solve(mode, p["vo_motions"].data, p, reproj)
        np.testing.assert_allclose(np.asarray(nodes_alt),
                                   np.asarray(nodes_det), atol=5e-3)
        # and the reproj factor actually moves the solution: solving
        # WITHOUT it must land elsewhere (guards against the block being
        # dropped from BOTH paths)
        _, nodes_no = self._solve(mode, p["vo_motions"].data, p, None)
        assert np.abs(np.asarray(nodes_no) - np.asarray(nodes_alt)).max() > 1e-5

    def test_implicit_grads_with_reproj(self):
        p = make_problem(noise=0.02)
        reproj = _make_reproj()
        g = jax.grad(lambda v: self._solve("implicit", v, p, reproj)[0])(
            p["vo_motions"].data)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0


class TestTrainStepBilevelWiring:
    """--bilevel reaches the jitted train step (round-4 task 6): the full
    imperative step compiles with implicit-mode coupling and its pose-head
    gradients are finite, nonzero, and different from detached-mode's."""

    def test_train_step_implicit(self):
        from islam_tpu import testing
        from islam_tpu.models import tartanvo as tvo
        from islam_tpu.train import train_step

        H, W, B = 64, 128, 2
        ds = testing.make_dataset(num_frames=B + 1, height=H, width=W)
        imu = testing.make_imu_module(ds, batch_frames=B)
        variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
        batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
        args = (jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
                imu.gravity, imu.accel_bias, imu.gyro_bias,
                jnp.asarray(False))
        common = dict(target="vo", datatype="kitti", correct_scale=False,
                      use_kitti_coord=True, denoise_accel=True,
                      denoise_gyro=False, loss_weight=(1.0, 0.1, 10.0, 0.1),
                      rot_w=1.0, trans_w=0.1)
        loss_i, grads_i, aux_i = train_step(
            variables, None, batch, win, init, *args,
            bilevel="implicit", **common)
        assert np.isfinite(float(loss_i)) and bool(aux_i["ok"])
        gi = np.concatenate([np.asarray(g).ravel() for g in
                             jax.tree_util.tree_leaves(grads_i)])
        assert np.isfinite(gi).all() and np.abs(gi).sum() > 0

        loss_d, grads_d, _ = train_step(
            variables, None, batch, win, init, *args,
            bilevel="detached", **common)
        gd = np.concatenate([np.asarray(g).ravel() for g in
                             jax.tree_util.tree_leaves(grads_d)])
        assert np.abs(gi - gd).max() > 1e-9, (
            "implicit-mode gradients are identical to detached-mode's; "
            "the bilevel flag is not reaching run_pvgo")

    def test_train_step_unrolled(self):
        """The third coupling mode through the FULL jitted step: unrolled
        GN iterations, reverse-differentiated end to end."""
        from islam_tpu import testing
        from islam_tpu.models import tartanvo as tvo
        from islam_tpu.train import train_step

        H, W, B = 64, 128, 2
        ds = testing.make_dataset(num_frames=B + 1, height=H, width=W)
        imu = testing.make_imu_module(ds, batch_frames=B)
        variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
        batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
        args = (jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
                imu.gravity, imu.accel_bias, imu.gyro_bias,
                jnp.asarray(False))
        common = dict(target="vo", datatype="kitti", correct_scale=False,
                      use_kitti_coord=True, denoise_accel=True,
                      denoise_gyro=False, loss_weight=(1.0, 0.1, 10.0, 0.1),
                      rot_w=1.0, trans_w=0.1)
        loss_u, grads_u, aux_u = train_step(
            variables, None, batch, win, init, *args,
            bilevel="unrolled", **common)
        assert np.isfinite(float(loss_u)) and bool(aux_u["ok"])
        gu = np.concatenate([np.asarray(g).ravel() for g in
                             jax.tree_util.tree_leaves(grads_u)])
        assert np.isfinite(gu).all() and np.abs(gu).sum() > 0
