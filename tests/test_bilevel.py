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
