"""Multi-sequence mesh trainer on virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islam_tpu import testing
from islam_tpu.parallel.mesh import make_mesh
from islam_tpu.parallel.trainer import MultiSequenceTrainer


class TestMultiSequenceTrainer:
    def test_epoch_on_2_device_mesh(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        n = 2
        datasets = [testing.make_dataset(num_frames=5, height=64, width=128,
                                         seed=s) for s in range(n)]
        trainer = MultiSequenceTrainer(
            datasets, batch_size=2, lr=3e-6, mesh=make_mesh(n))
        before = jax.tree_util.tree_leaves(
            trainer.vo_variables["params"]["flowPoseNet"])[0].copy()
        losses = trainer.run_epoch()
        assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
        after = jax.tree_util.tree_leaves(
            trainer.vo_variables["params"]["flowPoseNet"])[0]
        assert float(jnp.sum(jnp.abs(after - before))) > 0
        # per-sequence state carries diverge (independent trajectories)
        s0 = np.asarray(trainer._init_states[0]["pos"])
        s1 = np.asarray(trainer._init_states[1]["pos"])
        assert not np.allclose(s0, s1)

    def test_scan_chunk_matches_per_window(self):
        """multi_sequence_train_scan (K windows fused per sequence) must
        reproduce the per-window stepping: same updated params, same
        epoch-end state carries."""
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        n = 2

        def make():
            datasets = [testing.make_dataset(num_frames=5, height=64,
                                             width=128, seed=s)
                        for s in range(n)]
            return MultiSequenceTrainer(datasets, batch_size=2, lr=3e-6,
                                        mesh=make_mesh(n))

        t_ref = make()
        losses_ref = t_ref.run_epoch()
        t_scan = make()
        losses_scan = t_scan.run_epoch(scan_chunk=2)

        np.testing.assert_allclose(losses_scan, losses_ref, atol=1e-5)
        for a, b in zip(
                jax.tree_util.tree_leaves(
                    t_scan.vo_variables["params"]["flowPoseNet"]),
                jax.tree_util.tree_leaves(
                    t_ref.vo_variables["params"]["flowPoseNet"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for s in range(n):
            for k in ("pos", "rot", "vel"):
                np.testing.assert_allclose(
                    np.asarray(t_scan._init_states[s][k]),
                    np.asarray(t_ref._init_states[s][k]), atol=1e-4)


class TestMultiHostHelpers:
    def test_global_mesh_single_process(self):
        from islam_tpu.parallel.mesh import make_global_mesh

        mesh = make_global_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("seq",)

    def test_host_local_batch_slice_single_process(self):
        from islam_tpu.parallel.mesh import host_local_batch_slice

        s = host_local_batch_slice(8)
        assert (s.start, s.stop) == (0, 8)
