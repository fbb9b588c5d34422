"""Smaller subsystems: visualization, timer, resume, join_flow API."""

import os
import time

import numpy as np
import pytest


class TestVisualization:
    def test_visflow_visdepth(self):
        from islam_tpu.utils.visualization import visdepth, visflow

        flow = np.random.default_rng(0).normal(size=(16, 20, 2)).astype(
            np.float32) * 10
        img = visflow(flow)
        assert img.shape == (16, 20, 3) and img.dtype == np.uint8
        disp = np.random.default_rng(1).uniform(0, 50, (16, 20))
        d = visdepth(disp)
        assert d.shape == (16, 20) and d.dtype == np.uint8

    def test_save_images(self, tmp_path):
        from islam_tpu.utils.visualization import save_images

        rgb = np.random.default_rng(2).uniform(0, 1, (2, 8, 10, 3))
        save_images(str(tmp_path), rgb, prefix="t")
        assert (tmp_path / "t0.png").exists()
        assert (tmp_path / "t1.png").exists()

    def test_warp_images(self, tmp_path):
        from islam_tpu.utils.visualization import warp_images

        rgb = np.random.default_rng(3).uniform(0, 1, (1, 32, 40, 3))
        flow = np.zeros((1, 8, 10, 2), np.float32)
        out = warp_images(str(tmp_path), rgb, flow)
        assert out.shape[0] == 1
        assert (tmp_path / "0_warp.png").exists()


class TestTimer:
    def test_tic_toc(self):
        from islam_tpu.utils.timer import Timer

        t = Timer()
        t.tic("a")
        time.sleep(0.01)
        dt = t.toc("a")
        assert dt >= 0.01
        assert t.last("a") == dt
        assert t.avg("a") == pytest.approx(dt)
        assert t.tot("a") == pytest.approx(dt)
        assert t.toc("never") == 0.0


class TestResume:
    def test_trainer_save_and_resume(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from islam_tpu import testing
        from islam_tpu.train import Trainer

        ds = testing.make_dataset(num_frames=3, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        t1 = Trainer(Args(), ds)
        # perturb then save as epoch 3
        t1.vo_variables = jax.tree_util.tree_map(
            lambda x: x + 1.0 if x.dtype == jnp.float32 else x,
            t1.vo_variables)
        t1.save_models(str(tmp_path), 3)

        t2 = Trainer(Args(), ds)
        step = t2.resume(str(tmp_path), start_epoch=5)
        assert step == 3
        a = jax.tree_util.tree_leaves(t1.vo_variables["params"])[0]
        b = jax.tree_util.tree_leaves(t2.vo_variables["params"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_optimizer_state_round_trips(self, tmp_path):
        """Adam moments survive save/resume (beyond the reference's
        state_dict-only checkpoints)."""
        import jax
        import jax.numpy as jnp
        from islam_tpu import testing
        from islam_tpu.train import Trainer

        ds = testing.make_dataset(num_frames=3, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        t1 = Trainer(Args(), ds)
        # fake a non-trivial opt state (as after one epoch's update)
        t1.vo_opt_state = jax.tree_util.tree_map(
            lambda x: x + 0.5 if hasattr(x, "dtype")
            and x.dtype == jnp.float32 else x,
            t1.vo_opt_state)
        t1.save_models(str(tmp_path), 2)

        t2 = Trainer(Args(), ds)
        assert t2.resume(str(tmp_path), start_epoch=4) == 2
        for a, b in zip(jax.tree_util.tree_leaves(t1.vo_opt_state),
                        jax.tree_util.tree_leaves(t2.vo_opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_resume_none_when_no_checkpoint(self, tmp_path):
        from islam_tpu.utils.checkpoints import latest_checkpoint_step

        assert latest_checkpoint_step(str(tmp_path), 5) is None

    def test_resume_restores_denoiser_into_trainer_without_one(self,
                                                               tmp_path):
        """Round-4 advisor (single-chip variant): a checkpoint carrying a
        denoiser restored into a Trainer built without one must widen the
        restore template (not silently drop the denoiser) and create the
        IMU optimizer so the next imu epoch can update."""
        import jax
        from islam_tpu import testing
        from islam_tpu.imu import denoiser as dn
        from islam_tpu.train import Trainer

        ds = testing.make_dataset(num_frames=3, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        t1 = Trainer(Args(), ds)
        t1.dn_params = dn.init_params(jax.random.PRNGKey(7))
        import optax
        t1.imu_opt = optax.adam(3e-5)
        t1.imu_opt_state = t1.imu_opt.init(t1.dn_params)
        t1.save_models(str(tmp_path), 1)

        t2 = Trainer(Args(), ds)  # no denoiser at construction
        assert t2.dn_params is None and not hasattr(t2, "imu_opt")
        assert t2.resume(str(tmp_path), start_epoch=2) == 1
        assert t2.dn_params is not None and hasattr(t2, "imu_opt")
        for a, b in zip(jax.tree_util.tree_leaves(t1.dn_params),
                        jax.tree_util.tree_leaves(t2.dn_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_resume_params_only_checkpoint(self, tmp_path, capsys):
        """A params-only save (older format / imported weights) restores the
        params and keeps fresh optimizer state, chosen by inspecting the
        checkpoint contents — NOT by swallowing a restore error."""
        import jax
        import jax.numpy as jnp
        from islam_tpu import testing
        from islam_tpu.train import Trainer
        from islam_tpu.utils import checkpoints as ckpt

        ds = testing.make_dataset(num_frames=3, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        t1 = Trainer(Args(), ds)
        t1.vo_variables = jax.tree_util.tree_map(
            lambda x: x + 2.0 if x.dtype == jnp.float32 else x,
            t1.vo_variables)
        ckpt.save_checkpoint(str(tmp_path), 2,
                             {"vo_variables": t1.vo_variables})

        t2 = Trainer(Args(), ds)
        assert t2.resume(str(tmp_path), start_epoch=4) == 2
        a = jax.tree_util.tree_leaves(t1.vo_variables["params"])[0]
        b = jax.tree_util.tree_leaves(t2.vo_variables["params"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        out = capsys.readouterr().out
        assert "vo_opt_state" in out  # announced the missing keys

    def test_resume_corrupt_checkpoint_raises(self, tmp_path):
        """Genuine corruption surfaces instead of silently degrading to a
        params-only restore (the old blanket-except behavior)."""
        import os
        from islam_tpu import testing
        from islam_tpu.train import Trainer
        from islam_tpu.utils import checkpoints as ckpt

        ds = testing.make_dataset(num_frames=3, height=64, width=128)

        class Args:
            batch_size = 2
            lr = 3e-6
            vo_optimizer = "adam"
            vo_model_name = ""
            pose_model_name = ""
            imu_denoise_model_name = ""
            loss_weight = (1.0, 0.1, 10.0, 0.1)
            rot_w = 1.0
            trans_w = 0.1
            use_gt_scale = False

        t1 = Trainer(Args(), ds)
        t1.save_models(str(tmp_path), 3)
        # corrupt: delete the array store but keep the tree metadata
        for root, _, files in os.walk(tmp_path / "3"):
            for f in files:
                if "checkpoint" not in f and "metadata" not in f:
                    os.unlink(os.path.join(root, f))
        t2 = Trainer(Args(), ds)
        with pytest.raises(Exception):
            t2.resume(str(tmp_path), start_epoch=5)


class TestPrefetcher:
    def test_success_path(self):
        from islam_tpu.train import Prefetcher

        p = Prefetcher(lambda k: k * 10)
        p.start(1)
        assert p.pending(1)
        assert p.take(1) == 10
        assert not p.pending(1)

    def test_failure_propagates_original_error(self):
        """A loader raising in the worker thread re-raises at take() with
        the real exception chained (regression: used to die silently and
        crash later with a KeyError)."""
        from islam_tpu.train import Prefetcher

        def bad(k):
            raise ValueError(f"decode failed on window {k}")

        p = Prefetcher(bad)
        p.start(7)
        with pytest.raises(RuntimeError, match="item 7 failed") as ei:
            p.take(7)
        assert isinstance(ei.value.__cause__, ValueError)
        assert "decode failed on window 7" in str(ei.value.__cause__)


class TestEvaluateScript:
    def test_evaluate_result_dir(self, tmp_path):
        """scripts/evaluate.py computes ATE/RPE per (epoch, kind) from a
        snapshot directory layout (train.py:51-61 format)."""
        import json
        import os
        import subprocess
        import sys

        rng = np.random.default_rng(3)
        n = 12
        t = np.cumsum(rng.normal(scale=0.1, size=(n, 3)), axis=0)
        q = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
        gt = np.hstack([t, q])
        np.savetxt(tmp_path / "gt_pose.txt", gt)
        os.makedirs(tmp_path / "1")
        est = gt.copy()
        est[:, :3] += rng.normal(scale=0.01, size=(n, 3))
        np.savetxt(tmp_path / "1" / "pgo_pose.txt", est)

        script = os.path.join(os.path.dirname(__file__), "..",
                              "scripts", "evaluate.py")
        out = subprocess.run([sys.executable, script, str(tmp_path)],
                             capture_output=True, text=True, check=True)
        lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
        rec = next(l for l in lines if l.get("kind") == "pgo_pose")
        assert rec["epoch"] == 1 and rec["frames"] == n
        assert 0 < rec["ate"] < 0.05 and rec["rpe_rot"] < 1e-6
        assert any("best_pgo_pose" in l for l in lines)


class TestBenchFlopsConstant:
    def test_mfu_constant_matches_analytic_tool(self):
        """bench.py's MODEL_TFLOPS_FALLBACK must track the analytic FLOPs
        tool at the full bench shapes (VERDICT r2 weak #4: a hard-coded
        constant silently staling the MFU line of every BENCH JSON).
        Tracing is abstract (no compile, no device), so re-deriving the
        full-shape number is fast-sweep safe."""
        import sys
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in sys.path:
            sys.path.insert(0, root)
        import bench
        from tools.flops_analysis import train_step_flops

        got = train_step_flops(bench.H, bench.W, bench.B)
        assert abs(got["model_tflops_per_step"]
                   - bench.MODEL_TFLOPS_FALLBACK) <= 1e-3, (
            f"bench.MODEL_TFLOPS_FALLBACK={bench.MODEL_TFLOPS_FALLBACK} "
            f"stale vs analytic {got['model_tflops_per_step']}")
