"""Network tests: shapes + numerical parity against the reference torch
models with imported weights (the weight-import oracle).

The reference repo at /root/reference is used purely as a TEST ORACLE (its
torch modules are instantiated with random weights and compared against our
JAX rebuild after weight conversion).  Tests skip gracefully if the
reference or torch is unavailable.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

if HAS_REF and REF not in sys.path:
    sys.path.insert(0, REF)

# Stub cupy/pypose so reference modules import on a CPU-only test box.
for _name in ("cupy", "pypose"):
    if _name not in sys.modules:
        stub = types.ModuleType(_name)
        if _name == "cupy":
            stub.memoize = lambda **kw: (lambda f: f)
        else:
            stub.module = types.SimpleNamespace(IMUPreintegrator=object)
        sys.modules[_name] = stub

try:
    import torch
    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False

needs_oracle = pytest.mark.skipif(not (HAS_REF and HAS_TORCH),
                                  reason="reference oracle unavailable")


def torch_correlation_oracle(tenFirst=None, tenSecond=None, md=4):
    """Independent torch implementation of the local correlation spec
    (cost volume over a (2md+1)^2 displacement window, mean over channels)."""
    f1, f2 = tenFirst, tenSecond
    B, C, H, W = f1.shape
    f2p = torch.nn.functional.pad(f2, (md, md, md, md))
    outs = []
    for dy in range(2 * md + 1):
        for dx in range(2 * md + 1):
            outs.append((f1 * f2p[:, :, dy:dy + H, dx:dx + W]).mean(dim=1))
    return torch.stack(outs, dim=1)


def to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestCorrelation:
    def test_matches_oracle(self):
        if not HAS_TORCH:
            pytest.skip("torch needed for oracle")
        from islam_tpu.ops.correlation import correlation_reference

        rng = np.random.default_rng(0)
        f1 = rng.normal(size=(2, 8, 12, 16)).astype(np.float32)
        f2 = rng.normal(size=(2, 8, 12, 16)).astype(np.float32)
        ours = np.asarray(correlation_reference(jnp.asarray(f1),
                                                jnp.asarray(f2)))
        ref = torch_correlation_oracle(torch.tensor(f1),
                                       torch.tensor(f2)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_grad_finite(self):
        from islam_tpu.ops.correlation import correlation_reference

        rng = np.random.default_rng(1)
        f1 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        g1, g2 = jax.grad(
            lambda a, b: jnp.sum(correlation_reference(a, b) ** 2),
            argnums=(0, 1))(f1, f2)
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()


class TestWarp:
    @needs_oracle
    def test_flow_warp_matches_torch(self):
        from islam_tpu.ops.warp import flow_warp

        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 16, 20)).astype(np.float32)
        flo = (rng.normal(size=(2, 2, 16, 20)) * 2).astype(np.float32)
        ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flo)))

        # torch oracle: same spec as PWCNet.warp
        tx, tflo = torch.tensor(x), torch.tensor(flo)
        B, C, H, W = tx.shape
        xx = torch.arange(W).view(1, -1).repeat(H, 1)
        yy = torch.arange(H).view(-1, 1).repeat(1, W)
        grid = torch.cat([xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
                          yy.view(1, 1, H, W).repeat(B, 1, 1, 1)], 1).float()
        vgrid = grid + tflo
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
        vgrid = vgrid.permute(0, 2, 3, 1)
        out = torch.nn.functional.grid_sample(tx, vgrid, align_corners=True)
        mask = torch.nn.functional.grid_sample(
            torch.ones_like(tx), vgrid, align_corners=True)
        mask = (mask >= 0.9999).float()
        ref = (out * mask).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestVOFlowNetParity:
    @needs_oracle
    def test_forward_matches_torch(self):
        from Network.VOFlowNet import VOFlowRes as TorchVOFlow
        from islam_tpu.models.voflownet import VOFlowRes
        from islam_tpu.utils.checkpoints import import_torch_weights

        torch.manual_seed(0)
        tmodel = TorchVOFlow(intrinsic=True, down_scale=True, config=1,
                             stereo=0).eval()
        sd = to_numpy_sd(tmodel)

        model = VOFlowRes()
        x = np.random.default_rng(3).normal(
            size=(2, 112, 160, 4)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = import_torch_weights(variables, sd)

        ours = np.asarray(model.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            ref = tmodel(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestPWCNetParity:
    @needs_oracle
    def test_forward_matches_torch(self):
        import Network.PWC.PWCNet as torch_pwc
        from islam_tpu.models.pwcnet import PWCDCNet
        from islam_tpu.utils.checkpoints import import_torch_weights

        torch_pwc.FunctionCorrelation = torch_correlation_oracle
        torch.manual_seed(1)
        tmodel = torch_pwc.PWCDCNet(uncertainty=False).eval()

        # The reference warp hard-codes .cuda() (PWCNet.py:196); swap in a
        # CPU-safe oracle with identical semantics.
        import types as _types

        def cpu_warp(self, x, flo):
            B, C, H, W = x.size()
            xx = torch.arange(W).view(1, -1).repeat(H, 1)
            yy = torch.arange(H).view(-1, 1).repeat(1, W)
            grid = torch.cat([xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
                              yy.view(1, 1, H, W).repeat(B, 1, 1, 1)],
                             1).float()
            vgrid = grid + flo
            vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
            vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
            vgrid = vgrid.permute(0, 2, 3, 1)
            out = torch.nn.functional.grid_sample(x, vgrid,
                                                  align_corners=True)
            mask = torch.nn.functional.grid_sample(
                torch.ones_like(x), vgrid, align_corners=True)
            mask = (mask >= 0.9999).float()
            return out * mask

        tmodel.warp = _types.MethodType(cpu_warp, tmodel)
        sd = to_numpy_sd(tmodel)

        model = PWCDCNet()
        x = np.random.default_rng(4).normal(
            size=(1, 128, 192, 6)).astype(np.float32) * 0.3
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = import_torch_weights(variables, sd)

        flows, _ = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            tflows, _ = tmodel(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        for ours_f, ref_f in zip(flows, tflows):
            ref_np = ref_f.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(ours_f), ref_np, atol=5e-4)


class TestPWCNetUncertaintyParity:
    @needs_oracle
    def test_forward_matches_torch_with_uncertainty(self):
        import Network.PWC.PWCNet as torch_pwc
        from islam_tpu.models.pwcnet import PWCDCNet
        from islam_tpu.utils.checkpoints import import_torch_weights

        torch_pwc.FunctionCorrelation = torch_correlation_oracle
        torch.manual_seed(4)
        tmodel = torch_pwc.PWCDCNet(uncertainty=True).eval()

        import types as _types

        def cpu_warp(self, x, flo):
            B, C, H, W = x.size()
            xx = torch.arange(W).view(1, -1).repeat(H, 1)
            yy = torch.arange(H).view(-1, 1).repeat(1, W)
            grid = torch.cat([xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
                              yy.view(1, 1, H, W).repeat(B, 1, 1, 1)],
                             1).float()
            vgrid = grid + flo
            vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
            vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
            out = torch.nn.functional.grid_sample(
                x, vgrid.permute(0, 2, 3, 1), align_corners=True)
            mask = torch.nn.functional.grid_sample(
                torch.ones_like(x), vgrid.permute(0, 2, 3, 1),
                align_corners=True)
            return out * (mask >= 0.9999).float()

        tmodel.warp = _types.MethodType(cpu_warp, tmodel)
        sd = to_numpy_sd(tmodel)

        model = PWCDCNet(uncertainty=True)
        x = np.random.default_rng(7).normal(
            size=(1, 64, 128, 6)).astype(np.float32) * 0.3
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = import_torch_weights(variables, sd)

        (flows, uncs) = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            tflows, tuncs = tmodel(
                torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        for ours_f, ref_f in zip(flows, tflows):
            np.testing.assert_allclose(
                np.asarray(ours_f), ref_f.numpy().transpose(0, 2, 3, 1),
                atol=5e-4)
        for ours_u, ref_u in zip(uncs, tuncs):
            np.testing.assert_allclose(
                np.asarray(ours_u), ref_u.numpy().transpose(0, 2, 3, 1),
                atol=5e-4)


class TestStereoNetParity:
    @needs_oracle
    def test_forward_matches_torch(self):
        from Network.StereoNet7 import StereoNet7 as TorchStereo
        from islam_tpu.models.stereonet import StereoNet7
        from islam_tpu.utils.checkpoints import import_torch_weights

        torch.manual_seed(2)
        tmodel = TorchStereo()
        tmodel.train()  # batch-stat BN, as the reference runs it
        sd = to_numpy_sd(tmodel)

        model = StereoNet7(train_bn=True)
        x = np.random.default_rng(5).normal(
            size=(1, 256, 320, 6)).astype(np.float32) * 0.3
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = import_torch_weights(variables, sd)

        (disp, _), _ = model.apply(variables, jnp.asarray(x),
                                   mutable=["batch_stats"])
        with torch.no_grad():
            tdisp, _ = tmodel(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        ref = tdisp.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(disp), ref, atol=2e-3)

    @needs_oracle
    def test_forward_matches_torch_eval_bn(self):
        """--frozen-bn-eval semantics (docs/PARITY.md C8): running-average
        BN must match torch's .eval() forward.  The running stats are made
        nontrivial by a train-mode torch forward before the export."""
        from Network.StereoNet7 import StereoNet7 as TorchStereo
        from islam_tpu.models.stereonet import StereoNet7
        from islam_tpu.utils.checkpoints import import_torch_weights

        torch.manual_seed(2)
        tmodel = TorchStereo()
        rng = np.random.default_rng(6)
        warm = rng.normal(size=(1, 6, 256, 320)).astype(np.float32) * 0.3
        tmodel.train()
        with torch.no_grad():  # moves running_mean/var off their init
            tmodel(torch.tensor(warm))
        tmodel.eval()
        sd = to_numpy_sd(tmodel)

        model = StereoNet7(train_bn=False)
        x = rng.normal(size=(1, 256, 320, 6)).astype(np.float32) * 0.3
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = import_torch_weights(variables, sd)

        (disp, _) = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            tdisp, _ = tmodel(torch.tensor(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        ref = tdisp.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(disp), ref, atol=2e-3)


class TestDenoiserParity:
    @needs_oracle
    def test_matches_torch(self):
        from Network.IMUDenoiseNet import IMUCorrector_CNN_GRU_WO_COV
        from islam_tpu.imu import denoiser as dn

        torch.manual_seed(3)
        tmodel = IMUCorrector_CNN_GRU_WO_COV().eval()
        sd = to_numpy_sd(tmodel)

        params = {
            "conv1": {"weight": jnp.asarray(sd["conv1.weight"]),
                      "bias": jnp.asarray(sd["conv1.bias"])},
            "gru": {k: jnp.asarray(sd[f"gru.{k}"])
                    for k in ("weight_ih_l0", "weight_hh_l0",
                              "bias_ih_l0", "bias_hh_l0")},
            "decoder": {
                "0": {"weight": jnp.asarray(sd["pose_decoder.0.weight"]),
                      "bias": jnp.asarray(sd["pose_decoder.0.bias"])},
                "2": {"weight": jnp.asarray(sd["pose_decoder.2.weight"]),
                      "bias": jnp.asarray(sd["pose_decoder.2.bias"])},
            },
        }

        rng = np.random.default_rng(6)
        S = 87
        acc = rng.normal(size=(S, 3)).astype(np.float32)
        gyro = rng.normal(size=(S, 3)).astype(np.float32)
        with torch.no_grad():
            t_acc, t_gyro, _, _ = tmodel(
                {"acc": torch.tensor(acc), "gyro": torch.tensor(gyro)},
                eval=True)

        S_pad = 90
        acc_p = np.zeros((S_pad, 3), np.float32)
        gyro_p = np.zeros((S_pad, 3), np.float32)
        acc_p[:S] = acc
        gyro_p[:S] = gyro
        o_acc, o_gyro = dn.denoise(params, jnp.asarray(acc_p),
                                   jnp.asarray(gyro_p), jnp.asarray(S))
        np.testing.assert_allclose(np.asarray(o_acc[:S]), t_acc.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(o_gyro[:S]), t_gyro.numpy(),
                                   atol=1e-4)


class TestPSMNetParity:
    """Torch-oracle parity of the PSMNet alternates (Network/PSM/{basic,
    stackhourglass}.py).  The reference hard-codes .cuda() in its cost
    volume and disparityregression (stackhourglass.py:117, submodule.py:59),
    so the oracle runs with Tensor.cuda patched to the identity.  basic.py
    additionally cannot run as-is under Python 3 (``range(self.maxdisp/4)``
    with float division, basic.py:71) -- its oracle is loaded from source
    with that single expression patched to integer division."""

    @needs_oracle
    def test_stackhourglass_matches_torch(self, monkeypatch):
        from Network.PSM.stackhourglass import PSMNet as TorchPSM
        from islam_tpu.models.psmnet import PSMNetStackHourglass
        from islam_tpu.utils.checkpoints import import_torch_weights

        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **kw: self)

        torch.manual_seed(7)
        tmodel = TorchPSM(maxdisp=16).eval()
        sd = to_numpy_sd(tmodel)

        model = PSMNetStackHourglass(maxdisp=16, train_bn=False)
        # feature pyramid pools need >=256px inputs (AvgPool2d((64,64)) on
        # the 1/4-res map, submodule.py:86-88)
        x = np.random.default_rng(8).normal(
            size=(1, 256, 256, 6)).astype(np.float32) * 0.3
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        n_params = len(jax.tree_util.tree_leaves(variables))
        variables = import_torch_weights(variables, sd)

        disp, _ = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            tdisp, _ = tmodel(torch.tensor(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        diff = np.abs(np.asarray(disp) - tdisp.numpy())
        # random saturated weights leave a few near-tied softmax pixels where
        # f32 noise amplifies; require exactness everywhere else
        assert np.mean(diff) < 1e-3
        assert np.percentile(diff, 99.9) < 5e-3
        assert diff.max() < 0.05

    @needs_oracle
    def test_basic_matches_torch(self, monkeypatch):
        from islam_tpu.models.psmnet import PSMNetBasic
        from islam_tpu.utils.checkpoints import import_torch_weights

        # Load basic.py from source with its Python-3 bug patched (float
        # division in a range()/torch.zeros size, basic.py:66,71); the
        # relative `from .submodule import *` resolves via __package__.
        path = os.path.join(REF, "Network", "PSM", "basic.py")
        with open(path) as f:
            src = f.read().replace("self.maxdisp/4", "self.maxdisp//4")
        import types as _types

        import Network.PSM  # noqa: F401  (package context for the exec)
        mod = _types.ModuleType("Network.PSM._basic_py3fix")
        mod.__package__ = "Network.PSM"
        sys.modules[mod.__name__] = mod
        exec(compile(src, path, "exec"), mod.__dict__)

        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **kw: self)

        torch.manual_seed(9)
        tmodel = mod.PSMNet(maxdisp=16).eval()
        sd = to_numpy_sd(tmodel)

        model = PSMNetBasic(maxdisp=16, train_bn=False)
        rng = np.random.default_rng(10)
        left = (rng.normal(size=(1, 256, 256, 3)) * 0.3).astype(np.float32)
        right = (rng.normal(size=(1, 256, 256, 3)) * 0.3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                               jnp.asarray(right))
        variables = import_torch_weights(variables, sd)

        disp = model.apply(variables, jnp.asarray(left), jnp.asarray(right))
        with torch.no_grad():
            tdisp = tmodel(
                torch.tensor(np.ascontiguousarray(left.transpose(0, 3, 1, 2))),
                torch.tensor(np.ascontiguousarray(right.transpose(0, 3, 1, 2))))
        diff = np.abs(np.asarray(disp)[:, 0] - tdisp.numpy())
        assert np.mean(diff) < 1e-3
        assert np.percentile(diff, 99.9) < 5e-3
        assert diff.max() < 0.05
