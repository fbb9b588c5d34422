"""Full-step parity: the ONE jitted train_step vs a reference-faithful
torch/numpy composition (VERDICT round-1 item #2 — the closest in-env proxy
for the blocked real-data ATE runs).

The oracle chain reproduces /root/reference/train.py:204-283 end to end
with INDEPENDENT implementations at every stage:

  torch VONet fwd (the reference's own modules, shared weights)
  -> POSE_STD denorm + stereo scale recovery + tartan2kitti
     (torch replicas of TartanVO.py:108-196, differentiable)
  -> T_IL conjugation (train.py:214-215)
  -> sequential numpy IMU integration loop (imu_integrator.py:69-164)
  -> PyPose-replica LM on the numpy PVGO residuals (pvgo.py:26-64,169-180)
  -> vo_loss on detached converged nodes + torch backward
     (pvgo.py:67-78, train.py:279-283)

and asserts that loss, motions, IMU states, PVGO solution and the
POSE-HEAD PARAMETER GRADIENTS of the jitted train_step match.

Input sizes: the reference VOFlowNet config-1 FC head requires the final
feature map to be exactly 2x3 (VOFlowNet.py:219-224 comments), and
StereoNet7's SPP pools need >=256 px frames, so the smallest legal frame
is 320x576 (1/4-res flow 80x144).  The jax train_step compile at that
shape takes ~10 min on this one-core host — this suite is excluded from
the fast sweep like tests/test_models.py (see CLAUDE.md).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
if HAS_REF and REF not in sys.path:
    sys.path.insert(0, REF)

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
except ImportError:  # pragma: no cover
    HAS_TORCH = False

needs_oracle = pytest.mark.skipif(not (HAS_REF and HAS_TORCH),
                                  reason="reference oracle unavailable")

H, W, B = 320, 576, 2
LOSS_W = (1.0, 0.1, 10.0, 0.1)
ROT_W, TRANS_W = 1.0, 0.1


def _torch_correlation(tenFirst=None, tenSecond=None, md=4):
    f1, f2 = tenFirst, tenSecond
    _, _, hh, ww = f1.shape
    f2p = torch.nn.functional.pad(f2, (md, md, md, md))
    outs = []
    for dy in range(2 * md + 1):
        for dx in range(2 * md + 1):
            outs.append((f1 * f2p[:, :, dy:dy + hh, dx:dx + ww]).mean(dim=1))
    return torch.stack(outs, dim=1)


def _cpu_warp(self, x, flo):
    bb, _, hh, ww = x.size()
    xx = torch.arange(ww).view(1, -1).repeat(hh, 1)
    yy = torch.arange(hh).view(-1, 1).repeat(1, ww)
    grid = torch.cat([xx.view(1, 1, hh, ww).repeat(bb, 1, 1, 1),
                      yy.view(1, 1, hh, ww).repeat(bb, 1, 1, 1)], 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(ww - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(hh - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    out = torch.nn.functional.grid_sample(x, vgrid, align_corners=True)
    mask = torch.nn.functional.grid_sample(
        torch.ones_like(x), vgrid, align_corners=True)
    return out * (mask >= 0.9999).float()


def _np_align(nodes, vels, target):
    """run_pvgo's align_to (pvgo.py:114-119) in numpy."""
    from scipy.spatial.transform import Rotation

    src = nodes[0]
    corr_R = Rotation.from_quat(target[3:]) * Rotation.from_quat(
        src[3:]).inv()
    corr_t = target[:3] - corr_R.apply(src[:3])
    out = np.empty_like(nodes)
    out[:, :3] = corr_R.apply(nodes[:, :3]) + corr_t
    out[:, 3:] = (corr_R * Rotation.from_quat(nodes[:, 3:])).as_quat()
    return out, corr_R.apply(vels)


@pytest.fixture(scope="module")
def fullstep():
    """Run both chains once; tests assert on the pieces."""
    from scipy.spatial.transform import Rotation

    from islam_tpu.data.dataset import collate
    from islam_tpu.models import tartanvo as tvo
    from islam_tpu.models.layers import resize_bilinear
    from islam_tpu.ops.geometry import edge_mask
    from islam_tpu.pvgo.pypose_replica import pypose_lm_replica
    from islam_tpu.testing import (make_dataset, make_imu_module,
                                   make_step_inputs)
    from islam_tpu.train import train_step
    from islam_tpu.utils.checkpoints import import_torch_weights
    from oracle_helpers import (imu_integrate_loop, np_pvgo_residual_builder,
                                t_se3_inv, t_se3_mul, t_tartanvo_motion,
                                t_vo_loss)

    import Network.PWC.PWCNet as torch_pwc
    torch_pwc.FunctionCorrelation = _torch_correlation
    from Network.VONet import VONet as TorchVONet

    torch.manual_seed(0)
    tmodel = TorchVONet(fix_parts=("flow", "stereo"))
    tmodel.flowNet.warp = types.MethodType(_cpu_warp, tmodel.flowNet)
    # Untrained StereoNet disparities sit at ~+-0.25 (+-3 px), below the
    # KITTI disp>=5px validity threshold -> an empty scale-recovery system
    # (0/0 in the reference's gather form, dense_ba.py:159-173).  Bias the
    # disp head to a realistic ~12.5 px disparity; parity must hold for
    # ANY weights, so picking non-degenerate test weights is fair.
    with torch.no_grad():
        tmodel.stereoNet.conv_c13.bias += 1.0
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    ds = make_dataset(num_frames=5, height=H, width=W, seed=3)
    imu_mod = make_imu_module(ds, batch_frames=B)
    batch, imu_win, init_state = make_step_inputs(ds, imu_mod, 0, B)

    variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
    variables = import_torch_weights(variables, sd)

    T_IL_np = np.concatenate(
        [[0.1, -0.05, 0.2],
         Rotation.from_rotvec([0, 0, 0.1]).as_quat()]).astype(np.float32)

    # ---- jitted step ----
    loss_j, grads_j, aux_j = train_step(
        variables, None, batch, imu_win, init_state, jnp.asarray(T_IL_np),
        imu_mod.gravity, imu_mod.accel_bias, imu_mod.gyro_bias,
        jnp.asarray(False),
        target="vo", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=LOSS_W, rot_w=ROT_W, trans_w=TRANS_W)

    # ---- the edge mask is shared (its generation parity is covered by
    # TestCannyMaskDelta; here the contract is the compute chain) ----
    img_small = resize_bilinear(batch["img0"], (H // 4, W // 4),
                                align_corners=False)
    edge_np = np.asarray(edge_mask(jnp.moveaxis(img_small, -1, 1)))

    # ---- torch oracle chain ----
    sample = collate([ds[i] for i in range(0, B)])

    def t_nchw(x):
        return torch.tensor(np.ascontiguousarray(
            np.asarray(x).transpose(0, 3, 1, 2)), dtype=torch.float32)

    tmodel.train()
    flow, disp, pose = tmodel(
        t_nchw(sample["img0"]), t_nchw(sample["img1"]),
        t_nchw(sample["img0_norm"]), t_nchw(sample["img0_r_norm"]),
        t_nchw(sample["intrinsic"]))
    pose = pose * torch.tensor([0.13, 0.13, 0.13, 0.013, 0.013, 0.013])

    baseline = np.linalg.norm(np.asarray(sample["extrinsic"])[:, :3], axis=1)
    motions_t = t_tartanvo_motion(
        pose, flow.detach(), disp.detach(),
        np.asarray(sample["intrinsic_calib"]),
        torch.tensor(baseline, dtype=torch.float32),
        edge=torch.tensor(edge_np), datatype="kitti", correct_scale=False)
    T_IL_t = torch.tensor(T_IL_np)
    motions_t = t_se3_mul(T_IL_t, t_se3_mul(motions_t, t_se3_inv(T_IL_t)))

    # ---- IMU + PVGO oracles ----
    pos_w, rot_w, vel_w = imu_integrate_loop(
        ds.accels, ds.gyros, ds.imu_dts, ds.rgb2imu_sync, 0, B,
        ds.imu_init, ds.gravity)
    dpos, drot, dvel = imu_integrate_loop(
        ds.accels, ds.gyros, ds.imu_dts, ds.rgb2imu_sync, 0, B,
        ds.imu_init, ds.gravity, motion_mode=True)
    imu_poses_o = np.concatenate([pos_w, rot_w], axis=1)

    links = np.asarray(sample["link"])
    dts = np.asarray(sample["dt"], np.float64).reshape(-1)
    residual, jacobian = np_pvgo_residual_builder(
        links, motions_t.detach().numpy().astype(np.float64),
        drot, dpos, dvel, dts, LOSS_W)
    res = pypose_lm_replica(residual, jacobian, imu_poses_o, vel_w,
                            radius=1e4)
    nodes_al, vels_al = _np_align(res.nodes, res.vels, imu_poses_o[0])

    # ---- upper loss + torch backward ----
    trans_l, rot_l = t_vo_loss(nodes_al, links, motions_t)
    loss_t = ROT_W * rot_l.sum() + TRANS_W * trans_l.sum()
    loss_t.backward()

    gsd = {f"flowPoseNet.{k}": p.grad.numpy()
           for k, p in tmodel.flowPoseNet.named_parameters()
           if p.grad is not None}
    zero_tpl = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), variables)
    g_t = import_torch_weights(zero_tpl, gsd)["params"]["flowPoseNet"]

    return dict(
        loss_j=float(loss_j), loss_t=float(loss_t.detach()),
        grads_j=grads_j, grads_t=g_t, aux_j=aux_j,
        motions_t=motions_t.detach().numpy(),
        imu_poses_o=imu_poses_o, imu_vels_o=vel_w,
        pgo_nodes_o=nodes_al, pgo_vels_o=vels_al)


@needs_oracle
class TestFullStepParity:
    def test_motions(self, fullstep):
        """Front end: net fwd + denorm + scale recovery + conjugations.

        Rotation is tight (straight denorm of the pose head).  Translation
        = normalize(t) * s where s is the stereo least-squares scale; with
        untrained nets the flow is noise, so s (~0.017 here) is
        ill-conditioned and cross-framework f32 conv deltas move it a few
        1e-3 absolute.  The scale formula itself is pinned to 1e-6 rel on
        IDENTICAL inputs by the gather-form oracle in test_geometry; here
        the bound covers the end-to-end composition."""
        mo_j = np.asarray(fullstep["aux_j"]["motions"])
        mo_t = fullstep["motions_t"]
        q_sign = np.sign(np.sum(mo_j[:, 3:] * mo_t[:, 3:], axis=1))[:, None]
        mo_t = np.concatenate([mo_t[:, :3], mo_t[:, 3:] * q_sign], axis=1)
        np.testing.assert_allclose(mo_j[:, 3:], mo_t[:, 3:], atol=2e-4)
        np.testing.assert_allclose(mo_j[:, :3], mo_t[:, :3], atol=5e-3)

    def test_imu_states(self, fullstep):
        aux = fullstep["aux_j"]
        np.testing.assert_allclose(np.asarray(aux["imu_poses"]),
                                   fullstep["imu_poses_o"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(aux["imu_vels"]),
                                   fullstep["imu_vels_o"], atol=1e-4)

    def test_pvgo_solution(self, fullstep):
        """The two backends solve PVGO on their OWN front-end motions, so
        the front-end translation delta (test_motions) propagates into the
        solution; step-for-step LM parity on identical inputs is pinned by
        test_pvgo.  Bounds here cover the composed pipeline."""
        aux = fullstep["aux_j"]
        pg_j = np.asarray(aux["pgo_poses"])
        pg_o = fullstep["pgo_nodes_o"]
        q_sign = np.sign(np.sum(pg_j[:, 3:] * pg_o[:, 3:], axis=1))[:, None]
        pg_o = np.concatenate([pg_o[:, :3], pg_o[:, 3:] * q_sign], axis=1)
        np.testing.assert_allclose(pg_j, pg_o, atol=1e-2)
        np.testing.assert_allclose(np.asarray(aux["pgo_vels"]),
                                   fullstep["pgo_vels_o"], atol=5e-2)

    def test_loss(self, fullstep):
        assert fullstep["loss_t"] != 0.0
        rel = abs(fullstep["loss_j"] - fullstep["loss_t"]) / abs(
            fullstep["loss_t"])
        assert rel < 5e-3, (fullstep["loss_j"], fullstep["loss_t"])

    def test_pose_head_gradients(self, fullstep):
        """The imperative learning signal itself: d loss / d pose-head
        params, torch autograd through the reference nets vs jax grad
        through the jitted step (torch grads translated into the flax
        layout by the same importer that translates the weights)."""
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep["grads_j"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep["grads_t"])[0]
        assert len(flat_j) == len(flat_t)
        tot_j2 = tot_t2 = tot_dot = 0.0
        for (pj, gj), (pt, gt) in zip(flat_j, flat_t):
            assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
            gj = np.asarray(gj, np.float64)
            gt = np.asarray(gt, np.float64)
            nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
            tot_j2 += nj ** 2
            tot_t2 += nt ** 2
            tot_dot += float((gj * gt).sum())
            # Leaves with |g| ~1e-8 (the trans-head tail in this tiny-scale
            # regime) are dominated by cross-framework f32 noise; for those
            # direction (cosine) is the meaningful contract.
            if nt > 1e-6:
                rel = np.linalg.norm(gj - gt) / nt
                assert rel < 0.05, (jax.tree_util.keystr(pj), rel)
            elif nt > 1e-12 and nj > 1e-12:
                cos_leaf = float((gj * gt).sum()) / (nj * nt)
                assert cos_leaf > 0.999, (jax.tree_util.keystr(pj), cos_leaf)
        cos = tot_dot / max((tot_j2 ** 0.5) * (tot_t2 ** 0.5), 1e-30)
        assert cos > 0.999, cos
        assert tot_t2 > 0.0


# ---------------------------------------------------------------------------
# IMU-target full-step parity (VERDICT round-2 task #4)
# ---------------------------------------------------------------------------
# The second half of the bi-level loop (train.py:236-283 with
# train_target='imu'): denoiser forward inside the integration -> motion-mode
# deltas -> PVGO LM on detached inputs -> imu_loss on the converged nodes
# (pvgo.py:95-111) -> gradients into the DENOISER parameters.
#
# NOTE on reference semantics: imu_integrator.py:109 calls the denoiser with
# eval=True, whose `torch.set_grad_enabled(not eval)` guard BLOCKS gradients
# -- the reference's imu_optimizer.step() (train.py:176-179) therefore steps
# with denoiser .grad=None every epoch (a silent no-op).  This framework
# implements the documented INTENT (SURVEY.md imu_loss -> denoiser gradient
# path): the oracle below runs the reference's own IMUCorrector_CNN_GRU_WO_COV
# with grad enabled so torch autograd traces the identical chain.

IMU_H, IMU_W = 64, 128  # no VO forward in imu epochs (motions replayed)


def _t_motion_integrate(dts, gyros, accels, frame_slices, init_rot, gravity):
    """Differentiable torch replica of the reference's per-frame motion-mode
    integration (imu_integrator.py:116-164): pos/vel restart at zero each
    frame, rotation carries; Euler zero-order hold per sample."""
    from oracle_helpers import (t_quat_inv, t_quat_mul, t_quat_rotate,
                                t_so3_exp)

    g_w = torch.tensor([0.0, 0.0, -float(gravity)], dtype=torch.float64)
    rot = init_rot.to(torch.float64)
    drots, dposs, dvels = [], [], []
    for s, e in frame_slices:
        pos = torch.zeros(3, dtype=torch.float64)
        vel = torch.zeros(3, dtype=torch.float64)
        r = rot
        for k in range(s, e):
            dt = dts[k]
            a_w = t_quat_rotate(r, accels[k]) + g_w
            pos = pos + vel * dt + 0.5 * a_w * dt * dt
            vel = vel + a_w * dt
            r = t_quat_mul(r, t_so3_exp(gyros[k] * dt))
        drots.append(t_quat_mul(t_quat_inv(rot), r))
        dposs.append(pos)
        dvels.append(vel)
        rot = r
    return (torch.stack(drots), torch.stack(dposs), torch.stack(dvels))


@pytest.fixture(scope="module")
def fullstep_imu():
    from islam_tpu.imu import denoiser as jdn
    from islam_tpu.pvgo.pypose_replica import pypose_lm_replica
    from islam_tpu.testing import (make_dataset, make_imu_module,
                                   make_step_inputs)
    from islam_tpu.train import _import_denoiser, train_step
    from oracle_helpers import (imu_integrate_loop, np_pvgo_residual_builder,
                                t_quat_inv, t_quat_log, t_quat_mul,
                                t_quat_rotate, t_so3_exp)
    from scipy.spatial.transform import Rotation

    from Network.IMUDenoiseNet import IMUCorrector_CNN_GRU_WO_COV

    torch.manual_seed(1)
    tden = IMUCorrector_CNN_GRU_WO_COV()
    sd = {k: v.detach().numpy() for k, v in tden.state_dict().items()}
    dn_params = _import_denoiser(None, sd)

    ds = make_dataset(num_frames=5, height=IMU_H, width=IMU_W, seed=7)
    imu_mod = make_imu_module(ds, batch_frames=B)
    batch, imu_win, init_state = make_step_inputs(ds, imu_mod, 0, B)

    # Replayed VO motions (imu epochs skip the VO forward, train.py:204-208):
    # GT relative poses, identical constants on both sides.
    P = np.asarray(ds.poses, np.float64)
    motions_np = np.empty((B, 7), np.float32)
    for i in range(B):
        Ra = Rotation.from_quat(P[i, 3:])
        Rb = Rotation.from_quat(P[i + 1, 3:])
        rel_R = Ra.inv() * Rb
        motions_np[i, :3] = Ra.inv().apply(P[i + 1, :3] - P[i, :3])
        motions_np[i, 3:] = rel_R.as_quat()

    # ---- jitted step (target='imu': grads w.r.t. denoiser params) ----
    loss_j, grads_j, aux_j = train_step(
        {}, dn_params, batch, imu_win, init_state,
        jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
        imu_mod.gravity, imu_mod.accel_bias, imu_mod.gyro_bias,
        jnp.asarray(False),
        target="imu", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=LOSS_W, rot_w=ROT_W, trans_w=TRANS_W,
        prev_motions=jnp.asarray(motions_np))

    # ---- torch oracle ----
    sync = np.asarray(ds.rgb2imu_sync)
    i0, i1 = int(sync[0]), int(sync[B]) + 1
    acc_w = torch.tensor(np.asarray(ds.accels[i0:i1]), dtype=torch.float32)
    gyr_w = torch.tensor(np.asarray(ds.gyros[i0:i1]), dtype=torch.float32)
    # grad ENABLED (see module note); kitti => denoise accel only
    dacc, dgyr, _, _ = tden({"acc": acc_w, "gyro": gyr_w}, eval=False)
    acc_used = dacc
    gyr_used = gyr_w

    dts_np = np.asarray(ds.imu_dts, np.float64)
    if dts_np.shape[0] < np.asarray(ds.accels).shape[0]:
        dts_np = np.concatenate([dts_np, dts_np[-1:]])
    dts_t = torch.tensor(dts_np[i0:i1], dtype=torch.float64)
    frame_slices = [(int(sync[i]) - i0, int(sync[i + 1]) - i0)
                    for i in range(0, B)]
    init_rot = torch.tensor(np.asarray(ds.imu_init["rot"], np.float64))
    drots_t, dpos_t, dvels_t = _t_motion_integrate(
        dts_t, gyr_used.to(torch.float64), acc_used.to(torch.float64),
        frame_slices, init_rot, float(np.asarray(imu_mod.gravity)))

    # ---- LM on detached inputs (world init from denoised window) ----
    full_acc = np.asarray(ds.accels, np.float64).copy()
    full_acc[i0:i1] = acc_used.detach().numpy()
    pos_w, rot_w_q, vel_w = imu_integrate_loop(
        full_acc, ds.gyros, ds.imu_dts, sync, 0, B, ds.imu_init, ds.gravity)
    imu_poses_o = np.concatenate([pos_w, rot_w_q], axis=1)

    links = np.asarray(batch["links"])
    dts_frames = np.asarray(batch["dts"], np.float64).reshape(-1)
    residual, jacobian = np_pvgo_residual_builder(
        links, motions_np.astype(np.float64),
        drots_t.detach().numpy(), dpos_t.detach().numpy(),
        dvels_t.detach().numpy(), dts_frames, LOSS_W)
    res = pypose_lm_replica(residual, jacobian, imu_poses_o, vel_w,
                            radius=1e4)

    # ---- imu_loss on CONVERGED (pre-align) nodes/vels (pvgo.py:95-111,
    # computed before align_to at pvgo.py:195) + torch backward ----
    nodes_c = torch.tensor(res.nodes, dtype=torch.float64)
    vels_c = torch.tensor(res.vels, dtype=torch.float64)
    adjvelerr = dvels_t - (vels_c[1:] - vels_c[:-1])
    q1, q2 = nodes_c[:-1, 3:], nodes_c[1:, 3:]
    qe = t_quat_mul(t_quat_inv(drots_t),
                    t_quat_mul(t_quat_inv(q1), q2))
    imuroterr = t_quat_log(qe)
    trans_l = (adjvelerr ** 2).sum(dim=1)
    rot_l = (imuroterr ** 2).sum(dim=1)
    loss_t = ROT_W * rot_l.sum() + TRANS_W * trans_l.sum()
    loss_t.backward()

    grads_t = {k: (p.grad.numpy() if p.grad is not None
                   else np.zeros(p.shape, np.float32))
               for k, p in tden.named_parameters()}
    g_t = _import_denoiser(None, grads_t)

    return dict(
        loss_j=float(loss_j), loss_t=float(loss_t.detach()),
        grads_j=grads_j, grads_t=g_t, aux_j=aux_j,
        drots_t=drots_t.detach().numpy(), dvels_t=dvels_t.detach().numpy(),
        imu_poses_o=imu_poses_o, imu_vels_o=vel_w,
        nodes_o=res.nodes, vels_o=res.vels)


# ---------------------------------------------------------------------------
# Epoch-level parity: K windows with PVGO-tail state carry + ONE epoch-end
# optimizer update (VERDICT round-4 item #2 — the ATE-parity proxy).
# Reference semantics: train.py:296-299 (carry = aligned pgo tail, quat
# renormalized), train.py:172-179 (grads ACCUMULATE across every window of
# the epoch; a single optimizer.step() at epoch end).
# ---------------------------------------------------------------------------

EPOCH_K = 3
EPOCH_LR = 1e-4


@pytest.fixture(scope="module")
def fullstep_epoch():
    from scipy.spatial.transform import Rotation

    from islam_tpu.data.dataset import collate
    from islam_tpu.models import tartanvo as tvo
    from islam_tpu.models.layers import resize_bilinear
    from islam_tpu.ops.geometry import edge_mask
    from islam_tpu.pvgo.pypose_replica import pypose_lm_replica
    from islam_tpu.testing import (make_dataset, make_imu_module,
                                   make_step_inputs)
    from islam_tpu.train import train_step, _get_pose_params
    from islam_tpu.utils.checkpoints import import_torch_weights
    from oracle_helpers import (imu_integrate_loop, np_pvgo_residual_builder,
                                t_se3_inv, t_se3_mul, t_tartanvo_motion,
                                t_vo_loss)

    import Network.PWC.PWCNet as torch_pwc
    torch_pwc.FunctionCorrelation = _torch_correlation
    from Network.VONet import VONet as TorchVONet

    torch.manual_seed(0)
    tmodel = TorchVONet(fix_parts=("flow", "stereo"))
    tmodel.flowNet.warp = types.MethodType(_cpu_warp, tmodel.flowNet)
    with torch.no_grad():  # same non-degenerate-disparity bias as fullstep
        tmodel.stereoNet.conv_c13.bias += 1.0
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    ds = make_dataset(num_frames=EPOCH_K * B + 1, height=H, width=W, seed=11)
    imu_mod = make_imu_module(ds, batch_frames=B)

    variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
    variables = import_torch_weights(variables, sd)

    T_IL_np = np.concatenate(
        [[0.1, -0.05, 0.2],
         Rotation.from_rotvec([0, 0, 0.1]).as_quat()]).astype(np.float32)
    T_IL_t = torch.tensor(T_IL_np)

    step_kwargs = dict(
        target="vo", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=LOSS_W, rot_w=ROT_W, trans_w=TRANS_W)

    # ---- jitted chain: K windows threaded through aux["carry"], grads
    # accumulated exactly as the Trainer does (train.py) ----
    losses_j, pg_tails_j, motions_j, pgo_j = [], [], [], []
    gaccum = None
    state = make_step_inputs(ds, imu_mod, 0, B)[2]
    for k in range(EPOCH_K):
        batch, imu_win, _ = make_step_inputs(ds, imu_mod, k * B, B)
        loss_j, grads_j, aux_j = train_step(
            variables, None, batch, imu_win, state, jnp.asarray(T_IL_np),
            imu_mod.gravity, imu_mod.accel_bias, imu_mod.gyro_bias,
            jnp.asarray(False), **step_kwargs)
        state = aux_j["carry"]
        losses_j.append(float(loss_j))
        motions_j.append(np.asarray(aux_j["motions"]))
        pgo_j.append(np.asarray(aux_j["pgo_poses"]))
        pg_tails_j.append(np.asarray(aux_j["pgo_poses"])[-1])
        gaccum = grads_j if gaccum is None else jax.tree_util.tree_map(
            jnp.add, gaccum, grads_j)

    # one epoch-end update on the summed grads (train.py:172-179 semantics);
    # sgd keeps the parity check linear in the grads (adam's first step is
    # sign-like and amplifies cross-framework noise on ~0 grads)
    import optax
    pose_params = _get_pose_params(variables)
    opt = optax.sgd(EPOCH_LR)
    updates, _ = opt.update(gaccum, opt.init(pose_params), pose_params)
    new_params_j = optax.apply_updates(pose_params, updates)

    # ---- torch/numpy oracle chain ----
    tmodel.train()
    losses_t, motions_t_all, pgo_t = [], [], []
    init_o = {k2: np.asarray(v, np.float64)
              for k2, v in dict(ds.imu_init).items()}
    for k in range(EPOCH_K):
        sample = collate([ds[i] for i in range(k * B, k * B + B)])

        def t_nchw(x):
            return torch.tensor(np.ascontiguousarray(
                np.asarray(x).transpose(0, 3, 1, 2)), dtype=torch.float32)

        batch_k, _, _ = make_step_inputs(ds, imu_mod, k * B, B)
        img_small = resize_bilinear(batch_k["img0"], (H // 4, W // 4),
                                    align_corners=False)
        edge_np = np.asarray(edge_mask(jnp.moveaxis(img_small, -1, 1)))

        flow, disp, pose = tmodel(
            t_nchw(sample["img0"]), t_nchw(sample["img1"]),
            t_nchw(sample["img0_norm"]), t_nchw(sample["img0_r_norm"]),
            t_nchw(sample["intrinsic"]))
        pose = pose * torch.tensor([0.13, 0.13, 0.13, 0.013, 0.013, 0.013])
        baseline = np.linalg.norm(
            np.asarray(sample["extrinsic"])[:, :3], axis=1)
        motions_t = t_tartanvo_motion(
            pose, flow.detach(), disp.detach(),
            np.asarray(sample["intrinsic_calib"]),
            torch.tensor(baseline, dtype=torch.float32),
            edge=torch.tensor(edge_np), datatype="kitti",
            correct_scale=False)
        motions_t = t_se3_mul(T_IL_t, t_se3_mul(motions_t, t_se3_inv(T_IL_t)))

        pos_w, rot_w_q, vel_w = imu_integrate_loop(
            ds.accels, ds.gyros, ds.imu_dts, ds.rgb2imu_sync, k * B,
            (k + 1) * B, init_o, ds.gravity)
        dpos, drot, dvel = imu_integrate_loop(
            ds.accels, ds.gyros, ds.imu_dts, ds.rgb2imu_sync, k * B,
            (k + 1) * B, init_o, ds.gravity, motion_mode=True)
        imu_poses_o = np.concatenate([pos_w, rot_w_q], axis=1)

        # window-LOCAL links (batch_k rebases them to [0, B]); the raw
        # sample["link"] carries global frame indices for k > 0
        links = np.asarray(batch_k["links"])
        dts = np.asarray(sample["dt"], np.float64).reshape(-1)
        residual, jacobian = np_pvgo_residual_builder(
            links, motions_t.detach().numpy().astype(np.float64),
            drot, dpos, dvel, dts, LOSS_W)
        res = pypose_lm_replica(residual, jacobian, imu_poses_o, vel_w,
                                radius=1e4)
        nodes_al, vels_al = _np_align(res.nodes, res.vels, imu_poses_o[0])
        pgo_t.append(nodes_al)

        trans_l, rot_l = t_vo_loss(nodes_al, links, motions_t)
        loss_t = ROT_W * rot_l.sum() + TRANS_W * trans_l.sum()
        loss_t.backward()  # grads ACCUMULATE across windows
        losses_t.append(float(loss_t.detach()))
        motions_t_all.append(motions_t.detach().numpy())

        # carry = aligned pgo tail, renormalized quat (train.py:296-299)
        tail_q = nodes_al[-1, 3:] / np.linalg.norm(nodes_al[-1, 3:])
        init_o = {"pos": nodes_al[-1, :3], "rot": tail_q,
                  "vel": vels_al[-1]}

    gsd = {f"flowPoseNet.{k}": p.grad.numpy()
           for k, p in tmodel.flowPoseNet.named_parameters()
           if p.grad is not None}
    zero_tpl = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), variables)
    g_t = import_torch_weights(zero_tpl, gsd)["params"]["flowPoseNet"]

    with torch.no_grad():  # one SGD step on the accumulated grads
        upd_sd = {}
        for k, p in tmodel.flowPoseNet.named_parameters():
            upd = p - EPOCH_LR * p.grad if p.grad is not None else p
            upd_sd[f"flowPoseNet.{k}"] = upd.numpy()
    new_params_t = import_torch_weights(zero_tpl, upd_sd)[
        "params"]["flowPoseNet"]

    return dict(losses_j=losses_j, losses_t=losses_t,
                motions_j=motions_j, motions_t=motions_t_all,
                pgo_j=pgo_j, pgo_t=pgo_t,
                gaccum=gaccum, g_t=g_t, old_params=pose_params,
                new_params_j=new_params_j, new_params_t=new_params_t)


@needs_oracle
class TestEpochParity:
    """K=3 windows with state carry + epoch-end update track the reference
    oracle chain: any drift in carry/accumulation/update semantics fails."""

    def test_per_window_losses(self, fullstep_epoch):
        for k, (lj, lt) in enumerate(zip(fullstep_epoch["losses_j"],
                                         fullstep_epoch["losses_t"])):
            assert lt != 0.0
            rel = abs(lj - lt) / abs(lt)
            assert rel < 1e-2, (k, lj, lt)

    def test_carried_pgo_trajectories(self, fullstep_epoch):
        """Windows 1 and 2 start from the previous window's pgo tail —
        their solutions only match if the carry semantics match."""
        for k, (pj, pt) in enumerate(zip(fullstep_epoch["pgo_j"],
                                         fullstep_epoch["pgo_t"])):
            q_sign = np.sign(np.sum(pj[:, 3:] * pt[:, 3:], axis=1))[:, None]
            pt = np.concatenate([pt[:, :3], pt[:, 3:] * q_sign], axis=1)
            # front-end translation deltas (see TestFullStepParity notes)
            # compound through the carry; tolerance grows with k
            np.testing.assert_allclose(pj, pt, atol=1e-2 * (k + 1),
                                       err_msg=f"window {k}")

    def test_accumulated_gradients(self, fullstep_epoch):
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep_epoch["gaccum"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep_epoch["g_t"])[0]
        assert len(flat_j) == len(flat_t)
        tot_j2 = tot_t2 = tot_dot = 0.0
        for (pj, gj), (pt, gt) in zip(flat_j, flat_t):
            assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
            gj = np.asarray(gj, np.float64)
            gt = np.asarray(gt, np.float64)
            nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
            tot_j2 += nj ** 2
            tot_t2 += nt ** 2
            tot_dot += float((gj * gt).sum())
            if nt > 1e-6:
                rel = np.linalg.norm(gj - gt) / nt
                assert rel < 0.08, (jax.tree_util.keystr(pj), rel)
        cos = tot_dot / max((tot_j2 ** 0.5) * (tot_t2 ** 0.5), 1e-30)
        assert cos > 0.999, cos
        assert tot_t2 > 0.0

    def test_post_update_parameters(self, fullstep_epoch):
        """After the single epoch-end step, the parameter DELTAS (new - old,
        old identical on both sides by construction) must track the torch
        step: delta = -lr * g_sum, so deltas inherit the grad tolerance
        without being swamped by the parameter magnitudes."""
        flat_old = jax.tree_util.tree_flatten_with_path(
            fullstep_epoch["old_params"])[0]
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep_epoch["new_params_j"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep_epoch["new_params_t"])[0]
        assert len(flat_j) == len(flat_t) == len(flat_old)
        total_moved = 0.0
        for (po, ao), (pj, aj), (pt, at) in zip(flat_old, flat_j, flat_t):
            assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
            ao = np.asarray(ao, np.float64)
            dj = np.asarray(aj, np.float64) - ao
            dt = np.asarray(at, np.float64) - ao
            ndt = np.linalg.norm(dt)
            total_moved += ndt
            if ndt > 1e-6 * EPOCH_LR:  # |g| > 1e-6 leaves, like the grad test
                rel = np.linalg.norm(dj - dt) / ndt
                assert rel < 0.08, (jax.tree_util.keystr(pj), rel)
        assert total_moved > 0.0


# ---------------------------------------------------------------------------
# IMU-target epoch parity: K windows with carry + accumulated denoiser grads
# + one epoch-end update (the second half of VERDICT round-4 item #2).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fullstep_imu_epoch():
    import optax
    from scipy.spatial.transform import Rotation

    from islam_tpu.pvgo.pypose_replica import pypose_lm_replica
    from islam_tpu.testing import (make_dataset, make_imu_module,
                                   make_step_inputs)
    from islam_tpu.train import _import_denoiser, train_step
    from oracle_helpers import (imu_integrate_loop, np_pvgo_residual_builder,
                                t_quat_inv, t_quat_log, t_quat_mul)

    from Network.IMUDenoiseNet import IMUCorrector_CNN_GRU_WO_COV

    torch.manual_seed(2)
    tden = IMUCorrector_CNN_GRU_WO_COV()
    sd = {k: v.detach().numpy() for k, v in tden.state_dict().items()}
    dn_params = _import_denoiser(None, sd)

    K = EPOCH_K
    ds = make_dataset(num_frames=K * B + 1, height=IMU_H, width=IMU_W,
                      seed=13)
    imu_mod = make_imu_module(ds, batch_frames=B)

    # Replayed motions: GT relative poses, shared by both chains.
    P = np.asarray(ds.poses, np.float64)
    motions_np = np.empty((K * B, 7), np.float32)
    for i in range(K * B):
        Ra = Rotation.from_quat(P[i, 3:])
        Rb = Rotation.from_quat(P[i + 1, 3:])
        motions_np[i, :3] = Ra.inv().apply(P[i + 1, :3] - P[i, :3])
        motions_np[i, 3:] = (Ra.inv() * Rb).as_quat()

    # ---- jitted chain ----
    losses_j, pgo_j = [], []
    gaccum = None
    state = make_step_inputs(ds, imu_mod, 0, B)[2]
    for k in range(K):
        batch, imu_win, _ = make_step_inputs(ds, imu_mod, k * B, B)
        loss_j, grads_j, aux_j = train_step(
            {}, dn_params, batch, imu_win, state,
            jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
            imu_mod.gravity, imu_mod.accel_bias, imu_mod.gyro_bias,
            jnp.asarray(False),
            target="imu", datatype="kitti", correct_scale=False,
            use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
            loss_weight=LOSS_W, rot_w=ROT_W, trans_w=TRANS_W,
            prev_motions=jnp.asarray(motions_np[k * B:(k + 1) * B]))
        state = aux_j["carry"]
        losses_j.append(float(loss_j))
        pgo_j.append(np.asarray(aux_j["pgo_poses"]))
        gaccum = grads_j if gaccum is None else jax.tree_util.tree_map(
            jnp.add, gaccum, grads_j)

    opt = optax.sgd(EPOCH_LR)
    updates, _ = opt.update(gaccum, opt.init(dn_params), dn_params)
    new_dn_j = optax.apply_updates(dn_params, updates)

    # ---- torch/numpy oracle chain ----
    sync = np.asarray(ds.rgb2imu_sync)
    dts_np = np.asarray(ds.imu_dts, np.float64)
    if dts_np.shape[0] < np.asarray(ds.accels).shape[0]:
        dts_np = np.concatenate([dts_np, dts_np[-1:]])

    losses_t, pgo_t = [], []
    init_o = {k2: np.asarray(v, np.float64)
              for k2, v in dict(ds.imu_init).items()}
    for k in range(K):
        i0, i1 = int(sync[k * B]), int(sync[(k + 1) * B]) + 1
        acc_w = torch.tensor(np.asarray(ds.accels[i0:i1]),
                             dtype=torch.float32)
        gyr_w = torch.tensor(np.asarray(ds.gyros[i0:i1]),
                             dtype=torch.float32)
        dacc, dgyr, _, _ = tden({"acc": acc_w, "gyro": gyr_w}, eval=False)
        acc_used = dacc

        dts_t = torch.tensor(dts_np[i0:i1], dtype=torch.float64)
        frame_slices = [(int(sync[i]) - i0, int(sync[i + 1]) - i0)
                        for i in range(k * B, (k + 1) * B)]
        init_rot = torch.tensor(np.asarray(init_o["rot"], np.float64))
        drots_t, dpos_t, dvels_t = _t_motion_integrate(
            dts_t, gyr_w.to(torch.float64), acc_used.to(torch.float64),
            frame_slices, init_rot, float(np.asarray(imu_mod.gravity)))

        full_acc = np.asarray(ds.accels, np.float64).copy()
        full_acc[i0:i1] = acc_used.detach().numpy()
        pos_w, rot_w_q, vel_w = imu_integrate_loop(
            full_acc, ds.gyros, ds.imu_dts, sync, k * B, (k + 1) * B,
            init_o, ds.gravity)
        imu_poses_o = np.concatenate([pos_w, rot_w_q], axis=1)

        batch_k, _, _ = make_step_inputs(ds, imu_mod, k * B, B)
        links = np.asarray(batch_k["links"])
        dts_frames = np.asarray(batch_k["dts"], np.float64).reshape(-1)
        residual, jacobian = np_pvgo_residual_builder(
            links, motions_np[k * B:(k + 1) * B].astype(np.float64),
            drots_t.detach().numpy(), dpos_t.detach().numpy(),
            dvels_t.detach().numpy(), dts_frames, LOSS_W)
        res = pypose_lm_replica(residual, jacobian, imu_poses_o, vel_w,
                                radius=1e4)

        # imu_loss on CONVERGED pre-align nodes (pvgo.py:95-111)
        nodes_c = torch.tensor(res.nodes, dtype=torch.float64)
        vels_c = torch.tensor(res.vels, dtype=torch.float64)
        adjvelerr = dvels_t - (vels_c[1:] - vels_c[:-1])
        qe = t_quat_mul(t_quat_inv(drots_t),
                        t_quat_mul(t_quat_inv(nodes_c[:-1, 3:]),
                                   nodes_c[1:, 3:]))
        imuroterr = t_quat_log(qe)
        loss_t = (ROT_W * (imuroterr ** 2).sum(dim=1).sum()
                  + TRANS_W * (adjvelerr ** 2).sum(dim=1).sum())
        loss_t.backward()  # accumulates across windows
        losses_t.append(float(loss_t.detach()))

        nodes_al, vels_al = _np_align(res.nodes, res.vels, imu_poses_o[0])
        pgo_t.append(nodes_al)
        tail_q = nodes_al[-1, 3:] / np.linalg.norm(nodes_al[-1, 3:])
        init_o = {"pos": nodes_al[-1, :3], "rot": tail_q,
                  "vel": vels_al[-1]}

    grads_t = {k2: (p.grad.numpy() if p.grad is not None
                    else np.zeros(p.shape, np.float32))
               for k2, p in tden.named_parameters()}
    g_t = _import_denoiser(None, grads_t)
    with torch.no_grad():
        upd_sd = {}
        for k2, p in tden.named_parameters():
            upd = p - EPOCH_LR * p.grad if p.grad is not None else p
            upd_sd[k2] = upd.numpy()
    new_dn_t = _import_denoiser(None, upd_sd)

    return dict(losses_j=losses_j, losses_t=losses_t,
                pgo_j=pgo_j, pgo_t=pgo_t, gaccum=gaccum, g_t=g_t,
                old_dn=dn_params, new_dn_j=new_dn_j, new_dn_t=new_dn_t)


@needs_oracle
class TestIMUEpochParity:
    def test_per_window_losses(self, fullstep_imu_epoch):
        for k, (lj, lt) in enumerate(zip(fullstep_imu_epoch["losses_j"],
                                         fullstep_imu_epoch["losses_t"])):
            assert lt != 0.0
            rel = abs(lj - lt) / abs(lt)
            assert rel < 1e-2, (k, lj, lt)

    def test_carried_pgo_trajectories(self, fullstep_imu_epoch):
        for k, (pj, pt) in enumerate(zip(fullstep_imu_epoch["pgo_j"],
                                         fullstep_imu_epoch["pgo_t"])):
            q_sign = np.sign(np.sum(pj[:, 3:] * pt[:, 3:], axis=1))[:, None]
            pt = np.concatenate([pt[:, :3], pt[:, 3:] * q_sign], axis=1)
            np.testing.assert_allclose(pj, pt, atol=2e-3 * (k + 1),
                                       err_msg=f"window {k}")

    def test_accumulated_denoiser_gradients(self, fullstep_imu_epoch):
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep_imu_epoch["gaccum"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep_imu_epoch["g_t"])[0]
        assert len(flat_j) == len(flat_t)
        tot_j2 = tot_t2 = tot_dot = 0.0
        for (pj, gj), (pt, gt) in zip(flat_j, flat_t):
            assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
            gj = np.asarray(gj, np.float64)
            gt = np.asarray(gt, np.float64)
            nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
            tot_j2 += nj ** 2
            tot_t2 += nt ** 2
            tot_dot += float((gj * gt).sum())
            if nt > 1e-6:
                rel = np.linalg.norm(gj - gt) / nt
                assert rel < 0.08, (jax.tree_util.keystr(pj), rel)
        cos = tot_dot / max((tot_j2 ** 0.5) * (tot_t2 ** 0.5), 1e-30)
        assert cos > 0.999, cos
        assert tot_t2 > 0.0

    def test_post_update_denoiser(self, fullstep_imu_epoch):
        flat_old = jax.tree_util.tree_flatten_with_path(
            fullstep_imu_epoch["old_dn"])[0]
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep_imu_epoch["new_dn_j"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep_imu_epoch["new_dn_t"])[0]
        assert len(flat_j) == len(flat_t) == len(flat_old)
        total_moved = 0.0
        for (po, ao), (pj, aj), (pt, at) in zip(flat_old, flat_j, flat_t):
            ao = np.asarray(ao, np.float64)
            dj = np.asarray(aj, np.float64) - ao
            dt = np.asarray(at, np.float64) - ao
            ndt = np.linalg.norm(dt)
            total_moved += ndt
            if ndt > 1e-6 * EPOCH_LR:
                rel = np.linalg.norm(dj - dt) / ndt
                assert rel < 0.08, (jax.tree_util.keystr(pj), rel)
        assert total_moved > 0.0


@needs_oracle
class TestFullStepIMUParity:
    def test_world_states(self, fullstep_imu):
        aux = fullstep_imu["aux_j"]
        np.testing.assert_allclose(np.asarray(aux["imu_poses"]),
                                   fullstep_imu["imu_poses_o"], atol=2e-4)
        np.testing.assert_allclose(np.asarray(aux["imu_vels"]),
                                   fullstep_imu["imu_vels_o"], atol=2e-4)

    def test_loss(self, fullstep_imu):
        assert fullstep_imu["loss_t"] != 0.0
        rel = abs(fullstep_imu["loss_j"] - fullstep_imu["loss_t"]) / abs(
            fullstep_imu["loss_t"])
        assert rel < 5e-3, (fullstep_imu["loss_j"], fullstep_imu["loss_t"])

    def test_denoiser_gradients(self, fullstep_imu):
        """The imu-epoch learning signal: d loss / d denoiser params,
        torch autograd (reference net + sequential integration) vs jax grad
        through the padded-scan integrate_window."""
        flat_j = jax.tree_util.tree_flatten_with_path(
            fullstep_imu["grads_j"])[0]
        flat_t = jax.tree_util.tree_flatten_with_path(
            fullstep_imu["grads_t"])[0]
        assert len(flat_j) == len(flat_t)
        tot_j2 = tot_t2 = tot_dot = 0.0
        for (pj, gj), (pt, gt) in zip(flat_j, flat_t):
            assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
            gj = np.asarray(gj, np.float64)
            gt = np.asarray(gt, np.float64)
            nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
            tot_j2 += nj ** 2
            tot_t2 += nt ** 2
            tot_dot += float((gj * gt).sum())
            if nt > 1e-6:
                rel = np.linalg.norm(gj - gt) / nt
                assert rel < 0.05, (jax.tree_util.keystr(pj), rel)
            elif nt > 1e-12 and nj > 1e-12:
                cos_leaf = float((gj * gt).sum()) / (nj * nt)
                assert cos_leaf > 0.999, (jax.tree_util.keystr(pj), cos_leaf)
        cos = tot_dot / max((tot_j2 ** 0.5) * (tot_t2 ** 0.5), 1e-30)
        assert cos > 0.999, cos
        assert tot_t2 > 0.0
