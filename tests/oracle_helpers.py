"""Shared reference-faithful oracles for the full-step parity tests.

Three independent re-implementations of reference semantics, used as test
oracles against the jitted islam_tpu pipeline (nothing here imports
islam_tpu compute code):

1. Differentiable torch SE(3)/quaternion ops in PyPose's (x, y, z, w)
   convention — the pieces of the reference's pose math that carry
   gradients (TartanVO.py:108-196 denorm chain, train.py:214-215 frame
   conjugation, pvgo.py:67-78 ``vo_loss``), re-expressed so the oracle can
   backprop through the reference torch networks without pypose.
2. A sequential numpy replica of the reference's per-frame IMU integration
   loop (imu_integrator.py:69-164), both world and motion modes, including
   the empty-frame and bias-subtraction semantics.
3. A generalized numpy PVGO residual builder (matrices + scipy Rotation)
   matching the reference residual blocks (pvgo.py:26-64) and the
   flatten/weight order of ``run_pvgo`` — drives
   ``islam_tpu.pvgo.pypose_replica.pypose_lm_replica``.
4. A boolean-gather numpy replica of the reference's metric-scale
   least squares (dense_ba.py:88-176) and its cv2.Canny edge mask
   (TartanVO.py:145-155) — oracles for the where-masked jit path in
   islam_tpu.ops.geometry.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

try:
    import torch
    HAS_TORCH = True
except ImportError:  # pragma: no cover
    HAS_TORCH = False


# ---------------------------------------------------------------------------
# 1. torch SE(3) ops, (x, y, z, w) quaternions, differentiable
# ---------------------------------------------------------------------------

def t_quat_mul(q1, q2):
    x1, y1, z1, w1 = q1.unbind(-1)
    x2, y2, z2, w2 = q2.unbind(-1)
    return torch.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], dim=-1)


def t_quat_inv(q):
    """Inverse of a UNIT quaternion (conjugate)."""
    return q * torch.tensor([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def t_quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4);
    q and v broadcast against each other (torch.cross needs equal
    ndims, so both sides are expanded to the common shape)."""
    qv = q[..., :3]
    shape = torch.broadcast_shapes(qv.shape, v.shape)
    qv = torch.broadcast_to(qv, shape)
    v = torch.broadcast_to(v, shape)
    w = torch.broadcast_to(q[..., 3:4], shape[:-1] + (1,))
    t = 2.0 * torch.cross(qv, v, dim=-1)
    return v + w * t + torch.cross(qv, t, dim=-1)


def t_so3_exp(phi, eps=1e-8):
    """Rotation vector (..., 3) -> unit quaternion, Taylor-guarded."""
    theta = torch.linalg.norm(phi, dim=-1, keepdim=True)
    half = 0.5 * theta
    small = theta < eps
    # sin(x/2)/x with series fallback; clamp the denominator where small.
    k = torch.where(small, 0.5 - theta ** 2 / 48.0,
                    torch.sin(half) / torch.where(small,
                                                  torch.ones_like(theta),
                                                  theta))
    w = torch.cos(half)
    return torch.cat([phi * k, w], dim=-1)


def t_quat_log(q, eps=1e-8):
    """Unit quaternion -> rotation vector (..., 3), Taylor-guarded."""
    qv = q[..., :3]
    w = q[..., 3]
    n = torch.linalg.norm(qv, dim=-1)
    # angle/2 = atan2(|qv|, w); rotvec = 2 * atan2(|qv|, w) * qv / |qv|
    half = torch.atan2(n, w)
    small = n < eps
    scale = torch.where(small, 2.0 / torch.clamp(w, min=0.5),
                        2.0 * half / torch.where(small, torch.ones_like(n),
                                                 n))
    return qv * scale.unsqueeze(-1)


def t_se3_mul(a, b):
    """Compose SE3 rows [t(3), q(4)]: a then b (a @ b, point maps as
    a.R (b.R x + b.t) + a.t)."""
    t = t_quat_rotate(a[..., 3:], b[..., :3]) + a[..., :3]
    q = t_quat_mul(a[..., 3:], b[..., 3:])
    return torch.cat([t, q], dim=-1)


def t_se3_inv(a):
    qi = t_quat_inv(a[..., 3:])
    t = -t_quat_rotate(qi, a[..., :3])
    return torch.cat([t, qi], dim=-1)


def t_se3_log(a, eps=1e-4):
    """SE3 row -> twist [tau(3), phi(3)] via analytic V^{-1} (PyPose's
    Log order: translation part first).  Use float64 inputs: the exact
    coefficient suffers catastrophic cancellation near identity."""
    phi = t_quat_log(a[..., 3:])
    theta = torch.linalg.norm(phi, dim=-1, keepdim=True)        # (..., 1)
    K = _t_hat(phi)                                             # (..., 3, 3)
    KK = K @ K
    small = theta < eps
    th = torch.where(small, torch.ones_like(theta), theta)
    c_exact = (1.0 / th ** 2
               - (1.0 + torch.cos(th)) / (2.0 * th * torch.sin(th)))
    c_series = 1.0 / 12.0 + theta ** 2 / 720.0
    c = torch.where(small, c_series, c_exact)                   # (..., 1)
    eye = torch.eye(3, dtype=a.dtype).expand(K.shape)
    Vinv = eye - 0.5 * K + c.unsqueeze(-1) * KK
    tau = (Vinv @ a[..., :3].unsqueeze(-1)).squeeze(-1)
    return torch.cat([tau, phi], dim=-1)


def _t_hat(v):
    zero = torch.zeros_like(v[..., 0])
    return torch.stack([
        torch.stack([zero, -v[..., 2], v[..., 1]], dim=-1),
        torch.stack([v[..., 2], zero, -v[..., 0]], dim=-1),
        torch.stack([-v[..., 1], v[..., 0], zero], dim=-1),
    ], dim=-2)


def t_cvt_se3(pose6):
    """6-vector [t(3), so3(3)] -> SE3 row (cvtSE3_pypose,
    Datasets/transformation.py:72-87)."""
    return torch.cat([pose6[..., :3], t_so3_exp(pose6[..., 3:])], dim=-1)


# tartan2kitti permutation (Datasets/transformation.py:89-98): rotation
# matrix [[0,1,0],[0,0,1],[1,0,0]], zero translation.
_T2K_Q = Rotation.from_matrix(
    np.array([[0., 1., 0.], [0., 0., 1.], [1., 0., 0.]])).as_quat()


def t_tartan2kitti(pose6):
    """6-vector or SE3 row -> SE3 row conjugated into KITTI coordinates."""
    se3 = t_cvt_se3(pose6) if pose6.shape[-1] == 6 else pose6
    T = torch.tensor(np.concatenate([[0., 0., 0.], _T2K_Q]),
                     dtype=se3.dtype)
    T = T.expand(se3.shape[:-1] + (7,))
    return t_se3_mul(T, t_se3_mul(se3, t_se3_inv(T)))


def t_vo_loss(nodes_const, links, motions):
    """Reference vo_loss (pvgo.py:67-78): error = poses^-1 node1^-1 node2
    with DETACHED nodes; returns (trans_loss (E,), rot_loss (E,))."""
    n = torch.as_tensor(nodes_const, dtype=motions.dtype)
    node1 = n[links[:, 0]]
    node2 = n[links[:, 1]]
    err = t_se3_log(t_se3_mul(t_se3_inv(motions),
                              t_se3_mul(t_se3_inv(node1), node2)))
    return (err[:, :3] ** 2).sum(dim=1), (err[:, 3:] ** 2).sum(dim=1)


# ---------------------------------------------------------------------------
# 2. numpy per-frame IMU integration loop (imu_integrator.py:69-164)
# ---------------------------------------------------------------------------

def _np_euler_chunk(dts, gyros, accels, pos, rot, vel, gravity):
    """Sequential Euler zero-order-hold over one frame's samples.
    rot: scipy Rotation. Returns final (pos, rot, vel)."""
    g_w = np.array([0.0, 0.0, -float(gravity)])
    for k in range(len(dts)):
        dt = float(dts[k])
        a_w = rot.apply(accels[k]) + g_w
        pos = pos + vel * dt + 0.5 * a_w * dt * dt
        vel = vel + a_w * dt
        rot = rot * Rotation.from_rotvec(gyros[k] * dt)
    return pos, rot, vel


def imu_integrate_loop(accels, gyros, dts, sync, st, end, init,
                       gravity, accel_bias=None, gyro_bias=None,
                       subtract_bias=False, denoise_accel=True,
                       denoise_gyro=True, motion_mode=False):
    """Replicates IMUModule.integrate (imu_integrator.py:69-164) in numpy.

    Returns (poses, rots_quat, vels) as float64 arrays; world mode shapes
    (B+1, .) with the init state first, motion mode shapes (B, .).
    """
    accels = np.asarray(accels, np.float64).copy()
    gyros = np.asarray(gyros, np.float64).copy()
    dts = np.asarray(dts, np.float64).reshape(-1)
    if dts.shape[0] < accels.shape[0]:
        dts = np.concatenate([dts, dts[-1:]])
    sync = np.asarray(sync)

    i0, i1 = int(sync[st]), int(sync[end]) + 1
    acc_w = accels[i0:i1]
    gyr_w = gyros[i0:i1]
    dt_w = dts[i0:i1]
    if subtract_bias:  # optm_bias path (imu_integrator.py:101-105)
        if denoise_accel and accel_bias is not None:
            acc_w = acc_w - np.asarray(accel_bias, np.float64)[None]
        if denoise_gyro and gyro_bias is not None:
            gyr_w = gyr_w - np.asarray(gyro_bias, np.float64)[None]

    init_rot = Rotation.from_quat(np.asarray(init["rot"], np.float64))
    if motion_mode:  # prase_init (imu_integrator.py:14-18)
        init_pos = np.zeros(3)
        init_vel = np.zeros(3)
    else:
        init_pos = np.asarray(init["pos"], np.float64)
        init_vel = np.asarray(init["vel"], np.float64)

    poses, rots, vels = [], [], []
    if not motion_mode:
        poses.append(init_pos.copy())
        rots.append(init_rot.as_quat())
        vels.append(init_vel.copy())

    # state threading mirrors the reference loop: in motion mode only the
    # rotation is carried; pos/vel restart from zero every frame.
    cur_pos, cur_rot, cur_vel = init_pos.copy(), init_rot, init_vel.copy()
    state_pos, state_rot, state_vel = cur_pos, cur_rot, cur_vel
    for i in range(st, end):
        s = int(sync[i]) - i0
        e = int(sync[i + 1]) - i0
        if s == e:  # empty frame (imu_integrator.py:134-140)
            if motion_mode:
                state_pos = np.zeros(3)
                state_vel = np.zeros(3)
            else:
                state_vel = np.zeros(3)
        else:
            p0 = np.zeros(3) if motion_mode else cur_pos
            v0 = np.zeros(3) if motion_mode else cur_vel
            state_pos, state_rot, state_vel = _np_euler_chunk(
                dt_w[s:e], gyr_w[s:e], acc_w[s:e], p0, cur_rot, v0, gravity)
        poses.append(state_pos.copy())
        vels.append(state_vel.copy())
        if motion_mode:
            rots.append((cur_rot.inv() * state_rot).as_quat())
        else:
            rots.append(state_rot.as_quat())
        cur_rot = state_rot
        if not motion_mode:
            cur_pos = state_pos.copy()
            cur_vel = state_vel.copy()

    return (np.stack(poses), np.stack(rots), np.stack(vels))


# ---------------------------------------------------------------------------
# 3. numpy PVGO residual (pvgo.py:26-64 blocks, run_pvgo flatten order)
# ---------------------------------------------------------------------------

def np_se3_mat(rows):
    """SE3 rows [t(3), q(4)] -> (N, 4, 4) homogeneous matrices."""
    rows = np.asarray(rows, np.float64)
    T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    T[:, :3, :3] = Rotation.from_quat(rows[:, 3:]).as_matrix()
    T[:, :3, 3] = rows[:, :3]
    return T


def np_se3_log(T):
    """(N, 4, 4) -> (N, 6) twists [tau, phi] via rotvec + analytic V^{-1}."""
    phi = Rotation.from_matrix(T[:, :3, :3]).as_rotvec()
    out = np.empty((T.shape[0], 6))
    for i in range(T.shape[0]):
        p = phi[i]
        th = np.linalg.norm(p)
        K = np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]],
                      [-p[1], p[0], 0.0]])
        if th < 1e-8:
            Vinv = np.eye(3) - 0.5 * K + (1.0 / 12.0) * (K @ K)
        else:
            c = 1.0 / th ** 2 - (1.0 + np.cos(th)) / (2.0 * th * np.sin(th))
            Vinv = np.eye(3) - 0.5 * K + c * (K @ K)
        out[i, :3] = Vinv @ T[i, :3, 3]
        out[i, 3:] = p
    return out


def np_pvgo_residual_builder(links, vo_motions, imu_drots, imu_dtrans,
                             imu_dvels, dts, weights):
    """(residual_fn, jacobian_fn) over (nodes (N,7), vels (N,3)) matching
    run_pvgo's block order and sqrt-info weighting; central-difference
    Jacobian under the scipy-based retraction of pypose_replica."""
    from islam_tpu.pvgo.pypose_replica import retract_nodes

    links = np.asarray(links)
    poses_inv = np.linalg.inv(np_se3_mat(np.asarray(vo_motions, np.float64)))
    drots_R = Rotation.from_quat(
        np.asarray(imu_drots, np.float64)).as_matrix()
    dtrans = np.asarray(imu_dtrans, np.float64)
    dvels = np.asarray(imu_dvels, np.float64)
    dts = np.asarray(dts, np.float64).reshape(-1, 1)
    w0, w1, w2, w3 = [float(w) for w in weights[:4]]

    def residual(nodes, vels):
        T = np_se3_mat(nodes)
        T_inv = np.linalg.inv(T)
        pgerr = np_se3_log(poses_inv @ T_inv[links[:, 0]] @ T[links[:, 1]])
        adjvelerr = dvels - (vels[1:] - vels[:-1])
        R = T[:, :3, :3]
        rel = np.transpose(drots_R, (0, 2, 1)) @ (
            np.transpose(R[:-1], (0, 2, 1)) @ R[1:])
        imuroterr = Rotation.from_matrix(rel).as_rotvec()
        trans = np.asarray(nodes)[:, :3]
        transvelerr = (trans[1:] - trans[:-1]) - (vels[:-1] * dts + dtrans)
        return np.concatenate([
            (pgerr * w0).reshape(-1), (adjvelerr * w1).reshape(-1),
            (imuroterr * w2).reshape(-1), (transvelerr * w3).reshape(-1)])

    def jacobian(nodes, vels, eps=1e-6):
        N = nodes.shape[0]
        D = 9 * N
        cols = []
        for k in range(D):
            d = np.zeros(D)
            d[k] = eps
            xi, dv = d[:6 * N].reshape(N, 6), d[6 * N:].reshape(N, 3)
            rp = residual(retract_nodes(nodes, xi), vels + dv)
            rm = residual(retract_nodes(nodes, -xi), vels - dv)
            cols.append((rp - rm) / (2 * eps))
        return np.stack(cols, axis=1)

    return residual, jacobian


# ---------------------------------------------------------------------------
# 4. boolean-gather scale recovery (dense_ba.py:88-176) + Canny mask
#    (TartanVO.py:145-155)
# ---------------------------------------------------------------------------

def np_scale_from_disp_flow(disp, flow, motion7, fx, fy, cx, cy, baseline,
                            mask=None, disp_th=1.0):
    """Gather-form replica of the reference least squares, float64.

    Follows dense_ba.py:88-176 literally: boolean gathers (dynamic shapes)
    build the 2N x 1 system M s = w, solved as s = (M^T w) / (M^T M); the
    rotation/translation come from scipy on the SE3 inverse (the reference
    uses pypose T.Inv()).  Returns (s, z, mask, depth_mask) like the
    reference and the jit path.
    """
    disp = np.asarray(disp, np.float64)
    flow = np.asarray(flow, np.float64)
    motion7 = np.asarray(motion7, np.float64)
    height, width = flow.shape[-2:]

    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64), indexing="xy")
    uv = np.stack([u, v])

    flow_norm = np.linalg.norm(flow, axis=0)
    warped = flow + uv
    inside = lambda x, lim: np.logical_and(x >= 0, x <= lim)  # noqa: E731
    flow_mask = (inside(warped[0], width) & inside(warped[1], height)
                 & (flow_norm > 0))
    m = flow_mask if mask is None else np.logical_and(flow_mask, mask)

    disp2d = disp[0] if disp.ndim == 3 else disp
    disp_mask = np.logical_and(inside(u - disp2d, width), disp2d >= disp_th)
    m = np.logical_and(disp_mask, m)
    with np.errstate(divide="ignore"):
        z = np.where(disp_mask, fx * baseline / disp2d, 0.0)

    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    K_inv = np.linalg.inv(K)
    uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
    P = z[..., None] * np.einsum("ij,hwj->hwi", K_inv, uv1)

    rot = Rotation.from_quat(motion7[3:])
    R_inv = rot.inv().as_matrix()
    t_inv = -R_inv @ motion7[:3]
    t_norm = t_inv / max(np.linalg.norm(t_inv), 1e-12)

    a = K @ t_norm
    b = np.einsum("ij,hwj->hwi", K, np.einsum("ij,hwj->hwi", R_inv, P))
    f = np.moveaxis(flow + uv, 0, -1)

    M1 = a[2] * f[..., 0] - a[0]
    w1 = b[..., 0] - b[..., 2] * f[..., 0]
    M2 = a[2] * f[..., 1] - a[1]
    w2 = b[..., 1] - b[..., 2] * f[..., 1]

    # the reference's boolean gather (dense_ba.py:159-168)
    sel = m.reshape(-1)
    M = np.concatenate([M1.reshape(-1)[sel], M2.reshape(-1)[sel]])
    w = np.concatenate([w1.reshape(-1)[sel], w2.reshape(-1)[sel]])
    s = float(M @ w) / float(M @ M)
    return s, z, m, disp_mask


def t_scale_from_disp_flow(disp, flow, motion7, fx, fy, cx, cy, baseline,
                           mask=None, disp_th=1.0):
    """Differentiable torch replica of dense_ba.py:88-176 (gather form).

    ``disp`` (H, W) / ``flow`` (2, H, W) are detached network outputs at
    pixel level; ``motion7`` is the SE3 row the scale differentiates
    through (the reference's pose_ENU_SE3[i]).  Returns the scalar s.
    """
    dt = flow.dtype
    height, width = flow.shape[-2:]
    u_lin = torch.linspace(0, width - 1, width, dtype=dt)
    v_lin = torch.linspace(0, height - 1, height, dtype=dt)
    u, v = torch.meshgrid(u_lin, v_lin, indexing="xy")
    uv = torch.stack([u, v])
    uv1 = torch.stack([u, v, torch.ones_like(u)])

    inside = lambda x, lim: torch.logical_and(x >= 0, x <= lim)  # noqa: E731
    flow_norm = torch.linalg.norm(flow, dim=0)
    warped = flow + uv
    m = (inside(warped[0], width) & inside(warped[1], height)
         & (flow_norm > 0))
    if mask is not None:
        m = torch.logical_and(m, mask)
    disp_mask = torch.logical_and(inside(u - disp, width), disp >= disp_th)
    m = torch.logical_and(disp_mask, m)
    z = torch.where(disp_mask, fx * baseline / disp, torch.zeros_like(disp))

    K = torch.tensor([fx, 0, cx, 0, fy, cy, 0, 0, 1],
                     dtype=dt).view(3, 3)
    K_inv = torch.linalg.inv(K)
    P = z.unsqueeze(-1) * torch.einsum("ij,hwj->hwi", K_inv,
                                       uv1.permute(1, 2, 0))

    Tinv = t_se3_inv(motion7)
    t_norm = torch.nn.functional.normalize(Tinv[:3], dim=0)
    a = K @ t_norm
    b = torch.einsum("ij,hwj->hwi", K, t_quat_rotate(Tinv[3:], P))
    f = (flow + uv).permute(1, 2, 0)

    M1 = a[2] * f[..., 0] - a[0]
    w1 = b[..., 0] - b[..., 2] * f[..., 0]
    M2 = a[2] * f[..., 1] - a[1]
    w2 = b[..., 1] - b[..., 2] * f[..., 1]

    sel = m.reshape(-1)
    M = torch.cat([M1.reshape(-1)[sel], M2.reshape(-1)[sel]])
    w = torch.cat([w1.reshape(-1)[sel], w2.reshape(-1)[sel]])
    return (M @ w) / (M @ M)


def t_tartanvo_motion(pose6, flow, disp, intrinsic_calib, baseline,
                      edge=None, datatype="kitti", correct_scale=False,
                      gt_motion=None, use_kitti_coord=True):
    """The TartanVO.forward tail (TartanVO.py:108-196): de-normalized pose
    -> scale recovery (stereo least squares or GT norm) -> coordinate
    conversion.  ``pose6`` is the POSE_STD-denormalized 6-vec (carries
    grad); ``flow``/``disp`` are the detached net outputs at NET scale
    (pixel scaling happens here, TartanVO.py:122-126)."""
    disp_th = {"kitti": 5.0, "tartanair": 1.0, "euroc": 1.0}[datatype]
    if not correct_scale:
        flow_px = flow * 5.0
        disp_px = disp * (50.0 / 4.0)
        pose_enu = t_tartan2kitti(pose6)
        scales = []
        for i in range(pose6.shape[0]):
            fx, fy, cx, cy = [float(x) / 4.0 for x in intrinsic_calib[i]]
            scales.append(t_scale_from_disp_flow(
                disp_px[i, 0], flow_px[i], pose_enu[i], fx, fy, cx, cy,
                baseline[i], mask=None if edge is None else edge[i],
                disp_th=disp_th))
        scale = torch.stack(scales)
    else:
        scale = torch.norm(gt_motion[:, :3], dim=1)
    trans = torch.nn.functional.normalize(pose6[:, :3], dim=1) \
        * scale.view(-1, 1)
    pose6 = torch.cat([trans, pose6[:, 3:]], dim=1)
    return t_tartan2kitti(pose6) if use_kitti_coord else t_cvt_se3(pose6)


def cv2_canny_mask(img_u8_bgr, low=50, high=100, dilate=5):
    """The reference's host edge mask (TartanVO.py:150-154): cv2.Canny on
    the (already downsampled) uint8 BGR frame, dilated with ones(5,5).
    ``img_u8_bgr``: (H, W, 3) uint8. Returns bool (H, W)."""
    import cv2

    e = cv2.Canny(img_u8_bgr, low, high)
    e = cv2.dilate(e, np.ones((dilate, dilate), np.uint8))
    return e > 0
