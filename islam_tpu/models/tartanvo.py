"""TartanVO front-end wrapper: VONet forward + de-normalization + metric
scale recovery + coordinate-frame conversion.

TPU-native rebuild of ``TartanVO`` (TartanVO.py:16-198).  The whole forward
-- network, edge mask, per-frame scale least-squares, frame conjugation --
is ONE jittable function with no host round-trips (the reference bounces
images to cv2 for Canny at TartanVO.py:145-155; here the mask is the
on-device Sobel+dilate pipeline in islam_tpu.ops.geometry.edge_mask).

Checkpoint loading with the reference's lenient suffix-matching scheme
(TartanVO.py:49-87) lives in islam_tpu.utils.checkpoints.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from islam_tpu import lie
from islam_tpu.lie import SE3
from islam_tpu.models.vonet import VONet
from islam_tpu.ops.geometry import edge_mask, scale_from_disp_flow_batch
from islam_tpu.transformation import cvt_se3, tartan2kitti

# Output de-normalization (TartanVO.py:26): trained pose targets were divided
# by this std, so predictions are scaled back.
# Plain tuple, not a jnp array: creating a device array at import time would
# initialize the backend and break late platform selection (dryrun CPU mode).
POSE_STD = (0.13, 0.13, 0.13, 0.013, 0.013, 0.013)

DISP_TH = {"kitti": 5.0, "tartanair": 1.0, "euroc": 1.0}


def init_params(key: jax.Array, height: int = 448, width: int = 640,
                train_bn: bool = True):
    """Initialize VONet parameters (+ batch stats) with dummy shapes.

    ``model.init`` is wrapped in jax.jit: flax does NOT jit init by
    default, so un-jitted it dispatches hundreds of small eager ops —
    each a separate remote round-trip on the tunneled-TPU backend whose
    per-op compiles fall under the persistent-cache threshold, costing
    minutes in EVERY fresh process (the hidden reason round-5 "warm"
    bench runs still blew the driver budget).  Jitted, init is one
    program: compiled once, persisted in .jax_cache, ~ms afterwards."""
    model = VONet(train_bn=train_bn)
    h4, w4 = height // 4, width // 4
    dummy = {
        "img0": jnp.zeros((1, height, width, 3)),
        "img1": jnp.zeros((1, height, width, 3)),
        "img0_norm": jnp.zeros((1, height, width, 3)),
        "img0_r_norm": jnp.zeros((1, height, width, 3)),
        "intrinsic": jnp.zeros((1, h4, w4, 2)),
    }
    variables = jax.jit(model.init)(
        key, dummy["img0"], dummy["img1"],
        dummy["img0_norm"], dummy["img0_r_norm"], dummy["intrinsic"])
    return variables


@functools.partial(
    jax.jit,
    static_argnames=("datatype", "correct_scale", "use_kitti_coord",
                     "is_train", "has_given_scale", "has_precalc_flow",
                     "bf16", "concat_free", "frozen_bn_eval"))
def forward(variables, img0, img1, img0_norm, img0_r_norm, intrinsic,
            intrinsic_calib, baseline,
            gt_motion=None, given_scale=None, precalc_flow=None,
            frames=None,
            datatype: str = "kitti", correct_scale: bool = False,
            use_kitti_coord: bool = True, is_train: bool = True,
            has_given_scale: bool = False, has_precalc_flow: bool = False,
            bf16: bool = False, concat_free: bool = False,
            frozen_bn_eval: bool = False):
    """Jitted TartanVO forward (TartanVO.py:90-198). All images NHWC.

    ``bf16`` runs the conv stack in bfloat16 (params cast at call time,
    outputs back to f32 before the geometry stages) -- the TPU-native
    mixed-precision path (reference's lone knob is
    torch.set_float32_matmul_precision('high'), train.py:69).

    Returns dict with 'motion' (B,7) SE3 data (+ flow/disp/scale extras for
    the stereo scale path).
    """
    model = VONet(train_bn=is_train, concat_free=concat_free,
                  frozen_bn_eval=frozen_bn_eval)
    if bf16:
        cast = lambda x: (x.astype(jnp.bfloat16)
                          if x is not None and x.dtype == jnp.float32 else x)
        net_vars = jax.tree_util.tree_map(cast, variables)
        net_in = [cast(x) for x in
                  (img0, img1, img0_norm, img0_r_norm, intrinsic)]
        net_frames = cast(frames)
    else:
        net_vars = variables
        net_in = [img0, img1, img0_norm, img0_r_norm, intrinsic]
        net_frames = frames
    # train-mode BatchNorm uses batch statistics and would update running
    # stats; collect and drop the update (the reference's frozen subnets'
    # running stats are never consumed in the training path).
    (flow, disp, pose), _ = model.apply(
        net_vars, *net_in, frames=net_frames, mutable=["batch_stats"])
    flow = flow.astype(jnp.float32)
    disp = disp.astype(jnp.float32)
    pose = pose.astype(jnp.float32)

    pose = pose * jnp.asarray(POSE_STD, pose.dtype)  # TartanVO.py:108
    flow = jax.lax.stop_gradient(flow)
    disp = jax.lax.stop_gradient(disp)

    res: Dict[str, Any] = {}

    if has_given_scale:
        scale = jnp.reshape(given_scale, (-1, 1))
        trans = pose[:, :3] / jnp.maximum(
            jnp.linalg.norm(pose[:, :3], axis=1, keepdims=True), 1e-12) * scale
        pose = jnp.concatenate([trans, pose[:, 3:]], axis=1)

    elif not correct_scale:
        # --- stereo scale recovery (TartanVO.py:118-182) ---
        if has_precalc_flow:
            flow_px = precalc_flow
        else:
            flow_px = flow * 5.0  # TartanVO.py:122
        disp_px = disp * (50.0 / 4.0)  # TartanVO.py:126

        pose_ENU = tartan2kitti(pose)  # ENU conversion for image-frame geometry

        # Edge mask at 1/4 res (replaces the cv2 Canny round-trip).
        h4, w4 = flow.shape[1], flow.shape[2]
        from islam_tpu.models.layers import resize_bilinear
        img_small = resize_bilinear(img0, (h4, w4), align_corners=False)
        edge = edge_mask(jnp.moveaxis(img_small, -1, 1))  # (B, h4, w4)

        flow_nchw = jnp.moveaxis(flow_px, -1, 1)
        disp_hw = disp_px[..., 0]
        scale, depth, mask, depth_mask = scale_from_disp_flow_batch(
            disp_hw, flow_nchw, pose_ENU, intrinsic_calib / 4.0, baseline,
            mask=edge, disp_th=DISP_TH[datatype])

        res.update(flow=flow_px, disp=disp_px, mask=mask, depth=depth,
                   depth_mask=depth_mask, baseline=baseline[0],
                   intrinsic=intrinsic_calib[0] / 4.0, scale=scale)

        trans = pose[:, :3] / jnp.maximum(
            jnp.linalg.norm(pose[:, :3], axis=1, keepdims=True), 1e-12)
        trans = trans * scale[:, None]
        pose = jnp.concatenate([trans, pose[:, 3:]], axis=1)

    else:
        # --- GT scale (TartanVO.py:184-190) ---
        scale = jnp.linalg.norm(gt_motion[:, :3], axis=1, keepdims=True)
        trans = pose[:, :3] / jnp.maximum(
            jnp.linalg.norm(pose[:, :3], axis=1, keepdims=True), 1e-12) * scale
        pose = jnp.concatenate([trans, pose[:, 3:]], axis=1)

    if use_kitti_coord:
        motion = tartan2kitti(pose)
    else:
        motion = cvt_se3(pose)
    res["motion"] = motion.data
    return res


class TartanVO:
    """Host-side convenience wrapper mirroring the reference class."""

    def __init__(self, variables=None, key=None, correct_scale: bool = True,
                 fix_parts: Tuple[str, ...] = (), use_kitti_coord: bool = True,
                 height: int = 448, width: int = 640):
        if variables is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            variables = init_params(key, height, width)
        self.variables = variables
        self.correct_scale = correct_scale
        self.use_kitti_coord = use_kitti_coord
        self.fix_parts = tuple(fix_parts)

    def __call__(self, sample: Dict[str, Any], is_train: bool = True,
                 given_scale=None):
        datatype = sample.get("datatype", "kitti")
        if isinstance(datatype, (list, tuple)):
            datatype = datatype[0]
        baseline = jnp.linalg.norm(
            jnp.asarray(sample["extrinsic"])[:, :3], axis=1)
        return forward(
            self.variables,
            jnp.asarray(sample["img0"]), jnp.asarray(sample["img1"]),
            jnp.asarray(sample["img0_norm"]),
            jnp.asarray(sample["img0_r_norm"]),
            jnp.asarray(sample["intrinsic"]),
            jnp.asarray(sample["intrinsic_calib"]), baseline,
            gt_motion=jnp.asarray(sample["motion"]) if "motion" in sample else None,
            given_scale=given_scale,
            precalc_flow=sample.get("flow"),
            datatype=datatype, correct_scale=self.correct_scale,
            use_kitti_coord=self.use_kitti_coord, is_train=is_train,
            has_given_scale=given_scale is not None,
            has_precalc_flow="flow" in sample)

    def pred_flow(self, img0, img1):
        """TartanVO.py:201-216: finest flow scaled to pixel level."""
        model = VONet()
        batched = img0.ndim == 4
        if not batched:
            img0, img1 = img0[None], img1[None]
        flows, _ = model.apply(
            self.variables, jnp.concatenate([img0, img1], axis=-1),
            method=lambda m, x: m.flowNet(x), mutable=["batch_stats"])[0]
        flow = flows[0] * 5.0
        return flow if batched else flow[0]

    def join_flow(self, flow_to_join):
        """Chain per-step flows into one composite flow (TartanVO.py:219-239).

        ``flow_to_join``: list of (2, H, W) flows in pixel units.
        """
        from islam_tpu.ops.warp import join_flow as _join

        h, w = flow_to_join[0].shape[-2:]
        return _join(flow_to_join, h, w)
