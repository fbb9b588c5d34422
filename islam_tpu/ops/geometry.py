"""Projective geometry ops: back-projection, reprojection, metric-scale recovery.

TPU-native counterpart of the reference's dense_ba.py:9-176 plus the PyPose
``point2pixel``/``reprojerr`` functions it imports (dense_ba.py:5).  All ops are
fully vectorized with ``where``-masking (no boolean gathers, so shapes stay
static under jit), and the Canny-edge mask used by the reference on the host
(TartanVO.py:145-155, cv2 round-trip) is replaced by an on-device
Sobel + dilation pipeline (``edge_mask``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from islam_tpu import lie
from islam_tpu.lie import SE3


def make_intrinsics_layer(w: int, h: int, fx, fy, ox, oy) -> jax.Array:
    """Per-pixel normalized-ray map (2, h, w). Mirrors Datasets/utils.py:376-381."""
    ww, hh = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    ww = (ww - ox + 0.5) / fx
    hh = (hh - oy + 0.5) / fy
    return jnp.stack([ww, hh])


def intrinsics_matrix(fx, fy, cx, cy, dtype=jnp.float32) -> jax.Array:
    fx = jnp.asarray(fx, dtype)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([fx, z, jnp.asarray(cx, dtype)], axis=-1),
        jnp.stack([z, jnp.asarray(fy, dtype), jnp.asarray(cy, dtype)], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def pixel2point(pixels: jax.Array, depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Pixels (..., N, 2) + depth (..., N) -> camera-frame points (..., N, 3).

    Mirrors dense_ba.py:9-62 (the reference's local copy of the PyPose fn).
    """
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    x = (pixels[..., 0] - cx) * depth / fx
    y = (pixels[..., 1] - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def point2pixel(points: jax.Array, intrinsics: jax.Array,
                extrinsics: SE3 | None = None) -> jax.Array:
    """Camera/world points (..., N, 3) -> pixels (..., N, 2).

    With ``extrinsics`` given, points are first transformed by it (matching
    pypose.function.geometry.point2pixel used at dense_ba.py:315-316).
    """
    if extrinsics is not None:
        points = extrinsics.Act(points)
    z = jnp.maximum(points[..., 2:3], 1e-6)
    uv1 = points / z
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    return jnp.stack([uv1[..., 0] * fx + cx, uv1[..., 1] * fy + cy], axis=-1)


def reprojerr(points: jax.Array, pixels: jax.Array, intrinsics: jax.Array,
              extrinsics: SE3 | None = None) -> jax.Array:
    """Per-point reprojection error (..., N, 2), reduction='none'.

    Mirrors pypose reprojerr as used at dense_ba.py:302.
    """
    return point2pixel(points, intrinsics, extrinsics) - pixels


# ---------------------------------------------------------------------------
# On-device edge mask (replaces the cv2.Canny host round-trip,
# TartanVO.py:145-155)
# ---------------------------------------------------------------------------

def edge_mask(img: jax.Array, low: float = 50.0, dilate: int = 5) -> jax.Array:
    """Approximate Canny+dilate edge mask, fully on-device.

    ``img``: (..., 3, H, W) float in [0, 1] at the resolution the mask is
    needed (the caller downsamples by 4 first, as the reference does with
    cv2.resize at TartanVO.py:150).  Returns a bool mask (..., H, W): True on
    and near intensity edges.  Sobel gradient magnitude thresholded at the
    Canny low threshold, then dilated with a ``dilate``x``dilate`` max-pool --
    a cheap, jit-friendly stand-in for cv2.Canny(50,100)+dilate(5x5) whose
    purpose here is only to bias the scale-recovery least squares toward
    textured pixels.
    """
    gray = (0.114 * img[..., 0, :, :] + 0.587 * img[..., 1, :, :]
            + 0.299 * img[..., 2, :, :]) * 255.0  # BGR weights: cv2 images
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=gray.dtype)
    ky = kx.T
    batch_shape = gray.shape[:-2]
    flat = gray.reshape((-1, 1) + gray.shape[-2:])
    gx = jax.lax.conv_general_dilated(flat, kx[None, None], (1, 1), "SAME")
    gy = jax.lax.conv_general_dilated(flat, ky[None, None], (1, 1), "SAME")
    mag = jnp.sqrt(gx * gx + gy * gy)
    edges = mag > low
    pad = dilate // 2
    dil = jax.lax.reduce_window(
        edges, False, jax.lax.bitwise_or,
        window_dimensions=(1, 1, dilate, dilate),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )
    return dil.reshape(batch_shape + gray.shape[-2:])


# ---------------------------------------------------------------------------
# Metric-scale recovery from disparity + flow (dense_ba.py:88-176)
# ---------------------------------------------------------------------------

def _is_inside_1d(u, width):
    return jnp.logical_and(u >= 0, u <= width)


def scale_from_disp_flow(disp: jax.Array, flow: jax.Array, motion,
                         fx, fy, cx, cy, baseline,
                         depth: jax.Array | None = None,
                         mask: jax.Array | None = None,
                         disp_th: float = 1.0):
    """Closed-form translation-scale recovery; vectorized masked least squares.

    Direct TPU re-design of dense_ba.py:88-176: instead of boolean gathers
    (dynamic shapes), the 2N x 1 system M s = w is solved with where-masked
    reductions: s = sum(mask * M * w) / sum(mask * M^2).

    Args mirror the reference: ``disp``/``flow`` (2,H,W) at working res,
    ``motion`` SE3 (or 6/7 vector) camera motion in ENU coords, scalar
    intrinsics of the working resolution, stereo ``baseline``.

    Returns (s, z, mask, depth_mask) as the reference does (s scalar).
    """
    from islam_tpu.transformation import cvt_se3

    T = cvt_se3(motion)
    height, width = flow.shape[-2:]
    dtype = flow.dtype

    u, v = jnp.meshgrid(jnp.arange(width, dtype=dtype),
                        jnp.arange(height, dtype=dtype))
    uv = jnp.stack([u, v])
    ones = jnp.ones_like(u)

    flow_norm = jnp.linalg.norm(flow, axis=0)
    warped = flow + uv
    flow_mask = (_is_inside_1d(warped[0], width)
                 & _is_inside_1d(warped[1], height)
                 & (flow_norm > 0))
    m = flow_mask if mask is None else jnp.logical_and(flow_mask, mask)

    if depth is None:
        disp2d = disp[0] if disp.ndim == 3 else disp
        disp_mask = jnp.logical_and(_is_inside_1d(u - disp2d, width),
                                    disp2d >= disp_th)
        m = jnp.logical_and(disp_mask, m)
        z = jnp.where(disp_mask, fx * baseline / jnp.maximum(disp2d, 1e-6), 0.0)
        depth_mask = disp_mask
    else:
        depth_th = fx * baseline
        depth_mask = jnp.logical_and(depth <= depth_th, depth > 0)
        m = jnp.logical_and(depth_mask, m)
        z = jnp.where(depth_mask, depth, 0.0)

    K = intrinsics_matrix(fx, fy, cx, cy, dtype)
    K_inv = jnp.linalg.inv(K)

    # Back-project each pixel: P = z * K^-1 [u, v, 1]
    uv1 = jnp.stack([u, v, ones], axis=-1)  # (H, W, 3)
    P = z[..., None] * jnp.einsum("ij,hwj->hwi", K_inv, uv1)

    Tinv = T.Inv()
    Rq = Tinv.rotation()
    t = Tinv.translation()
    t_norm = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    a = K @ t_norm  # (3,)
    RP = Rq.Act(P)  # rotate each point
    b = jnp.einsum("ij,hwj->hwi", K, RP)
    f = jnp.moveaxis(flow + uv, 0, -1)  # (H, W, 2)

    M1 = a[2] * f[..., 0] - a[0]
    w1 = b[..., 0] - b[..., 2] * f[..., 0]
    M2 = a[2] * f[..., 1] - a[1]
    w2 = b[..., 1] - b[..., 2] * f[..., 1]

    mf = m.astype(dtype)
    num = jnp.sum(mf * (M1 * w1 + M2 * w2))
    den = jnp.sum(mf * (M1 * M1 + M2 * M2))
    s = num / jnp.maximum(den, 1e-12)

    return s, z, m, depth_mask


def scale_from_disp_flow_batch(disp, flow, motion, intrinsic_calib, baseline,
                               mask=None, disp_th=1.0):
    """vmap'd batch version: disp (B,1,H,W) or (B,H,W), flow (B,2,H,W),
    motion SE3 batch, intrinsic_calib (B,4) [fx,fy,cx,cy] at working res."""
    disp = disp if disp.ndim == 3 else disp[:, 0]
    motion_data = motion.data if isinstance(motion, SE3) else jnp.asarray(motion)

    def one(d, fl, mo, intr, bl, mk):
        s, z, m, dm = scale_from_disp_flow(
            d, fl, SE3(mo), intr[0], intr[1], intr[2], intr[3], bl,
            mask=mk, disp_th=disp_th)
        return s, z, m, dm

    if mask is None:
        mask = jnp.ones(disp.shape, dtype=bool)
    return jax.vmap(one)(disp, flow, motion_data, intrinsic_calib,
                         jnp.asarray(baseline), mask)
