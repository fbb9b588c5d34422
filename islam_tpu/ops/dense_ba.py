"""Dense / sparse differentiable reprojection losses + keypoint picking.

TPU-native rebuild of dense_ba.py:179-375: the optional reprojection factor
pluggable into PVGO (pvgo.py:53-61).  Dense loss back-projects every masked
pixel; sparse loss works on N keypoints.  Both are pure jittable functions;
the keypoint detector is host-side (cv2 SIFT, mirroring
FAST_point_detector at dense_ba.py:347-375) with an on-device
Harris-response fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu.lie import SE3
from islam_tpu.ops.geometry import (intrinsics_matrix, pixel2point,
                                    point2pixel, reprojerr)


def _proj_with_mask(x):
    """dense_ba.py:74-85: perspective divide with z>0.1 and |uv|<=1 mask."""
    z = x[..., -1:]
    mask = z > 0.1
    p = jnp.where(mask, x / jnp.where(mask, z, 1.0), 0.0)
    inb = ((p[..., 0:1] >= -1) & (p[..., 0:1] <= 1)
           & (p[..., 1:2] >= -1) & (p[..., 1:2] <= 1))
    mask = jnp.logical_and(mask, inb)
    p = jnp.where(mask, p, 0.0)
    return p, mask[..., 0]


@jax.tree_util.register_pytree_node_class
class DenseReprojectionLoss:
    """dense_ba.py:179-273.  depth (B,H,W), flow (B,2,H,W), mask (B,H,W).

    Pytree-registered so the loss can travel inside the implicit-mode
    ``theta`` (pvgo/run.py): custom_vjp functions may not close over
    tracers, so every traced value — including these captured depth/flow
    tensors — must arrive as a formal argument of the residual."""

    _TREE_FIELDS = ("z", "flow", "mask", "rgb2imu_pose", "uv", "uv1",
                    "K", "K_inv")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._TREE_FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, c in zip(cls._TREE_FIELDS, children):
            setattr(obj, f, c)
        return obj

    def __init__(self, depth, flow, fx, fy, cx, cy, mask, rgb2imu_pose):
        self.z = jnp.asarray(depth)
        self.flow = jnp.asarray(flow)
        self.mask = jnp.asarray(mask)
        self.rgb2imu_pose = (rgb2imu_pose if isinstance(rgb2imu_pose, SE3)
                             else SE3(jnp.asarray(rgb2imu_pose)))
        B, H, W = self.z.shape
        u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                            jnp.arange(H, dtype=jnp.float32))
        self.uv = jnp.stack([u, v])[None]          # (1, 2, H, W)
        self.uv1 = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)  # (H, W, 3)
        self.K = intrinsics_matrix(fx, fy, cx, cy)
        self.K_inv = jnp.linalg.inv(self.K)

    def __call__(self, motion: SE3) -> jax.Array:
        """motion: SE3 batch (B,); returns per-frame mean L1 loss (B,)."""
        T = self.rgb2imu_pose.Inv() @ motion @ self.rgb2imu_pose
        P = self.z[..., None] * jnp.einsum("ij,hwj->hwi", self.K_inv,
                                           self.uv1)[None]
        Pc = T.Inv().data[:, None, None, :]
        from islam_tpu import lie
        P = lie.se3_act(Pc, P)
        p, reproj_mask = _proj_with_mask(P)
        mask = jnp.logical_and(self.mask > 0, reproj_mask)
        reproj = jnp.einsum("ij,bhwj->bhwi", self.K, p)
        reproj = jnp.moveaxis(reproj, -1, 1)[:, :2]
        r = reproj - (self.flow + self.uv)
        l1 = jnp.sum(jnp.abs(r), axis=1)  # (B, H, W)
        mf = mask.astype(l1.dtype)
        return jnp.sum(l1 * mf, axis=(1, 2)) / jnp.maximum(
            jnp.sum(mf, axis=(1, 2)), 1.0)


@jax.tree_util.register_pytree_node_class
class SparseReprojectionLoss:
    """dense_ba.py:276-305.  points2d (B,N,2), depth (B,H,W), flow (B,2,H,W).

    Pytree-registered for the same implicit-mode reason as
    DenseReprojectionLoss; the keypoint count N is static aux data."""

    _TREE_FIELDS = ("K", "point3d", "target", "rgb2imu_pose")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._TREE_FIELDS), self.N

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.N = aux
        for f, c in zip(cls._TREE_FIELDS, children):
            setattr(obj, f, c)
        return obj

    def __init__(self, points2d, depth, flow, fx, fy, cx, cy, rgb2imu_pose):
        points2d = jnp.asarray(points2d)
        depth = jnp.asarray(depth)
        flow = jnp.asarray(flow)
        B, N = points2d.shape[:2]
        self.N = N
        self.K = intrinsics_matrix(fx, fy, cx, cy)
        iy = points2d[..., 1].astype(jnp.int32)
        ix = points2d[..., 0].astype(jnp.int32)
        bidx = jnp.arange(B)[:, None]
        d = depth[bidx, iy, ix]                       # (B, N)
        self.point3d = pixel2point(points2d, d, self.K)
        fl = jnp.moveaxis(flow, 1, -1)                # (B, H, W, 2)
        self.target = fl[bidx, iy, ix] + points2d
        self.rgb2imu_pose = (rgb2imu_pose if isinstance(rgb2imu_pose, SE3)
                             else SE3(jnp.asarray(rgb2imu_pose)))

    def __call__(self, motion: SE3) -> jax.Array:
        T = self.rgb2imu_pose.Inv() @ motion @ self.rgb2imu_pose
        Tb = SE3(T.data[:, None, :])
        return reprojerr(self.point3d, self.target, self.K, Tb.Inv())

    def debug(self, motion: SE3, img0, img1, width: int, height: int,
              scale: int = 4, out_dir: str = "temp"):
        """Keypoint-overlay diagnostic (dense_ba.py:308-344): draws the
        tracked points on img0/img1, blue lines for the model reprojection
        and green lines for the flow target, and writes
        ``{out_dir}/{i}_reproj.png`` per batch element.  Host-side cv2;
        ``img0``/``img1`` are (B, H, W, 3) float [0, 1] NHWC."""
        import os

        import cv2

        os.makedirs(out_dir, exist_ok=True)
        img0 = (np.asarray(img0) * 255).astype(np.uint8)
        img1 = (np.asarray(img1) * 255).astype(np.uint8)

        T = self.rgb2imu_pose.Inv() @ motion @ self.rgb2imu_pose
        Tb = SE3(T.data[:, None, :])
        pts0 = np.asarray(point2pixel(self.point3d, self.K))
        pts1 = np.asarray(point2pixel(self.point3d, self.K, Tb.Inv()))
        inside = ((pts1[..., 0] >= 0) & (pts1[..., 0] < width)
                  & (pts1[..., 1] >= 0) & (pts1[..., 1] < height))
        pts1 = np.where(inside[..., None], pts1, 0.0)

        target = np.asarray(self.target).copy()
        error = np.asarray(reprojerr(self.point3d, self.target, self.K,
                                     Tb.Inv()))

        for i, (il, ir, pl, pr, tar, err) in enumerate(
                zip(img0, img1, pts0, pts1, target, error)):
            il = cv2.resize(il, (width * scale, height * scale))
            ir = cv2.resize(ir, (width * scale, height * scale))
            for p in pl:
                cv2.circle(il, np.round(p * scale).astype(int), 2,
                           (0, 0, 255))
            for p in pr:
                cv2.circle(ir, np.round(p * scale).astype(int), 2,
                           (0, 0, 255))
            ilr = cv2.hconcat([il, ir])
            for st, end, t, e in zip(pl, pr, tar, err):
                end = end.copy()
                t = t.copy()
                end[0] += width
                t[0] += width
                cv2.line(ilr, np.round(st * scale).astype(int),
                         np.round(end * scale).astype(int), (255, 0, 0))
                cv2.line(ilr, np.round(t * scale).astype(int),
                         np.round(end * scale).astype(int), (0, 255, 0))
            cv2.imwrite(os.path.join(out_dir, f"{i}_reproj.png"), ilr)


def detect_keypoints(image_np: np.ndarray, width: int, height: int,
                     N: int = 100, mask: Optional[np.ndarray] = None,
                     seed: int = 0) -> np.ndarray:
    """Host-side SIFT keypoint picker with random fill (dense_ba.py:347-375).

    image_np: (B, H0, W0, 3) float [0,1]; returns (B, N, 2) float32.
    """
    import cv2

    rng = np.random.default_rng(seed)
    image = (np.asarray(image_np) * 255).astype(np.uint8)
    detector = cv2.SIFT_create()
    out = []
    for i in range(image.shape[0]):
        gray = cv2.cvtColor(image[i], cv2.COLOR_BGR2GRAY)
        gray = cv2.resize(gray, (width, height))
        kps = detector.detect(gray, None)
        pts = np.floor(np.array([kp.pt for kp in kps], dtype=np.float32)
                       .reshape(-1, 2))
        if mask is not None and len(pts):
            idx = pts[:, (1, 0)].astype(int)
            pts = pts[mask[i, idx[:, 0], idx[:, 1]]]
        while len(pts) < N:
            cand = np.array([rng.integers(width), rng.integers(height)],
                            dtype=np.float32)
            if mask is None or mask[i, int(cand[1]), int(cand[0])]:
                pts = np.concatenate([pts, cand.reshape(1, 2)], axis=0)
        rng.shuffle(pts)
        out.append(pts[:N])
    return np.stack(out)
