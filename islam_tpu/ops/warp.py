"""Bilinear sampling / flow warping (grid_sample equivalents) for TPU.

Replaces ``torch.nn.functional.grid_sample`` as used by the reference's PWC-Net
warp layer (Network/PWC/PWCNet.py:170-206) and flow chaining
(TartanVO.py:219-239).  Implemented as gather-free where possible: the sampler
uses one-hot-free dynamic gathers via ``jnp.take`` along flattened spatial
indices, which XLA lowers to efficient TPU gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jax.Array, grid: jax.Array, align_corners: bool = True,
                return_coverage: bool = False):
    """Bilinear sample ``img`` (B, C, H, W) at ``grid`` (B, H', W', 2) in [-1, 1].

    Semantics match torch.nn.functional.grid_sample with padding_mode='zeros'.
    grid[..., 0] is x (width axis), grid[..., 1] is y (height axis).

    ``return_coverage`` additionally returns the in-bounds bilinear weight
    sum (== grid_sample of a ones image) computed ANALYTICALLY -- it needs
    no gathers, halving the warp's gather cost on TPU.
    """
    B, C, H, W = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def inb(ix, iy):
        return ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))

    def gather(ix, iy):
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat_idx = iyc * W + ixc  # (B, H', W')
        img_flat = img.reshape(B, C, H * W)
        out = jnp.take_along_axis(
            img_flat, flat_idx.reshape(B, 1, -1).astype(jnp.int32), axis=2
        ).reshape(B, C, *flat_idx.shape[1:])
        return out * inb(ix, iy)[:, None].astype(img.dtype)

    out = (gather(x0, y0) * (wx0 * wy0)[:, None]
           + gather(x1, y0) * (wx1 * wy0)[:, None]
           + gather(x0, y1) * (wx0 * wy1)[:, None]
           + gather(x1, y1) * (wx1 * wy1)[:, None])
    if not return_coverage:
        return out
    dt = img.dtype
    coverage = (inb(x0, y0).astype(dt) * (wx0 * wy0)
                + inb(x1, y0).astype(dt) * (wx1 * wy0)
                + inb(x0, y1).astype(dt) * (wx0 * wy1)
                + inb(x1, y1).astype(dt) * (wx1 * wy1))
    return out, coverage


def flow_warp(x: jax.Array, flo: jax.Array) -> jax.Array:
    """Warp ``x`` (B, C, H, W) backward by flow ``flo`` (B, 2, H, W).

    Mirrors PWCDCNet.warp (PWCNet.py:170-206) including its validity-mask
    behavior: sampled positions whose bilinear support leaves the image get
    zeroed (the reference samples a ones-mask and thresholds at 0.9999).
    """
    B, C, H, W = x.shape
    dtype = x.dtype
    xx = jnp.broadcast_to(jnp.arange(W, dtype=dtype), (H, W))
    yy = jnp.broadcast_to(jnp.arange(H, dtype=dtype)[:, None], (H, W))
    grid = jnp.stack([xx, yy])[None]  # (1, 2, H, W)
    vgrid = grid + flo

    gx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    g = jnp.stack([gx, gy], axis=-1)  # (B, H, W, 2)

    out, coverage = grid_sample(x, g, align_corners=True,
                                return_coverage=True)
    mask = (coverage >= 0.9999).astype(dtype)[:, None]
    return out * mask


def join_flow(flow_list, height: int, width: int) -> jax.Array:
    """Chain a list of per-step flows into one composite flow (B=1 free).

    Mirrors TartanVO.join_flow (TartanVO.py:219-239): iterated bilinear
    resampling of an identity coordinate map through each flow in reverse,
    with zero-hits marked -1.
    """
    u = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32), (height, width))
    v = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None], (height, width))
    uv = jnp.stack([u, v])  # (2, H, W)

    x = uv[None]
    for f in reversed(list(flow_list)):
        g = jnp.moveaxis(f + uv, 0, -1)[None]  # (1, H, W, 2)
        gx = g[..., 0] / width * 2.0 - 1.0
        gy = g[..., 1] / height * 2.0 - 1.0
        x = grid_sample(x, jnp.stack([gx, gy], axis=-1), align_corners=False)

    x = x[0]
    zero_mask = jnp.logical_and(x[0] == 0, x[1] == 0)
    x = jnp.where(zero_mask[None], -1.0, x)
    return x - uv
