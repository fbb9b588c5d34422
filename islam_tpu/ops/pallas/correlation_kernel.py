"""Fused Pallas TPU kernel for the PWC-Net local correlation cost volume.

TPU-native replacement for the reference's four CUDA kernels
(Network/PWC/correlation.py:8-233).  Semantics identical to
``correlation_reference``:

    out[b, (dy+md)*(2md+1)+(dx+md), y, x]
        = (1/C) * sum_c f1[b, c, y, x] * pad(f2)[b, c, y+dy, x+dx]

Kernel design, shaped by Mosaic's tiling rules (sublane-dim slices must be
8-aligned, so the row shift cannot be a dynamic in-kernel slice):

- The (2md+1) row shifts (dy) are materialized OUTSIDE the kernel as a
  stacked, width-padded copy ``f2s[b, dy] = pad_w(f2)[:, dy:dy+H, :]`` --
  one cheap XLA pad+stack, giving every grid step a block-aligned input.
- Grid is (B, 2md+1): each step owns one dy and emits the (2md+1) dx
  channels from a single VMEM-resident tile, unrolling the dx loop into
  STATIC lane-dim slices.
- HBM traffic is O((2md+1) * (|f1| + |f2|) + |out|) instead of the naive
  formulation's O((2md+1)^2 * |f2|).

The backward pass uses the transparent XLA formulation via jax.custom_vjp
(replacing the hand-written CUDA updateGradFirst/Second kernels,
correlation.py:105-233): both gradients are again shifted products, which
XLA fuses well at these sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_dy_kernel(f1_ref, f2s_ref, out_ref, *, md: int, W: int,
                    inv_c: float):
    """Grid (B, 2md+1, H/Hb).

    f1_ref:  (1, C, Hb, W)          row block of the first feature map
    f2s_ref: (1, 1, C, Hb, W+2md)   matching rows of the dy-shifted,
                                    width-padded second map (the dy shift is
                                    baked into f2s, so row blocks align)
    out_ref: (1, 2md+1, Hb, W)      the dx channels for this dy
    """
    a = f1_ref[0].astype(jnp.float32)          # (C, Hb, W)
    b_full = f2s_ref[0, 0].astype(jnp.float32)  # (C, Hb, W + 2md)
    n = 2 * md + 1
    for dx in range(n):
        b = b_full[:, :, dx:dx + W]  # static lane-dim slice
        acc = jnp.sum(a * b, axis=0) * inv_c  # f32 accumulation (bf16-safe)
        out_ref[0, dx] = acc.astype(out_ref.dtype)


def _corr_all_kernel(f1_ref, f2s_ref, out_ref, *, md: int, W: int,
                     inv_c: float):
    """All-displacement variant: grid (B, H/Hb), one step emits ALL
    (2md+1)^2 channels from a single VMEM-resident f1 tile (f1 HBM traffic
    O(|f1|) instead of O((2md+1)*|f1|); docs/TODO.md item 3).

    f1_ref:  (1, C, Hb, W)
    f2s_ref: (1, 2md+1, C, Hb, W+2md)   all dy shifts of these rows
    out_ref: (1, (2md+1)^2, Hb, W)
    """
    a = f1_ref[0].astype(jnp.float32)          # (C, Hb, W)
    n = 2 * md + 1
    for dy in range(n):
        b_full = f2s_ref[0, dy].astype(jnp.float32)  # (C, Hb, W + 2md)
        for dx in range(n):
            acc = jnp.sum(a * b_full[:, :, dx:dx + W], axis=0) * inv_c
            out_ref[0, dy * n + dx] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("md",))
def _corr_fwd_all(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    B, C, H, W = f1.shape
    n = 2 * md + 1
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    f2s = jnp.stack([f2p[:, :, j:j + H, :] for j in range(n)], axis=1)

    Hb = min(H, 16)
    kernel = functools.partial(_corr_all_kernel, md=md, W=W, inv_c=1.0 / C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n * n, H, W), f1.dtype),
        grid=(B, pl.cdiv(H, Hb)),
        in_specs=[
            pl.BlockSpec((1, C, Hb, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, C, Hb, W + 2 * md),
                         lambda b, h: (b, 0, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n * n, Hb, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(f1, f2s)


@functools.partial(jax.jit, static_argnames=("md",))
def _corr_fwd(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    B, C, H, W = f1.shape
    n = 2 * md + 1

    # f2 padded in H by md each side, in W by md each side; then the n row
    # shifts stacked: f2s[b, j] = f2p[:, j:j+H, :]  -> (B, n, C, H, W+2md)
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    f2s = jnp.stack([f2p[:, :, j:j + H, :] for j in range(n)], axis=1)

    # Row blocking keeps the per-step VMEM footprint ~1-2 MB at every
    # pyramid level (448x640 bs=8 blew the 16 MB scoped limit unblocked).
    Hb = min(H, 16)
    kernel = functools.partial(_corr_dy_kernel, md=md, W=W, inv_c=1.0 / C)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n * n, H, W), f1.dtype),
        grid=(B, n, pl.cdiv(H, Hb)),
        in_specs=[
            pl.BlockSpec((1, C, Hb, W), lambda b, j, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, Hb, W + 2 * md),
                         lambda b, j, h: (b, j, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, Hb, W), lambda b, j, h: (b, j, h, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(f1, f2s)
    return out


def _corr_bwd_xla(f1, f2, g, md: int):
    """Gradients via the shifted-product formulation (correctness-first
    rebuild of correlation.py:105-233; XLA fuses these adequately)."""
    B, C, H, W = f1.shape
    n = 2 * md + 1
    inv_c = 1.0 / C
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    df1 = jnp.zeros_like(f1)
    df2p = jnp.zeros_like(f2p)
    for dy in range(n):
        for dx in range(n):
            gs = g[:, dy * n + dx][:, None] * inv_c  # (B,1,H,W)
            shifted = jax.lax.dynamic_slice(
                f2p, (0, 0, dy, dx), (B, C, H, W))
            df1 = df1 + gs * shifted
            df2p = jax.lax.dynamic_update_slice(
                df2p,
                jax.lax.dynamic_slice(df2p, (0, 0, dy, dx), (B, C, H, W))
                + gs * f1,
                (0, 0, dy, dx))
    df2 = df2p[:, :, md:md + H, md:md + W]
    return df1, df2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlation_pallas(f1: jax.Array, f2: jax.Array, md: int = 4):
    return _corr_fwd(f1, f2, md=md)


def _cp_fwd(f1, f2, md):
    return _corr_fwd(f1, f2, md=md), (f1, f2)


def _cp_bwd(md, residuals, g):
    f1, f2 = residuals
    return _corr_bwd_xla(f1, f2, g, md)


correlation_pallas.defvjp(_cp_fwd, _cp_bwd)
