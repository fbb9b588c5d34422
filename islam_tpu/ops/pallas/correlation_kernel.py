"""Fused Pallas TPU kernel for the PWC-Net local correlation cost volume.

TPU-native replacement for the reference's four CUDA kernels
(Network/PWC/correlation.py:8-233).  Semantics identical to
``correlation_reference``:

    out[b, (dy+md)*(2md+1)+(dx+md), y, x]
        = (1/C) * sum_c f1[b, c, y, x] * pad(f2)[b, c, y+dy, x+dx]

Design (vs. the naive XLA formulation of 81 shifted elementwise products):
the kernel holds the full zero-padded second feature map of one batch item
in VMEM and streams row-blocks of the first map; all (2md+1)^2 displacement
channels are produced from that single VMEM-resident copy, so HBM traffic is
O(|f1| + |f2| + |out|) instead of O(81 * |f2|).  The displacement loop is
unrolled at trace time (static shifts -> static lane slices).

The backward pass uses the transparent XLA formulation via jax.custom_vjp
(replacing the hand-written CUDA updateGradFirst/Second kernels,
correlation.py:105-233): both gradients are again 81 shifted products, which
XLA fuses well at these sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_fwd_kernel(f1_ref, f2p_ref, out_ref, *, md: int, Hb: int,
                     H: int, W: int, inv_c: float):
    """Grid (B, ceil(H/Hb)).

    f1_ref:  (1, C, Hb, W)       row-block of the first feature map
    f2p_ref: (1, C, H+2md, W+2md) full padded second map (this batch item)
    out_ref: (1, D2, Hb, W)      D2 = (2md+1)^2 output channels
    """
    hb = pl.program_id(1)
    a = f1_ref[0]  # (C, Hb, W)
    n = 2 * md + 1
    for dy in range(n):
        for dx in range(n):
            b = f2p_ref[0, :, pl.ds(hb * Hb + dy, Hb), pl.ds(dx, W)]
            out_ref[0, dy * n + dx] = jnp.sum(a * b, axis=0) * inv_c


@functools.partial(jax.jit, static_argnames=("md",))
def _corr_fwd(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    B, C, H, W = f1.shape
    n = 2 * md + 1
    D2 = n * n
    Hb = min(H, 16)
    grid = (B, pl.cdiv(H, Hb))

    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))

    kernel = functools.partial(
        _corr_fwd_kernel, md=md, Hb=Hb, H=H, W=W, inv_c=1.0 / C)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D2, H, W), f1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, Hb, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, H + 2 * md, W + 2 * md),
                         lambda b, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D2, Hb, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(f1, f2p)
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
