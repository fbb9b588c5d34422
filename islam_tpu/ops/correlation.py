"""Local cost-volume correlation (PWC-Net) for TPU.

TPU-native replacement for the reference's CUDA/CuPy correlation kernels
(Network/PWC/correlation.py:8-398).  Semantics (correlation.py:69-99):

    out[b, (dy+md)*(2md+1)+(dx+md), y, x]
        = mean_c f1[b, c, y, x] * pad(f2)[b, c, y+dy, x+dx]

with zero padding of ``md`` on both spatial axes of ``f2`` and normalization
by the channel count.  The hand-written CUDA backward kernels
(correlation.py:105-233) are unnecessary here: JAX autodiff of the XLA
formulation produces the same gradients, and the Pallas kernel ships a custom
VJP built from the same shifted-product structure.

Two implementations:
- ``correlation_reference``: 81 shifted elementwise dot products, unrolled at
  trace time.  XLA fuses this into a handful of kernels; it is the
  correctness oracle.
- ``correlation_pallas``: single fused Pallas kernel that keeps one (H, W)
  tile of both feature maps in VMEM and emits all 81 channels without
  re-reading HBM (see islam_tpu/ops/pallas/correlation_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MD_DEFAULT = 4


@functools.partial(jax.jit, static_argnames=("md",))
def correlation_reference(f1: jax.Array, f2: jax.Array, md: int = MD_DEFAULT) -> jax.Array:
    """(B, C, H, W) x2 -> (B, (2md+1)^2, H, W)."""
    B, C, H, W = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    inv_c = 1.0 / C
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, 0, md + dy, md + dx), (B, C, H, W))
            outs.append(jnp.sum(f1 * shifted, axis=1) * inv_c)
    return jnp.stack(outs, axis=1)


def correlation(f1: jax.Array, f2: jax.Array, md: int = MD_DEFAULT,
                use_pallas: bool | None = None) -> jax.Array:
    """Dispatching entry point used by the flow network.

    ``use_pallas=None`` auto-selects: the fused Pallas kernel on TPU backends,
    the XLA formulation elsewhere (CPU tests, interpreters).
    """
    if use_pallas is None:
        # 'axon' is the tunneled-TPU PJRT plugin used in single-chip CI.
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        try:
            from islam_tpu.ops.pallas.correlation_kernel import correlation_pallas
            return correlation_pallas(f1, f2, md)
        except Exception:  # pragma: no cover - pallas unavailable fallback
            pass
    return correlation_reference(f1, f2, md=md)
