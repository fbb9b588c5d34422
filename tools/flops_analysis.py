"""Analytic model-FLOPs for the fused train step (VERDICT round-1 item:
ground the perf claim in MFU, not just the 1.0 s/step reference estimate).

Counts matmul/conv FLOPs (the MXU work: 2*MACs) by walking the traced
jaxpr of ``train_step`` at the benchmark shapes — no XLA compile, no
device.  Elementwise/copy/reduce work is excluded on purpose: MFU is
defined against model FLOPs (the scaling-book convention), so the number
is a lower bound on issued FLOPs and the honest numerator for
``MFU = model_flops * steps_per_sec / chip_peak``.

Usage: python tools/flops_analysis.py [--quick]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def eqn_flops(eqn) -> float:
    """MXU FLOPs of one jaxpr equation (0 for non-matmul/conv)."""
    name = eqn.primitive.name
    if name == "conv_general_dilated":
        out = eqn.outvars[0].aval.shape
        rhs = eqn.invars[1].aval.shape
        dn = eqn.params["dimension_numbers"]
        k_spatial = _prod(rhs[d] for d in dn.rhs_spec[2:])
        in_c_per_group = rhs[dn.rhs_spec[1]]
        return 2.0 * _prod(out) * in_c_per_group * k_spatial
    if name == "dot_general":
        lhs = eqn.invars[0].aval.shape
        (lc, _), _ = eqn.params["dimension_numbers"]
        k = _prod(lhs[d] for d in lc)
        out = eqn.outvars[0].aval.shape
        return 2.0 * _prod(out) * k
    return 0.0


def _as_jaxpr(obj):
    """Unwrap ClosedJaxpr -> Jaxpr; None if ``obj`` is neither."""
    import jax.extend.core as jex
    if isinstance(obj, jex.ClosedJaxpr):
        return obj.jaxpr
    if isinstance(obj, jex.Jaxpr):
        return obj
    return None


def jaxpr_flops(jaxpr, mult: float = 1.0, while_trip: int = 10) -> float:
    """Recursive FLOP count. ``while_trip`` bounds data-dependent loops
    (the PVGO LM while-loop runs <= 10 scheduler steps, pvgo/lm.py).
    Control flow is special-cased; every other primitive that carries a
    jaxpr-valued param (jit, remat, custom_vjp, ...) is recursed
    generically so the walker survives jax primitive renames."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        params = eqn.params
        if name == "scan":
            total += jaxpr_flops(_as_jaxpr(params["jaxpr"]),
                                 mult * params["length"], while_trip)
        elif name == "while":
            total += jaxpr_flops(_as_jaxpr(params["body_jaxpr"]),
                                 mult * while_trip, while_trip)
            total += jaxpr_flops(_as_jaxpr(params["cond_jaxpr"]),
                                 mult * while_trip, while_trip)
        elif name == "cond":
            total += mult * max(
                jaxpr_flops(_as_jaxpr(b), 1.0, while_trip)
                for b in params["branches"])
        else:
            own = eqn_flops(eqn)
            if own:
                total += mult * own
                continue
            for v in params.values():
                inner = _as_jaxpr(v)
                if inner is not None:
                    total += jaxpr_flops(inner, mult, while_trip)
                elif isinstance(v, (list, tuple)):
                    for vi in v:
                        ji = _as_jaxpr(vi)
                        if ji is not None:
                            total += jaxpr_flops(ji, mult, while_trip)
    return total


def train_step_flops(h: int = 448, w: int = 640, b: int = 8,
                     bf16: bool = True) -> dict:
    """Trace train_step at the bench shapes and count model FLOPs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from islam_tpu import testing
    from islam_tpu.imu import denoiser as dn
    from islam_tpu.models import tartanvo as tvo
    from islam_tpu.train import train_step

    ds = testing.make_dataset(num_frames=b + 1, height=h, width=w)
    imu = testing.make_imu_module(ds, batch_frames=b)
    variables = tvo.init_params(jax.random.PRNGKey(0), h, w)
    dn_params = dn.init_params(jax.random.PRNGKey(1))
    batch, win, init = testing.make_step_inputs(ds, imu, 0, b)

    kwargs = dict(
        target="vo", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=(1.0, 0.1, 10.0, 0.1), rot_w=1.0, trans_w=0.1,
        bf16=bf16)
    args = (variables, dn_params, batch, win, init,
            jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
            imu.gravity, imu.accel_bias, imu.gyro_bias, jnp.asarray(False))

    jaxpr = jax.make_jaxpr(lambda *a: train_step(*a, **kwargs))(*args)
    flops = jaxpr_flops(jaxpr.jaxpr)
    return {"h": h, "w": w, "b": b, "bf16": bf16,
            "model_tflops_per_step": round(flops / 1e12, 4)}


# TPU v5e (v5 lite) bf16 peak; used by bench.py for the MFU line.
# Source: public TPU v5e spec sheet (197 TFLOP/s bf16 per chip).
V5E_BF16_PEAK = 197e12


def main():
    # Tracing needs no device; stay off the axon tunnel (~30 s compiles).
    import jax
    jax.config.update("jax_platforms", "cpu")
    quick = "--quick" in sys.argv
    h, w, b = (64, 128, 2) if quick else (448, 640, 8)
    info = train_step_flops(h, w, b)
    info["note"] = ("matmul/conv model FLOPs only (fwd+bwd, LM while-loop "
                    "bounded at 10 trips); divide peak for MFU")
    print(json.dumps(info))


if __name__ == "__main__":
    main()
