"""Attribute layout-copy ops in the optimized TPU HLO of the bench step.

Lowers + compiles the exact per-window bench train_step (shapes from
bench.py), fetches the optimized HLO text, and prints every ``copy``
instruction with its shape, byte size, and jax op_name metadata — the
attribution the xplane profile (tools/analyze_xplane.py) cannot give,
since profiler op names like ``copy.6853`` carry no source info.

Usage: python tools/dump_copies.py [--quick] [top_n]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    isz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
           "f64": 8, "s8": 1, "u8": 1, "s64": 8}.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * isz


def main():
    quick = "--quick" in sys.argv
    top_n = next((int(a) for a in sys.argv[1:] if a.isdigit()), 40)
    h, w, b = (64, 128, 2) if quick else (448, 640, 8)

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
        bf16=True)
    args = (variables, dn_params, batch, win, init,
            jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
            imu.gravity, imu.accel_bias, imu.gyro_bias, jnp.asarray(False))

    import functools
    fn = functools.partial(train_step, **kwargs)
    compiled = jax.jit(fn).lower(*args).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, "runtime_executable") else [compiled.as_text()]

    rows = []
    for text in texts:
        for line in text.splitlines():
            ls = line.strip()
            m = re.match(r"%?([\w.\-]+) = ([^ ]+) copy\(", ls)
            if not m:
                continue
            name, shape = m.groups()
            meta = re.search(r'op_name="([^"]*)"', ls)
            rows.append((shape_bytes(shape), name, shape,
                         meta.group(1) if meta else "?"))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} copy ops, {total / 1e6:.1f} MB total moved "
          f"(once per copy, f32/bf16 sizes)")
    for sz, name, shape, op in rows[:top_n]:
        print(f"{sz / 1e6:9.2f} MB  {name:24s} {shape:36s} {op[:110]}")


if __name__ == "__main__":
    main()
