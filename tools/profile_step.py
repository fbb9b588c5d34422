"""Capture a jax.profiler trace of the full benchmark train_step.

Usage: python tools/profile_step.py [outdir=/tmp/islam_prof] [--quick]
Then:  python tools/analyze_xplane.py <outdir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    outdir = next((a for a in sys.argv[1:] if not a.startswith("--")),
                  "/tmp/islam_prof")
    quick = "--quick" in sys.argv
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

    for _ in range(2):  # compile + warm
        loss, grads, aux = train_step(*args, **kwargs)
        jax.block_until_ready((loss, grads))

    jax.profiler.start_trace(outdir)
    outs = []
    for _ in range(3):
        loss, grads, aux = train_step(*args, **kwargs)
        outs.append((loss, grads))
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    print(f"trace written under {outdir}")


if __name__ == "__main__":
    main()
