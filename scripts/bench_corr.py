"""A/B bench of the two Pallas correlation variants on the real chip.

Shapes are the five PWC pyramid levels at the reference workload
(448x640 crop, bs=8 frame-pairs).  Dispatches are pipelined (30 ms tunnel
latency amortized over ITERS in-flight programs), mirroring bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu.ops.pallas.correlation_kernel import _corr_fwd, _corr_fwd_all

LEVELS = [  # (C, H, W) at bs=8
    (196, 7, 10),
    (128, 14, 20),
    (96, 28, 40),
    (64, 56, 80),
    (32, 112, 160),
]
B = 8
ITERS = 30


def bench(fn, f1, f2):
    out = fn(f1, f2)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(f1, f2) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    tot = {"dy": 0.0, "all": 0.0}
    for C, H, W in LEVELS:
        f1 = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.bfloat16)
        f2 = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.bfloat16)
        # equivalence check
        a = np.asarray(_corr_fwd(f1, f2, md=4), np.float32)
        b = np.asarray(_corr_fwd_all(f1, f2, md=4), np.float32)
        np.testing.assert_allclose(a, b, atol=1e-2)
        t_dy = bench(lambda x, y: _corr_fwd(x, y, md=4), f1, f2)
        t_all = bench(lambda x, y: _corr_fwd_all(x, y, md=4), f1, f2)
        tot["dy"] += t_dy
        tot["all"] += t_all
        print(f"C={C:4d} {H:4d}x{W:<4d}  dy-grid {t_dy:7.3f} ms   "
              f"all-dy {t_all:7.3f} ms")
    print(f"total per step       dy-grid {tot['dy']:7.3f} ms   "
          f"all-dy {tot['all']:7.3f} ms")


if __name__ == "__main__":
    main()
