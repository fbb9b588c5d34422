"""Two-process validation of the multi-host (DCN) mesh path.

Launches TWO separate Python processes, each owning 2 virtual CPU devices,
joins them with ``jax.distributed`` over local TCP (the same multi-controller
runtime a TPU pod uses over DCN), builds the global 4-device sequence mesh,
feeds per-process local data through ``global_shard_batch`` /
``global_replicate`` (``jax.make_array_from_process_local_data``), and runs
one full multi-sequence train step.  Validates the process boundary that
single-process tests (tests/test_parallel.py, dryrun_multichip) cannot:
cross-process mesh construction, global-array assembly, and the gradient
all-reduce spanning both processes.

Usage: python scripts/validate_multihost.py            # parent: spawns both
       (internal) ... --child <pid> <port>             # one controller
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W, B = 64, 128, 2
N_SEQ = 4  # global sequences; 2 per process
PROCS = 2


def child(pid: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_SEQ // PROCS)

    import jax.numpy as jnp
    import numpy as np

    from islam_tpu import testing
    from islam_tpu.imu import denoiser as dn
    from islam_tpu.models import tartanvo as tvo
    from islam_tpu.parallel.mesh import (global_replicate, global_shard_batch,
                                         host_local_batch_slice,
                                         initialize_distributed,
                                         make_global_mesh,
                                         multi_sequence_train_step)

    initialize_distributed(f"localhost:{port}", PROCS, pid)
    assert jax.process_count() == PROCS, jax.process_count()
    mesh = make_global_mesh()
    assert mesh.devices.size == N_SEQ, mesh.devices

    # This process loads ONLY its own sequences (per-host data loading).
    own = host_local_batch_slice(N_SEQ)
    batches, wins, inits = [], [], []
    for s in range(N_SEQ)[own]:
        ds = testing.make_dataset(num_frames=B + 1, height=H, width=W, seed=s)
        imu = testing.make_imu_module(ds, batch_frames=B)
        batch, win, init = testing.make_step_inputs(ds, imu, 0, B)
        batches.append(batch)
        wins.append(win)
        inits.append(init)

    def stack(trees):
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)

    batches = global_shard_batch(mesh, stack(batches))
    wins = global_shard_batch(mesh, stack(wins))
    inits = global_shard_batch(mesh, stack(inits))

    ds0 = testing.make_dataset(num_frames=B + 1, height=H, width=W, seed=0)
    imu0 = testing.make_imu_module(ds0, batch_frames=B)
    vo_variables = global_replicate(
        mesh, tvo.init_params(jax.random.PRNGKey(0), H, W))
    dn_params = global_replicate(mesh, dn.init_params(jax.random.PRNGKey(1)))

    step = multi_sequence_train_step(
        mesh, target="vo", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=(1.0, 0.1, 10.0, 0.1), rot_w=1.0, trans_w=0.1)

    # Per-sequence calibration rows, assembled from each host's local
    # sequences exactly like the batches (identical values here).
    n_local = len(range(N_SEQ)[own])
    consts = tuple(
        global_shard_batch(mesh, stack([c] * n_local)) for c in (
            jnp.asarray(np.asarray(ds0.rgb2imu_pose), jnp.float32),
            imu0.gravity, imu0.accel_bias, imu0.gyro_bias,
            np.asarray(False)))
    loss, grads, _aux = step(
        vo_variables, dn_params, batches, wins, inits, *consts, None)

    lv = float(loss)  # replicated output: addressable on every process
    assert np.isfinite(lv), lv
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    print(f"child {pid} ok: loss={lv:.6f}, {len(leaves)} grad tensors",
          flush=True)


def parent() -> None:
    port = int(os.environ.get("ISLAM_MULTIHOST_PORT", "57431"))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(PROCS)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    failed = False
    for pid, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- process {pid} (exit {p.returncode}) ---\n{tail}")
        failed |= p.returncode != 0 or f"child {pid} ok" not in out
    if failed:
        raise SystemExit("multihost validation FAILED")
    print("multihost validation OK: 2 processes x 2 devices, global mesh, "
          "cross-process grad all-reduce")


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        parent()
