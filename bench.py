"""Benchmark: full iSLAM imperative iteration on one chip.

Measures the north-star workload (BASELINE.json): VO inference (PWC flow +
StereoNet disparity + VOFlowNet pose + scale recovery) + IMU preintegration
+ PVGO LM solve + backprop through the upper-level loss, at the reference
workload constants (448x640 crop, batch of 8 frame-pairs, 9-node PVGO graph,
<=10 LM iterations, ~10 IMU samples/frame -- BASELINE.md).

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}; the LAST
line printed is the definitive result.  A preliminary line is flushed as soon
as the first timed repetition exists, so a hard kill mid-run still leaves a
valid number on stdout (round-4 lesson: BENCH_r04 was rc=124 with zero
output).

Driver budget: the end-of-round runner killed round 4's bench at ~10 minutes
(rc=124).  This script therefore (a) persists compiled programs in the
repo-local .jax_cache (works over the axon tunnel -- a cached 448x640 train
step loads in ~0.01 s instead of recompiling for minutes), (b) stops timed
repetitions when SOFT_BUDGET_S wall-clock is reached, reporting the actual
rep count, and (c) never falls back to another *expensive* compile on
failure -- only to the cheap quick shapes.

vs_baseline: the reference publishes no absolute timings (BASELINE.md); its
trainer prints per-step wall-clock only.  We use a documented estimate of
1.0 s/step for the reference pipeline on its CUDA GPU (PWC+StereoNet forward
at 448x640 bs=8 + PyPose LM + backward), so vs_baseline = steps_per_sec/1.0,
i.e. >1 means faster than the estimated reference.
"""

import json
import os
import sys
import time

T0 = time.perf_counter()

# Wall-clock soft budget for the whole script.  The driver's observed hard
# timeout is ~600 s (BENCH_r04.json: rc=124, killed ~10 min in); stop timing
# well inside it so the final JSON line always lands on stdout.
SOFT_BUDGET_S = float(os.environ.get("ISLAM_BENCH_BUDGET_S", "420"))

import jax  # noqa: E402

# Persist slow remote compiles BEFORE any program is built.  Verified live:
# the axon PJRT client serializes executables, so a repo-local cache turns
# the driver's cold-process compile (minutes over the tunnel, the direct
# cause of BENCH_r04 rc=124) into a ~10 ms deserialization.  Lives inside
# the repo (gitignored) because /tmp does not reliably survive to the
# driver's end-of-round run -- same lesson as __graft_entry__.py.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    # 1 s threshold: the setup path dispatches several medium programs
    # (jitted flax init, window stacks, on-device random gen) whose ~1-4 s
    # remote compiles add up across fresh processes if not persisted.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE_STEP_SECONDS = 1.0  # documented estimate; see module docstring

# Analytic matmul/conv model-FLOPs of ONE train step at the bench shapes
# (448x640, bs=8, fwd+bwd, LM while bounded at 10 trips), measured with
# tools/flops_analysis.py.  Anchors the absolute perf claim: MFU =
# flops * steps_per_sec / chip peak (TPU v5e bf16 peak 197 TFLOP/s).
MODEL_TFLOPS_FALLBACK = 4.3359  # tools/flops_analysis.py output, round 4
# (5.0026 in round 2; 4.4062 after the quarter-res stereo head; 4.3359 after
# the depthwise-conv/avg-pool resize fast paths replaced the einsum-matmul
# x2/x0.5 resizes, models/layers.py — tests/test_misc.py pins this against
# the analytic tool so it cannot silently go stale again)
V5E_BF16_PEAK_TFLOPS = 197.0

H, W, B = 448, 640, 8
WARMUP = 2
ITERS = 10   # windows per timed repetition (scan length / pipeline depth)
REPS = 10    # max timed repetitions; the loop also stops at SOFT_BUDGET_S
#              and reports the achieved count -- median + IQR need spread
#              (builder-vs-driver scatter on identical code was ~4% in r3),
#              but a number from fewer reps beats no number at all.


def elapsed():
    return time.perf_counter() - T0


def emit(result):
    """Print one JSON result line and flush -- the last line printed wins,
    so later (better) lines supersede earlier (preliminary) ones even if
    the process is killed in between."""
    print(json.dumps(result), flush=True)


def check_pallas_numerics():
    """On-chip Pallas-vs-XLA correlation check (VERDICT r4 item 8): the
    compiled TPU kernel's numerics are asserted on every driver bench run,
    not just in CPU interpret-mode tests.  Costs one small compile
    (seconds, cached afterwards).  Replaces the trust the reference places
    in its hand-written CUDA correlation (ref: Network/PWC/correlation.py)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return "skipped (cpu backend)"
    from islam_tpu.ops.correlation import correlation_reference
    from islam_tpu.ops.pallas.correlation_kernel import correlation_pallas
    rng = np.random.default_rng(7)
    f1 = jnp.asarray(rng.normal(size=(1, 64, 16, 128)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 64, 16, 128)), jnp.float32)
    got = np.asarray(correlation_pallas(f1, f2, 4))
    want = np.asarray(correlation_reference(f1, f2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                               err_msg="compiled Pallas correlation kernel "
                                       "diverged from the XLA oracle on-chip")
    return "ok"


def main():
    quick = "--quick" in sys.argv
    bf16 = "--bf16" in sys.argv or "--f32" not in sys.argv
    concat_free = "--concat-free" in sys.argv
    if "--recount-flops" in sys.argv:
        # Re-derive MODEL_TFLOPS_FALLBACK from the analytic tool and fail
        # LOUDLY on drift, so the constant cannot silently go stale when the
        # model or bench shapes change (tests/test_misc.py pins the same
        # contract in the fast sweep).
        from tools.flops_analysis import train_step_flops
        got = train_step_flops(H, W, B)["model_tflops_per_step"]
        if abs(got - MODEL_TFLOPS_FALLBACK) > 1e-3:
            raise SystemExit(
                f"MODEL_TFLOPS_FALLBACK={MODEL_TFLOPS_FALLBACK} is stale: "
                f"tools/flops_analysis.py now measures {got} TFLOPs/step at "
                f"{H}x{W} bs={B}. Update bench.py:MODEL_TFLOPS_FALLBACK.")
        print(f"flops constant ok: {got} TFLOPs/step", file=sys.stderr)
    # Headline mode: fused-chunk scan (the Trainer's --scan-chunk path,
    # measured ~3% faster than per-window pipelining).
    scan = "--per-window" not in sys.argv
    fbe = "--frozen-bn-eval" in sys.argv
    if quick:
        run(quick=True, bf16=bf16, scan=False, concat_free=concat_free,
            frozen_bn_eval=fbe)
        return
    try:
        run(quick=False, bf16=bf16, scan=scan, concat_free=concat_free,
            frozen_bn_eval=fbe)
    except Exception as e:
        # Only the CHEAP fallback: a second full-shape compile on a
        # timeout-shaped failure made round 4 worse, not better.
        print(f"full bench failed ({type(e).__name__}: {e}); quick fallback",
              file=sys.stderr)
        run(quick=True, bf16=True)
    # AFTER the headline JSON (a cold check costs ~2 small compiles over
    # the tunnel; putting it first would delay the number that must land):
    # failure still makes the run loudly nonzero for the driver.
    try:
        pallas = check_pallas_numerics()
        print(f"pallas on-chip check: {pallas} ({elapsed():.0f}s)",
              file=sys.stderr)
    except Exception as e:
        raise SystemExit(f"pallas on-chip check FAILED: {e}")


def run(quick: bool, bf16: bool, scan: bool = False,
        concat_free: bool = False, frozen_bn_eval: bool = False):
    h, w, b = (64, 128, 2) if quick else (H, W, B)

    from islam_tpu import testing
    from islam_tpu.imu import denoiser as dn
    from islam_tpu.models import tartanvo as tvo
    from islam_tpu.train import train_scan, train_step

    ds = testing.make_dataset(num_frames=b + 1, height=h, width=w)
    imu = testing.make_imu_module(ds, batch_frames=b)
    variables = tvo.init_params(jax.random.PRNGKey(0), h, w)
    dn_params = dn.init_params(jax.random.PRNGKey(1))

    kwargs = dict(
        target="vo", datatype="kitti", correct_scale=False,
        use_kitti_coord=True, denoise_accel=True, denoise_gyro=False,
        loss_weight=(1.0, 0.1, 10.0, 0.1), rot_w=1.0, trans_w=0.1,
        bf16=bf16, concat_free=concat_free, frozen_bn_eval=frozen_bn_eval)

    consts = (jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
              imu.gravity, imu.accel_bias, imu.gyro_bias, jnp.asarray(False))
    if not scan:
        batch, win, init = testing.make_step_inputs(ds, imu, 0, b)
        args = (variables, dn_params, batch, win, init, *consts)

    metric = ("full iSLAM iteration (VO fwd + IMU + PVGO LM + backprop), "
              f"bs={b}, {h}x{w}, {'bf16' if bf16 else 'f32'}, "
              f"{'fused-scan' if scan else 'per-window'}"
              f"{', frozen-bn-eval' if frozen_bn_eval else ''}, "
              "steps/sec/chip")

    def report(times, preliminary=False):
        ts = sorted(times)
        dt = float(np.median(ts))
        q1 = float(np.percentile(ts, 25))
        q3 = float(np.percentile(ts, 75))
        steps_per_sec = 1.0 / dt
        result = {
            "metric": metric,
            "value": round(steps_per_sec, 4),
            "unit": "steps/sec",
            "vs_baseline": round(steps_per_sec * REFERENCE_STEP_SECONDS, 4),
            # spread over the timed repetitions: perf claims at <2%
            # resolution must cite non-overlapping [q1, q3] intervals
            "reps": len(ts),
            "step_ms_median": round(dt * 1e3, 3),
            "step_ms_q1": round(q1 * 1e3, 3),
            "step_ms_q3": round(q3 * 1e3, 3),
            "steps_per_sec_q1": round(1.0 / q3, 4),
            "steps_per_sec_q3": round(1.0 / q1, 4),
        }
        if preliminary:
            result["preliminary"] = True
        if not quick:
            # Absolute anchor: analytic model FLOPs -> achieved TFLOP/s ->
            # % of chip peak, independent of the 1 s/step reference
            # estimate.  The constant is measured offline by
            # tools/flops_analysis.py (re-tracing here would add minutes of
            # host time to every driver bench); `python bench.py
            # --recount-flops` / tests/test_misc.py check for staleness.
            tflops = MODEL_TFLOPS_FALLBACK
            result["model_tflops_per_step"] = tflops
            result["achieved_tflops_per_sec"] = round(
                tflops * steps_per_sec, 2)
            result["mfu_pct_v5e_bf16"] = round(
                100.0 * tflops * steps_per_sec / V5E_BF16_PEAK_TFLOPS, 2)
        emit(result)

    if scan:
        # Fused-chunk mode (--scan, Trainer --scan-chunk): ITERS windows in
        # ONE lax.scan program with on-device grad accumulation.  Windows
        # must be genuinely DISTINCT data: with identical slices XLA hoists
        # the loop-invariant VO forward out of the scan body and the
        # "throughput" becomes fiction (measured 180x).
        # The big image tensors are generated ON DEVICE (jax.random): the
        # axon tunnel moves ~20 MB/s at best and pays a multi-minute
        # first-touch warmup after idling, so shipping the ~1.2 GB of
        # window images from the host blows the driver budget by itself
        # (measured: 27.5 MB first H2D = 262 s cold, 22.5 MB/s after;
        # on-device generation of the same 1.1 GB = 2 s).  Host-side we
        # ship only the small per-window fields, mirroring
        # testing.device_batch's structure so the compiled train_scan
        # program (and its .jax_cache entry) is byte-identical.
        from islam_tpu.data.dataset import collate
        from islam_tpu.imu.preintegrator import IMUState

        sds = testing.make_dataset(num_frames=ITERS * b + 1,
                                   height=h, width=w)
        simu = testing.make_imu_module(sds, batch_frames=b)

        def small_fields(start):
            sample = collate([sds[i] for i in range(start, start + b)])
            sb = {}
            for k2 in ("intrinsic", "intrinsic_calib", "extrinsic",
                       "motion"):
                if k2 in sample:
                    sb[k2] = jnp.asarray(sample[k2])
            links = np.asarray(sample["link"]) - start
            sb["links"] = jnp.asarray(links)
            sb["dts"] = jnp.asarray(np.asarray(sample["dt"], np.float32))
            return sb

        small = [small_fields(k * b) for k in range(ITERS)]
        wins = [simu.window_inputs(k * b, (k + 1) * b)
                for k in range(ITERS)]
        sbatch = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *small)
        swin = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *wins)
        keys = jax.random.split(jax.random.PRNGKey(7), 5)
        sbatch["img0"] = jax.random.uniform(
            keys[0], (ITERS, b, h, w, 3), jnp.float32)
        sbatch["img1"] = jax.random.uniform(
            keys[1], (ITERS, b, h, w, 3), jnp.float32)
        sbatch["img0_norm"] = jax.random.normal(
            keys[2], (ITERS, b, h, w, 3), jnp.float32)
        sbatch["img0_r_norm"] = jax.random.normal(
            keys[3], (ITERS, b, h, w, 3), jnp.float32)
        # consecutive-pair windows ship B+1 shared frames (device_batch)
        sbatch["frames"] = jax.random.uniform(
            keys[4], (ITERS, b + 1, h, w, 3), jnp.float32)
        init = sds.imu_init
        init0 = IMUState(
            pos=jnp.asarray(np.asarray(init["pos"]), jnp.float32),
            rot=jnp.asarray(np.asarray(init["rot"]), jnp.float32),
            vel=jnp.asarray(np.asarray(init["vel"]), jnp.float32))
        sargs = (variables, dn_params, sbatch, swin, init0, *consts)
        print(f"data ready ({elapsed():.0f}s); tracing+compiling (cold "
              f"compile >20 min; cached ~seconds)", file=sys.stderr,
              flush=True)
        for _ in range(WARMUP):
            losses, grads, aux = train_scan(*sargs, **kwargs)
            np.asarray(losses)  # value fetch: axon's block_until_ready can
            # return before remote execution finishes; fetching forces it
        print(f"warmup done ({elapsed():.0f}s)", file=sys.stderr)
        times = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            losses, grads, aux = train_scan(*sargs, **kwargs)
            np.asarray(losses)
            times.append((time.perf_counter() - t0) / ITERS)
            if rep == 0:
                report(times, preliminary=True)  # a kill after this point
                # still leaves a valid (1-rep) number on stdout
            if elapsed() > SOFT_BUDGET_S and rep + 1 >= 3:
                print(f"budget reached after {rep + 1} reps "
                      f"({elapsed():.0f}s)", file=sys.stderr)
                break
    else:
        def run_once():
            loss, grads, aux = train_step(*args, **kwargs)
            jax.block_until_ready((loss, grads))
            return float(loss)

        for _ in range(WARMUP):
            run_once()
        print(f"warmup done ({elapsed():.0f}s)", file=sys.stderr)

        # Steady-state pipelined throughput: dispatch all steps
        # asynchronously and block once at the end (training does the same
        # -- host bookkeeping consumes outputs lazily), so per-dispatch
        # latency overlaps execution.
        times = []
        for rep in range(REPS if not quick else 3):
            t0 = time.perf_counter()
            outs = []
            for _ in range(ITERS):
                loss, grads, aux = train_step(*args, **kwargs)
                outs.append(loss)
            jax.block_until_ready(outs)
            np.asarray(outs[-1])  # device order is FIFO: fetching the last
            # loss proves every step finished (axon's block can return early)
            times.append((time.perf_counter() - t0) / ITERS)
            if rep == 0 and not quick:
                report(times, preliminary=True)
            if elapsed() > SOFT_BUDGET_S and rep + 1 >= 3:
                print(f"budget reached after {rep + 1} reps "
                      f"({elapsed():.0f}s)", file=sys.stderr)
                break

    report(times)


if __name__ == "__main__":
    main()
