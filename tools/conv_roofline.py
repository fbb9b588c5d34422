"""Per-conv-family roofline table: is the step really conv-FLOP-bound?

Round-4 VERDICT task 4: "conv-FLOP-bound" was asserted from the family-level
profile (convs ~60 ms of ~90 ms) but never demonstrated per shape.  This
tool joins

  (a) the optimized TPU HLO of the bench train_step — every ``convolution``
      instruction with its shapes, window, and source ``op_name`` metadata,
      from which model FLOPs and HBM bytes are computed exactly; and
  (b) a jax.profiler xplane trace of the same program
      (tools/profile_step.py) — per-instruction device time,

and prints, per conv shape-family: time, achieved TFLOP/s, % of the v5e
MXU roofline for that dtype, and achieved HBM GB/s vs the ~819 GB/s spec —
so every family is labeled compute-bound (near MXU roofline), bandwidth-
bound (near HBM roofline), or NEITHER (the interesting ones: latency/
layout/underutilization, where a Pallas kernel or channel padding could
win).

Usage:
  python tools/profile_step.py /tmp/islam_prof          # on the TPU
  python tools/conv_roofline.py /tmp/islam_prof [--quick] [--json]
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK = {"bf16": 197e12, "f32": 98.5e12}
V5E_HBM_BPS = 819e9  # v5e spec sheet: 819 GB/s

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1, "s64": 8, "f16": 2}


def parse_shape(s):
    """'bf16[8,112,160,64]' -> ('bf16', (8,112,160,64))."""
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return None
    dt, dims = m.groups()
    shape = tuple(int(d) for d in dims.split(",") if d)
    return dt, shape


def nbytes(s):
    p = parse_shape(s)
    if p is None:
        return 0
    dt, shape = p
    n = 1
    for d in shape:
        n *= d
    return n * _DTYPE_BYTES.get(dt, 4)


def hlo_convs(text):
    """Yield dicts for every convolution instruction in optimized HLO."""
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(
            r"%?([\w.\-]+) = (\w+\[[\d,]*\])[^=]*? convolution\("
            r"\s*(\w+\[[\d,]*\])[^,]*,\s*(\w+\[[\d,]*\])", ls)
        if not m:
            continue
        name, out_s, lhs_s, rhs_s = m.groups()
        dt, out = parse_shape(out_s)
        _, rhs = parse_shape(rhs_s)
        dl = re.search(r"dim_labels=(\S+?)(?:,|$)", ls)
        fgc = re.search(r"feature_group_count=(\d+)", ls)
        win = re.search(r"window=\{([^}]*)\}", ls)
        meta = re.search(r'op_name="([^"]*)"', ls)
        # dim_labels like b01f_01io->b01f: rhs spec after '_', before '->'
        rhs_spec = dl.group(1).split("_")[1].split("-")[0] if dl else "01io"
        k_spatial = 1
        in_per_group = 1
        for ch, dim in zip(rhs_spec, rhs):
            if ch.isdigit():
                k_spatial *= dim
            elif ch == "i":
                in_per_group = dim
        out_elems = 1
        for d in out:
            out_elems *= d
        flops = 2.0 * out_elems * k_spatial * in_per_group
        yield {
            "name": name, "dtype": dt, "out": out_s, "rhs": rhs_s,
            "lhs": lhs_s, "window": win.group(1) if win else "",
            "groups": int(fgc.group(1)) if fgc else 1,
            "flops": flops,
            "bytes": nbytes(out_s) + nbytes(lhs_s) + nbytes(rhs_s),
            "op_name": meta.group(1) if meta else "?",
        }


def xplane_durations(path):
    """Per-HLO-instruction device time in seconds (averaged over the steps
    captured in the trace via occurrence counting handled by the caller)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    hits = sorted(__import__("glob").glob(
        os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if os.path.isfile(path):
        hits = [path]
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    space = xplane_pb2.XSpace()
    with open(hits[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()
    counts = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: (m.display_name or m.name)
                for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = meta.get(ev.metadata_id, "?").lstrip("%")
                per_op[nm] += ev.duration_ps / 1e12
                counts[nm] += 1
    return per_op, counts


def main():
    trace = next((a for a in sys.argv[1:] if not a.startswith("--")),
                 "/tmp/islam_prof")
    quick = "--quick" in sys.argv
    as_json = "--json" in sys.argv
    h, w, b = (64, 128, 2) if quick else (448, 640, 8)

    import functools

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
        bf16=True)
    args = (variables, dn_params, batch, win, init,
            jnp.asarray(np.asarray(ds.rgb2imu_pose), jnp.float32),
            imu.gravity, imu.accel_bias, imu.gyro_bias, jnp.asarray(False))
    fn = functools.partial(train_step, **kwargs)
    compiled = jax.jit(fn).lower(*args).compile()
    texts = ([m.to_string() for m in
              compiled.runtime_executable().hlo_modules()]
             if hasattr(compiled, "runtime_executable")
             else [compiled.as_text()])

    convs = [c for t in texts for c in hlo_convs(t)]
    per_op, counts = xplane_durations(trace)

    # The trace holds several identical steps; per-instruction time is the
    # summed duration divided by the occurrence count of that instruction.
    fams = {}
    matched = 0
    for c in convs:
        t = per_op.get(c["name"])
        n = counts.get(c["name"], 0)
        if t is None or n == 0:
            t_one = None
        else:
            t_one = t / n
            matched += 1
        key = (c["dtype"], parse_shape(c["out"])[1],
               parse_shape(c["rhs"])[1], c["window"], c["groups"])
        f = fams.setdefault(key, {
            "dtype": c["dtype"], "out": c["out"], "rhs": c["rhs"],
            "window": c["window"], "groups": c["groups"], "n": 0,
            "flops": 0.0, "bytes": 0.0, "time_s": 0.0, "timed": 0,
            "example": c["op_name"]})
        f["n"] += 1
        f["flops"] += c["flops"]
        f["bytes"] += c["bytes"]
        if t_one is not None:
            f["time_s"] += t_one
            f["timed"] += 1

    rows = []
    for f in fams.values():
        peak = V5E_PEAK.get(f["dtype"], 197e12)
        if f["timed"] and f["timed"] < f["n"]:
            # scale measured time up for untimed duplicates of the family
            f["time_s"] *= f["n"] / f["timed"]
        t = f["time_s"]
        rows.append({
            "dtype": f["dtype"], "out": f["out"], "kernel": f["rhs"],
            "window": f["window"], "groups": f["groups"], "count": f["n"],
            "gflops": round(f["flops"] / 1e9, 2),
            "ms": round(t * 1e3, 3) if t else None,
            "achieved_tflops": round(f["flops"] / t / 1e12, 2) if t else None,
            "pct_mxu_roofline": round(100 * f["flops"] / t / peak, 1)
            if t else None,
            "hbm_gbps": round(f["bytes"] / t / 1e9, 1) if t else None,
            "pct_hbm_roofline": round(100 * f["bytes"] / t / V5E_HBM_BPS, 1)
            if t else None,
            "example_op": f["example"][:110],
        })
    rows.sort(key=lambda r: -(r["ms"] or 0))

    total_ms = sum(r["ms"] or 0 for r in rows)
    total_gf = sum(r["gflops"] for r in rows)
    if as_json:
        print(json.dumps({"total_conv_ms": round(total_ms, 2),
                          "total_conv_gflops": round(total_gf, 1),
                          "matched_instructions": matched,
                          "families": rows}))
        return
    print(f"{len(convs)} conv instructions ({matched} matched in trace), "
          f"{len(rows)} shape families, {total_ms:.2f} ms total, "
          f"{total_gf:.0f} GFLOP per step")
    hdr = (f"{'ms':>8} {'GF':>7} {'TF/s':>6} {'%MXU':>5} {'GB/s':>6} "
           f"{'%HBM':>5} {'n':>3}  out / kernel / window")
    print(hdr)
    for r in rows:
        print(f"{r['ms'] if r['ms'] is not None else -1:8.3f} "
              f"{r['gflops']:7.1f} "
              f"{r['achieved_tflops'] or 0:6.1f} "
              f"{r['pct_mxu_roofline'] or 0:5.1f} "
              f"{r['hbm_gbps'] or 0:6.0f} "
              f"{r['pct_hbm_roofline'] or 0:5.1f} "
              f"{r['count']:3d}  {r['out']} / {r['kernel']} "
              f"/ {r['window']} g={r['groups']}")
        print(f"{'':8} {r['example_op']}")


if __name__ == "__main__":
    main()
