"""Aggregate device-op time from a jax.profiler xplane trace.

Usage: python tools/analyze_xplane.py <trace_dir_or_xplane.pb> [top_n]

Walks the TPU device plane and reports (a) total duration per HLO op-name
prefix family and (b) the top individual ops — the data behind the per-step
cost breakdown in docs/RESULTS.md.
"""

import collections
import glob
import os
import re
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


def family(name):
    """HLO op name -> family: 'fusion.1234' -> 'fusion'."""
    m = re.match(r"[%]?([a-zA-Z_\-]+)", name)
    return m.group(1).rstrip(".-_") if m else name


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = find_xplane(sys.argv[1] if len(sys.argv) > 1 else "/tmp/islam_prof")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: (m.display_name or m.name)
                for m in plane.event_metadata.values()}
        per_op = collections.Counter()
        per_fam = collections.Counter()
        # ONLY the synchronous "XLA Ops" line is additive per-op time.
        # "Steps"/"XLA Modules" are whole-program envelopes and "Async XLA
        # Ops" durations are overlapped spans (a copy-start..done pair can
        # cover the entire step while costing nothing on the compute units).
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps
                per_fam[family(name)] += ev.duration_ps
        if not per_op:
            continue
        total = sum(per_fam.values())
        print(f"== plane: {plane.name}  (total device time "
              f"{total / 1e9:.3f} ms across trace)")
        print("-- by family:")
        for fam, ps in per_fam.most_common(top_n):
            print(f"  {ps / 1e9:9.3f} ms  {100 * ps / total:5.1f}%  {fam}")
        print(f"-- top {top_n} ops:")
        for name, ps in per_op.most_common(top_n):
            print(f"  {ps / 1e9:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
