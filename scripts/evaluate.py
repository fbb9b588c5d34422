"""Evaluate a training run's trajectory snapshots against ground truth.

Completes the workflow the reference leaves to external tooling (its
train.py:51-61 dumps vo/pgo/imu pose snapshots per epoch and README.md:33
reports ATE changes computed offline): given a --result-dir produced by
`python -m islam_tpu.train`, computes ATE (Umeyama-aligned translation RMSE)
and RPE (per-step relative translation/rotation) of every trajectory kind in
every epoch directory against gt_pose.txt, and prints one JSON line per
(epoch, kind) plus a summary of the best epoch per kind.

Usage: python scripts/evaluate.py <result_dir> [--with-scale] [--delta N]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from islam_tpu.utils.evaluation import ate_rmse, rpe

KINDS = ("vo_pose", "pgo_pose", "imu_pose")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not pos:
        raise SystemExit(__doc__)
    root = pos[0]
    with_scale = "--with-scale" in sys.argv
    delta = 1
    if "--delta" in sys.argv:
        delta = int(sys.argv[sys.argv.index("--delta") + 1])

    gt_path = os.path.join(root, "gt_pose.txt")
    if not os.path.isfile(gt_path):
        raise SystemExit(f"no gt_pose.txt under {root}")
    gt = np.loadtxt(gt_path)

    epochs = sorted((d for d in os.listdir(root)
                     if d.isdigit() and os.path.isdir(os.path.join(root, d))),
                    key=int)
    if not epochs:
        raise SystemExit(f"no epoch directories under {root}")

    best = {}
    for ep in epochs:
        for kind in KINDS:
            path = os.path.join(root, ep, kind + ".txt")
            if not os.path.isfile(path):
                continue
            est = np.loadtxt(path)
            if est.ndim != 2 or est.shape[1] != 7 or len(est) < 2:
                continue
            n = min(len(est), len(gt))
            ate = ate_rmse(est[:n], gt[:n], with_scale=with_scale)
            rpe_t, rpe_r = rpe(est[:n], gt[:n], delta=delta)
            rec = {"epoch": int(ep), "kind": kind, "frames": n,
                   "ate": round(ate, 6), "rpe_trans": round(rpe_t, 6),
                   "rpe_rot": round(rpe_r, 6)}
            print(json.dumps(rec))
            if kind not in best or ate < best[kind]["ate"]:
                best[kind] = rec

    for kind, rec in best.items():
        print(json.dumps({"best_" + kind: rec}))


if __name__ == "__main__":
    main()
