"""Imperative-learning demonstration on synthetic data.

Runs the full bi-level loop for N epochs (alternating vo/imu targets,
train.py:151 schedule) and records the per-epoch VO upper-level loss and the
ATE of the raw-VO and PVGO trajectories -- the reference's headline result is
that imperative iterations reduce VO ATE (README.md:15,33).

Usage: python scripts/demo_imperative.py [epochs] [lr] [--f32]
           [--bilevel=detached|implicit|unrolled]

``--f32`` runs the conv stack in float32 instead of the default bfloat16 --
used for the bf16 end-to-end accuracy study (docs/RESULTS.md): identical
data and init, only the compute dtype differs.

``--bilevel=...`` selects the coupling through the PVGO solve (detached =
reference semantics; implicit = IFT; unrolled = backprop through LM
iterations) -- used for the bi-level mode comparison study
(docs/RESULTS.md): identical data and init, only the upper-level gradient
path differs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from islam_tpu import testing
from islam_tpu.train import Trainer
from islam_tpu.utils.evaluation import ate_rmse, rpe


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    epochs = int(pos[0]) if pos else 8
    lr = float(pos[1]) if len(pos) > 1 else 1e-4
    use_bf16 = "--f32" not in sys.argv
    bilevel = next((a.split("=", 1)[1] for a in sys.argv[1:]
                    if a.startswith("--bilevel=")), "detached")

    ds = testing.make_dataset(num_frames=33, height=448, width=640)

    class Args:
        batch_size = 8
        vo_optimizer = "adam"
        vo_model_name = ""
        pose_model_name = ""
        imu_denoise_model_name = ""
        loss_weight = (1.0, 0.1, 10.0, 0.1)
        rot_w = 1.0
        trans_w = 0.1
        use_gt_scale = True
        bf16 = use_bf16
        print_interval = 0

    Args.lr = lr
    Args.bilevel = bilevel
    trainer = Trainer(Args(), ds)

    history = []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        traj = trainer.run_epoch(epoch)
        dt = time.time() - t0

        vo = np.stack(traj.vo_poses)
        pgo = np.stack(traj.pgo_poses)
        n = len(pgo)
        gt = ds.poses[:n]
        rec = {
            "epoch": epoch,
            "bilevel": bilevel,
            "target": trainer.train_target[epoch],
            "ate_vo": round(ate_rmse(vo[:n], gt), 6),
            "ate_pgo": round(ate_rmse(pgo, gt), 6),
            "rpe_rot_vo": round(rpe(vo[:n], gt)[1], 6),
            "rpe_rot_pgo": round(rpe(pgo, gt)[1], 6),
            "wall_s": round(dt, 1),
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)

    first_vo = history[0]["ate_vo"]
    last_vo = history[-1]["ate_vo"]
    print(json.dumps({
        "vo_ate_first": first_vo, "vo_ate_last": last_vo,
        "vo_ate_change_pct": round(100 * (last_vo - first_vo) / first_vo, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
