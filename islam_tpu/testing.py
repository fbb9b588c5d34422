"""Shared fixtures: synthetic batches for tests, benchmarks and dry runs."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from islam_tpu.data.dataset import collate
from islam_tpu.data.synthetic import SyntheticTrajDataset
from islam_tpu.data.transforms import (Compose, CropCenter, DownscaleFlow,
                                       Normalize, ToNHWCTensor)
from islam_tpu.imu.module import IMUModule
from islam_tpu.imu.preintegrator import IMUState

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def make_transform(height: int = 448, width: int = 640):
    return Compose([
        CropCenter((height, width), fix_ratio=True),
        DownscaleFlow(),
        Normalize(mean=MEAN, std=STD, keep_old=True),
        ToNHWCTensor(),
    ])


def make_dataset(num_frames: int = 17, height: int = 448, width: int = 640,
                 seed: int = 0) -> SyntheticTrajDataset:
    return SyntheticTrajDataset(
        num_frames=num_frames, height=height, width=width, seed=seed,
        transform=make_transform(height, width))


def make_imu_module(dataset, batch_frames: int = 8,
                    denoise_params=None) -> IMUModule:
    return IMUModule(
        dataset.accels, dataset.gyros, dataset.imu_dts,
        dataset.accel_bias, dataset.gyro_bias,
        init=dataset.imu_init, gravity=dataset.gravity,
        rgb2imu_sync=dataset.rgb2imu_sync, denoise_params=denoise_params,
        denoise_accel=True, denoise_gyro=(dataset.datatype != "kitti"),
        batch_frames=batch_frames)


def device_batch(sample: Dict, current_idx: int) -> Dict:
    b = {}
    for k in ("img0", "img1", "img0_norm", "img0_r_norm", "intrinsic",
              "intrinsic_calib", "extrinsic", "motion"):
        if k in sample:
            b[k] = jnp.asarray(sample[k])
    links = np.asarray(sample["link"]) - current_idx
    b["links"] = jnp.asarray(links)
    b["dts"] = jnp.asarray(np.asarray(sample["dt"], np.float32))
    # Consecutive-pair windows share a frame between adjacent pairs: ship
    # the B+1 distinct frames so the flow pyramid is computed once each.
    if np.array_equal(links[:, 1], links[:, 0] + 1) and np.array_equal(
            links[:, 0], np.arange(len(links))):
        img0 = np.asarray(sample["img0"])
        img1 = np.asarray(sample["img1"])
        b["frames"] = jnp.asarray(
            np.concatenate([img0, img1[-1:]], axis=0))
    return b


def make_step_inputs(dataset, imu_module, start: int = 0, B: int = 8):
    """(batch, imu_win, init_state) for a window of B frame-pairs."""
    sample = collate([dataset[i] for i in range(start, start + B)])
    batch = device_batch(sample, start)
    imu_win = imu_module.window_inputs(start, start + B)
    init = dataset.imu_init
    init_state = IMUState(
        pos=jnp.asarray(np.asarray(init["pos"]), jnp.float32),
        rot=jnp.asarray(np.asarray(init["rot"]), jnp.float32),
        vel=jnp.asarray(np.asarray(init["vel"]), jnp.float32))
    return batch, imu_win, init_state
